"""jaxpr -> ONNX graph converter for inference-stage export.

Traces a jittable function with `jax.make_jaxpr` and maps the lax primitive
stream onto ONNX ops (opset 17). This is how the TPU-native framework emits
the `.onnx` artifacts the MoeVS-style deployment ecosystem consumes
(reference: onnx_modules/V230/models_onnx.py:896-1080 does the same via
torch.onnx.export; here the source of truth is the JAX model itself, so
exported graphs are bit-faithful to what the TPU serves).

Design:
- static shapes only (matching the framework's bucketed inference);
- closed-over weights become initializers;
- every eqn whose inputs are all known constants is folded at export time
  with JAX itself (this collapses weight-norm kernels, iota masks, etc. into
  plain initializers);
- `pjit` / custom-derivative wrappers are inlined; `scan` is unrolled
  (static trip count).

Unsupported primitives raise with the primitive name so coverage gaps are
loud, not silent.
"""

from __future__ import annotations

import jax
import numpy as np
from jax import core as jcore

from bert_vits2_tpu.compat import onnx_pb as pb

# jax>=0.4.30 moved Literal/Var around; keep both spellings working
try:
    Literal = jcore.Literal
except AttributeError:  # pragma: no cover
    from jax._src.core import Literal  # type: ignore


class UnsupportedPrimitive(NotImplementedError):
    pass


class _Builder:
    def __init__(self):
        self.nodes: list[bytes] = []
        self.initializers: dict[str, bytes] = {}
        self._n = 0
        self._const_cache: dict[tuple, str] = {}

    def fresh(self, hint: str) -> str:
        self._n += 1
        hint = "".join(c if c.isalnum() or c in "._" else "_" for c in hint)
        return f"{hint}_{self._n}"

    def add(self, op: str, inputs, outputs, **attrs):
        self.nodes.append(
            pb.node(op, inputs, outputs, name=self.fresh(op.lower()), **attrs)
        )

    def const(self, arr: np.ndarray, hint: str = "const") -> str:
        arr = np.asarray(arr)
        # key on the actual (shape, dtype, bytes) tuple, not its hash: dict
        # compares keys on hash collision, so two distinct constants can
        # never silently alias
        key = (arr.shape, str(arr.dtype), arr.tobytes())
        if key in self._const_cache:
            return self._const_cache[key]
        name = self.fresh(hint)
        self.initializers[name] = pb.tensor(name, arr)
        self._const_cache[key] = name
        return name

    def i64(self, values, hint: str = "i64") -> str:
        return self.const(np.asarray(values, np.int64), hint)


class _Val:
    """A jaxpr value during conversion: ONNX name and/or known constant."""

    __slots__ = ("name", "aval", "const")

    def __init__(self, name, aval, const=None):
        self.name = name
        self.aval = aval
        self.const = const


def _np(x) -> np.ndarray:
    return np.asarray(jax.device_get(x))


class Converter:
    def __init__(self):
        self.b = _Builder()
        self.env: dict = {}

    # -- env ---------------------------------------------------------------

    def read(self, var) -> _Val:
        if isinstance(var, Literal):
            return _Val(None, var.aval, _np(var.val))
        return self.env[var]

    def write(self, var, val: _Val):
        self.env[var] = val

    def name_of(self, v: _Val, hint: str = "c") -> str:
        """Materialize: give a constant an initializer name."""
        if v.name is None:
            v.name = self.b.const(v.const, hint)
        return v.name

    # -- main loop ---------------------------------------------------------

    def run_jaxpr(self, jaxpr, consts, invals: list[_Val]) -> list[_Val]:
        for var, c in zip(jaxpr.constvars, consts):
            self.write(var, _Val(None, var.aval, _np(c)))
        for var, v in zip(jaxpr.invars, invals):
            self.write(var, v)
        for eqn in jaxpr.eqns:
            self.eqn(eqn)
        return [self.read(v) for v in jaxpr.outvars]

    def eqn(self, eqn):
        invals = [self.read(v) for v in eqn.invars]
        prim = eqn.primitive

        # constant folding: execute with jax when every input is known
        if all(v.const is not None for v in invals) and prim.name not in (
            "pjit",
            "jit",
        ):
            try:
                subfuns, bind_params = prim.get_bind_params(eqn.params)
                out = prim.bind(
                    *subfuns, *[v.const for v in invals], **bind_params
                )
                outs = out if prim.multiple_results else [out]
                for var, o in zip(eqn.outvars, outs):
                    self.write(var, _Val(None, var.aval, _np(o)))
                return
            except Exception:  # noqa: BLE001 - fall through to graph emit
                pass

        handler = _HANDLERS.get(prim.name)
        if handler is None:
            raise UnsupportedPrimitive(
                f"no ONNX mapping for primitive '{prim.name}' "
                f"(avals {[str(v.aval) for v in invals]})"
            )
        out_names = handler(self, eqn, invals)
        if out_names is None:  # handler wrote the env itself (inliners)
            return
        if not isinstance(out_names, (list, tuple)):
            out_names = [out_names]
        for var, name in zip(eqn.outvars, out_names):
            self.write(var, _Val(name, var.aval))


# ---------------------------------------------------------------------------
# handler helpers
# ---------------------------------------------------------------------------

_HANDLERS: dict = {}


def _register(*names):
    def deco(fn):
        for n in names:
            _HANDLERS[n] = fn
        return fn

    return deco


def _simple(onnx_op: str, *prim_names: str):
    @_register(*prim_names)
    def h(cv: Converter, eqn, invals, _op=onnx_op):
        out = cv.b.fresh(_op.lower())
        cv.b.add(_op, [cv.name_of(v) for v in invals], [out])
        return out


# elementwise / variadic with identical signatures
_simple("Add", "add")
_simple("Sub", "sub")
_simple("Mul", "mul")
_simple("Div", "div")
_simple("Pow", "pow")
_simple("Max", "max")
_simple("Min", "min")
_simple("Neg", "neg")
_simple("Abs", "abs")
_simple("Sign", "sign")
_simple("Exp", "exp")
_simple("Log", "log")
_simple("Sqrt", "sqrt")
_simple("Tanh", "tanh")
_simple("Sigmoid", "logistic")
_simple("Erf", "erf")
_simple("Sin", "sin")
_simple("Cos", "cos")
_simple("Floor", "floor")
_simple("Ceil", "ceil")
_simple("Round", "round")
_simple("Equal", "eq")
_simple("Less", "lt")
_simple("LessOrEqual", "le")
_simple("Greater", "gt")
_simple("GreaterOrEqual", "ge")
_simple("And", "and")
_simple("Or", "or")
_simple("Xor", "xor")
_simple("Not", "not")
_simple("Identity", "stop_gradient", "copy", "device_put")


@_register("ne")
def _ne(cv, eqn, invals):
    eq = cv.b.fresh("eq")
    cv.b.add("Equal", [cv.name_of(v) for v in invals], [eq])
    out = cv.b.fresh("ne")
    cv.b.add("Not", [eq], [out])
    return out


@_register("erfc")
def _erfc(cv, eqn, invals):
    e = cv.b.fresh("erf")
    cv.b.add("Erf", [cv.name_of(invals[0])], [e])
    one = cv.b.const(np.ones((), invals[0].aval.dtype))
    out = cv.b.fresh("erfc")
    cv.b.add("Sub", [one, e], [out])
    return out


@_register("rsqrt")
def _rsqrt(cv, eqn, invals):
    s = cv.b.fresh("sqrt")
    cv.b.add("Sqrt", [cv.name_of(invals[0])], [s])
    out = cv.b.fresh("rsqrt")
    cv.b.add("Reciprocal", [s], [out])
    return out


@_register("log1p")
def _log1p(cv, eqn, invals):
    one = cv.b.const(np.ones((), invals[0].aval.dtype))
    a = cv.b.fresh("add1")
    cv.b.add("Add", [cv.name_of(invals[0]), one], [a])
    out = cv.b.fresh("log1p")
    cv.b.add("Log", [a], [out])
    return out


@_register("expm1")
def _expm1(cv, eqn, invals):
    e = cv.b.fresh("exp")
    cv.b.add("Exp", [cv.name_of(invals[0])], [e])
    one = cv.b.const(np.ones((), invals[0].aval.dtype))
    out = cv.b.fresh("expm1")
    cv.b.add("Sub", [e, one], [out])
    return out


@_register("square")
def _square(cv, eqn, invals):
    x = cv.name_of(invals[0])
    out = cv.b.fresh("square")
    cv.b.add("Mul", [x, x], [out])
    return out


@_register("integer_pow")
def _integer_pow(cv, eqn, invals):
    y = eqn.params["y"]
    x = cv.name_of(invals[0])
    if y == 2:
        out = cv.b.fresh("square")
        cv.b.add("Mul", [x, x], [out])
        return out
    p = cv.b.const(np.asarray(y, invals[0].aval.dtype))
    out = cv.b.fresh("ipow")
    cv.b.add("Pow", [x, p], [out])
    return out


@_register("rem")
def _rem(cv, eqn, invals):
    out = cv.b.fresh("rem")
    cv.b.add("Mod", [cv.name_of(v) for v in invals], [out], fmod=1)
    return out


@_register("select_n")
def _select_n(cv, eqn, invals):
    if len(invals) != 3:
        raise UnsupportedPrimitive(f"select_n with {len(invals)} inputs")
    pred, on_false, on_true = invals
    # lax.select_n picks cases[pred]: index 0 on False
    out = cv.b.fresh("where")
    cv.b.add(
        "Where",
        [cv.name_of(pred), cv.name_of(on_true), cv.name_of(on_false)],
        [out],
    )
    return out


@_register("clamp")
def _clamp(cv, eqn, invals):
    lo, x, hi = invals
    out = cv.b.fresh("clip")
    cv.b.add("Clip", [cv.name_of(x), cv.name_of(lo), cv.name_of(hi)], [out])
    return out


@_register("convert_element_type")
def _convert(cv, eqn, invals):
    dt = pb.np_to_onnx_dtype(np.dtype(eqn.params["new_dtype"]))
    out = cv.b.fresh("cast")
    cv.b.add("Cast", [cv.name_of(invals[0])], [out], to=dt)
    return out


@_register("reduce_precision")
def _reduce_precision(cv, eqn, invals):
    out = cv.b.fresh("ident")
    cv.b.add("Identity", [cv.name_of(invals[0])], [out])
    return out


# -- shape ops ---------------------------------------------------------------


@_register("reshape")
def _reshape(cv, eqn, invals):
    new_sizes = eqn.params["new_sizes"]
    if eqn.params.get("dimensions") is not None:
        perm = eqn.params["dimensions"]
        t = cv.b.fresh("transpose")
        cv.b.add("Transpose", [cv.name_of(invals[0])], [t], perm=list(perm))
        src = t
    else:
        src = cv.name_of(invals[0])
    out = cv.b.fresh("reshape")
    cv.b.add("Reshape", [src, cv.b.i64(new_sizes, "shape")], [out])
    return out


@_register("squeeze")
def _squeeze(cv, eqn, invals):
    out_shape = [
        d
        for i, d in enumerate(invals[0].aval.shape)
        if i not in set(eqn.params["dimensions"])
    ]
    out = cv.b.fresh("squeeze")
    cv.b.add(
        "Reshape",
        [cv.name_of(invals[0]), cv.b.i64(out_shape, "shape")],
        [out],
    )
    return out


@_register("expand_dims")
def _expand_dims(cv, eqn, invals):
    shape = list(invals[0].aval.shape)
    for d in sorted(eqn.params["dimensions"]):
        shape.insert(d, 1)
    out = cv.b.fresh("unsqueeze")
    cv.b.add(
        "Reshape", [cv.name_of(invals[0]), cv.b.i64(shape, "shape")], [out]
    )
    return out


@_register("transpose")
def _transpose(cv, eqn, invals):
    out = cv.b.fresh("transpose")
    cv.b.add(
        "Transpose",
        [cv.name_of(invals[0])],
        [out],
        perm=list(eqn.params["permutation"]),
    )
    return out


@_register("broadcast_in_dim")
def _broadcast_in_dim(cv, eqn, invals):
    shape = list(eqn.params["shape"])
    bdims = eqn.params["broadcast_dimensions"]
    in_shape = invals[0].aval.shape
    # 1) reshape to rank(out) with input dims in place, 1 elsewhere
    mid = [1] * len(shape)
    for i, d in enumerate(bdims):
        mid[d] = in_shape[i]
    src = cv.name_of(invals[0])
    if list(in_shape) != mid:
        r = cv.b.fresh("reshape")
        cv.b.add("Reshape", [src, cv.b.i64(mid, "shape")], [r])
        src = r
    if mid == shape:
        return src
    out = cv.b.fresh("expand")
    cv.b.add("Expand", [src, cv.b.i64(shape, "shape")], [out])
    return out


@_register("concatenate")
def _concatenate(cv, eqn, invals):
    out = cv.b.fresh("concat")
    cv.b.add(
        "Concat",
        [cv.name_of(v) for v in invals],
        [out],
        axis=eqn.params["dimension"],
    )
    return out


@_register("pad")
def _pad(cv, eqn, invals):
    config = eqn.params["padding_config"]
    operand, pad_value = invals
    if any(interior != 0 for _, _, interior in config):
        raise UnsupportedPrimitive("pad with interior padding")
    los = [lo for lo, _, _ in config]
    his = [hi for _, hi, _ in config]
    src = cv.name_of(operand)
    # ONNX Pad rejects negative pads -> do the positive part with Pad and
    # the negative part with Slice
    pl = [max(v, 0) for v in los]
    ph = [max(v, 0) for v in his]
    if any(pl) or any(ph):
        p = cv.b.fresh("pad")
        cv.b.add(
            "Pad",
            [src, cv.b.i64(pl + ph, "pads"), cv.name_of(pad_value)],
            [p],
            mode="constant",
        )
        src = p
    if any(v < 0 for v in los + his):
        rank = len(config)
        starts = [-lo if lo < 0 else 0 for lo in los]
        shape_after = [
            s + max(lo, 0) + max(hi, 0)
            for s, (lo, hi, _) in zip(operand.aval.shape, config)
        ]
        ends = [
            sh + hi if hi < 0 else sh for sh, hi in zip(shape_after, his)
        ]
        out = cv.b.fresh("slice")
        cv.b.add(
            "Slice",
            [
                src,
                cv.b.i64(starts, "starts"),
                cv.b.i64(ends, "ends"),
                cv.b.i64(list(range(rank)), "axes"),
            ],
            [out],
        )
        return out
    return src


@_register("slice")
def _slice(cv, eqn, invals):
    starts = list(eqn.params["start_indices"])
    ends = list(eqn.params["limit_indices"])
    strides = eqn.params.get("strides")
    steps = list(strides) if strides is not None else [1] * len(starts)
    out = cv.b.fresh("slice")
    cv.b.add(
        "Slice",
        [
            cv.name_of(invals[0]),
            cv.b.i64(starts, "starts"),
            cv.b.i64(ends, "ends"),
            cv.b.i64(list(range(len(starts))), "axes"),
            cv.b.i64(steps, "steps"),
        ],
        [out],
    )
    return out


@_register("rev")
def _rev(cv, eqn, invals):
    dims = list(eqn.params["dimensions"])
    shape = invals[0].aval.shape
    imax = np.iinfo(np.int64).max
    out = cv.b.fresh("rev")
    cv.b.add(
        "Slice",
        [
            cv.name_of(invals[0]),
            cv.b.i64([shape[d] - 1 for d in dims], "starts"),
            cv.b.i64([-imax] * len(dims), "ends"),
            cv.b.i64(dims, "axes"),
            cv.b.i64([-1] * len(dims), "steps"),
        ],
        [out],
    )
    return out


@_register("dynamic_slice")
def _dynamic_slice(cv, eqn, invals):
    operand, *starts = invals
    if not all(s.const is not None for s in starts):
        raise UnsupportedPrimitive("dynamic_slice with traced start indices")
    sizes = eqn.params["slice_sizes"]
    s0 = [int(s.const) for s in starts]
    # lax clamps starts so the slice stays in bounds
    s0 = [
        min(max(s, 0), dim - sz)
        for s, dim, sz in zip(s0, operand.aval.shape, sizes)
    ]
    out = cv.b.fresh("dslice")
    cv.b.add(
        "Slice",
        [
            cv.name_of(operand),
            cv.b.i64(s0, "starts"),
            cv.b.i64([a + b for a, b in zip(s0, sizes)], "ends"),
            cv.b.i64(list(range(len(s0))), "axes"),
        ],
        [out],
    )
    return out


@_register("iota")
def _iota(cv, eqn, invals):
    shape = eqn.params["shape"]
    dim = eqn.params["dimension"]
    dtype = eqn.params["dtype"]
    rng = np.arange(shape[dim], dtype=dtype)
    arr = np.broadcast_to(
        rng.reshape([-1 if i == dim else 1 for i in range(len(shape))]), shape
    )
    return cv.b.const(np.ascontiguousarray(arr), "iota")


@_register("gather")
def _gather(cv, eqn, invals):
    operand, indices = invals
    dn = eqn.params["dimension_numbers"]
    slice_sizes = eqn.params["slice_sizes"]
    op_shape = operand.aval.shape
    # axis-gather pattern (jnp.take/Embed): one collapsed indexed axis,
    # full slices elsewhere, trailing index-depth-1
    if (
        len(dn.start_index_map) == 1
        and tuple(dn.collapsed_slice_dims) == tuple(dn.start_index_map)
        and not getattr(dn, "operand_batching_dims", ())
        and all(
            slice_sizes[d] == op_shape[d]
            for d in range(len(op_shape))
            if d not in dn.collapsed_slice_dims
        )
    ):
        axis = dn.start_index_map[0]
        idx_shape = indices.aval.shape
        if idx_shape and idx_shape[-1] == 1:  # trailing index-depth dim
            idx = cv.b.fresh("idx")
            cv.b.add(
                "Reshape",
                [cv.name_of(indices), cv.b.i64(idx_shape[:-1], "shape")],
                [idx],
            )
            n_batch = len(idx_shape) - 1
        else:
            idx = cv.name_of(indices)
            n_batch = len(idx_shape)
        out_rank = n_batch + len(op_shape) - 1
        # ONNX Gather output layout: operand dims < axis, index dims,
        # operand dims > axis. Matches lax exactly when offset_dims sit at
        # those operand positions (jnp.take/Embed produce this).
        want = tuple(range(axis)) + tuple(range(axis + n_batch, out_rank))
        if tuple(dn.offset_dims) == want:
            g = cv.b.fresh("gather")
            cv.b.add("Gather", [cv.name_of(operand), idx], [g], axis=axis)
            return g
    # multi-axis leading index (e.g. per-head VQ codebook lookup):
    # data[idx[...,0], ..., idx[...,m-1], :] -> ONNX GatherND
    m = len(dn.start_index_map)
    idx_shape = indices.aval.shape
    if (
        tuple(dn.start_index_map) == tuple(range(m))
        and tuple(dn.collapsed_slice_dims) == tuple(range(m))
        and not getattr(dn, "operand_batching_dims", ())
        and idx_shape
        and idx_shape[-1] == m
        and all(
            slice_sizes[d] == op_shape[d]
            for d in range(m, len(op_shape))
        )
        and tuple(dn.offset_dims)
        == tuple(
            range(
                len(idx_shape) - 1,
                len(idx_shape) - 1 + len(op_shape) - m,
            )
        )
    ):
        idx = cv.name_of(indices)
        if np.dtype(indices.aval.dtype) != np.int64:
            c = cv.b.fresh("idx64")
            cv.b.add("Cast", [idx], [c], to=pb.INT64)
            idx = c
        g = cv.b.fresh("gathernd")
        cv.b.add("GatherND", [cv.name_of(operand), idx], [g], batch_dims=0)
        return g
    raise UnsupportedPrimitive(
        f"gather pattern {dn} slice_sizes={slice_sizes}"
    )


@_register("scatter", "scatter-add")
def _scatter(cv, eqn, invals):
    """Static single-index `.at[..., i].set/add(v)` (ops/spline.py boundary
    knots). set -> Concat of the three slabs; add -> Pad + Add."""
    operand, indices, updates = invals
    dn = eqn.params["dimension_numbers"]
    if (
        indices.const is None
        or indices.const.size != 1
        or len(dn.scatter_dims_to_operand_dims) != 1
        or tuple(dn.inserted_window_dims)
        != tuple(dn.scatter_dims_to_operand_dims)
        or getattr(dn, "operand_batching_dims", ())
    ):
        raise UnsupportedPrimitive(f"scatter pattern {dn}")
    axis = dn.scatter_dims_to_operand_dims[0]
    rank = len(operand.aval.shape)
    if tuple(dn.update_window_dims) != tuple(
        d for d in range(rank - 1)
    ):
        raise UnsupportedPrimitive(f"scatter update dims {dn}")
    dim = operand.aval.shape[axis]
    idx = int(np.asarray(indices.const).reshape(-1)[0])
    idx = min(max(idx + dim if idx < 0 else idx, 0), dim - 1)
    # updates: operand shape minus axis -> unsqueeze at axis
    up_shape = list(operand.aval.shape)
    up_shape[axis] = 1
    upd = cv.b.fresh("scat_upd")
    cv.b.add(
        "Reshape",
        [cv.name_of(updates), cv.b.i64(up_shape, "shape")],
        [upd],
    )
    if eqn.primitive.name == "scatter":  # set
        parts = []
        src = cv.name_of(operand)
        if idx > 0:
            pre = cv.b.fresh("scat_pre")
            cv.b.add(
                "Slice",
                [src, cv.b.i64([0], "s"), cv.b.i64([idx], "e"),
                 cv.b.i64([axis], "a")],
                [pre],
            )
            parts.append(pre)
        parts.append(upd)
        if idx < dim - 1:
            post = cv.b.fresh("scat_post")
            cv.b.add(
                "Slice",
                [src, cv.b.i64([idx + 1], "s"), cv.b.i64([dim], "e"),
                 cv.b.i64([axis], "a")],
                [post],
            )
            parts.append(post)
        out = cv.b.fresh("scat_set")
        cv.b.add("Concat", parts, [out], axis=axis)
        return out
    # scatter-add: pad the update slab to position, then Add
    pads = [0] * (2 * rank)
    pads[axis] = idx
    pads[rank + axis] = dim - 1 - idx
    zero = cv.b.const(np.zeros((), operand.aval.dtype))
    padded = cv.b.fresh("scat_pad")
    cv.b.add("Pad", [upd, cv.b.i64(pads, "pads"), zero], [padded],
             mode="constant")
    out = cv.b.fresh("scat_add")
    cv.b.add("Add", [cv.name_of(operand), padded], [out])
    return out


# -- reductions --------------------------------------------------------------


def _reduce(cv, eqn, invals, op, axes_as_input):
    axes = list(eqn.params["axes"])
    src = cv.name_of(invals[0])
    out = cv.b.fresh(op.lower())
    if axes_as_input:
        cv.b.add(op, [src, cv.b.i64(axes, "axes")], [out], keepdims=0)
    else:
        cv.b.add(op, [src], [out], axes=axes, keepdims=0)
    return out


@_register("reduce_sum")
def _reduce_sum(cv, eqn, invals):
    return _reduce(cv, eqn, invals, "ReduceSum", True)


@_register("reduce_max")
def _reduce_max(cv, eqn, invals):
    return _reduce(cv, eqn, invals, "ReduceMax", False)


@_register("reduce_min")
def _reduce_min(cv, eqn, invals):
    return _reduce(cv, eqn, invals, "ReduceMin", False)


@_register("reduce_prod")
def _reduce_prod(cv, eqn, invals):
    return _reduce(cv, eqn, invals, "ReduceProd", False)


@_register("reduce_and")
def _reduce_and(cv, eqn, invals):
    c = cv.b.fresh("cast")
    cv.b.add("Cast", [cv.name_of(invals[0])], [c], to=pb.INT32)
    m = _reduce(cv, eqn, [_Val(c, invals[0].aval)], "ReduceMin", False)
    out = cv.b.fresh("bool")
    cv.b.add("Cast", [m], [out], to=pb.BOOL)
    return out


@_register("reduce_or")
def _reduce_or(cv, eqn, invals):
    c = cv.b.fresh("cast")
    cv.b.add("Cast", [cv.name_of(invals[0])], [c], to=pb.INT32)
    m = _reduce(cv, eqn, [_Val(c, invals[0].aval)], "ReduceMax", False)
    out = cv.b.fresh("bool")
    cv.b.add("Cast", [m], [out], to=pb.BOOL)
    return out


@_register("argmax", "argmin")
def _argmax(cv, eqn, invals):
    onnx_op = "ArgMax" if eqn.primitive.name == "argmax" else "ArgMin"
    axes = eqn.params["axes"]
    if len(axes) != 1:
        raise UnsupportedPrimitive(f"{eqn.primitive.name} over multiple axes")
    a = cv.b.fresh(onnx_op.lower())
    cv.b.add(
        onnx_op, [cv.name_of(invals[0])], [a], axis=axes[0], keepdims=0
    )
    dt = pb.np_to_onnx_dtype(np.dtype(eqn.params["index_dtype"]))
    if dt == pb.INT64:
        return a
    out = cv.b.fresh("cast")
    cv.b.add("Cast", [a], [out], to=dt)
    return out


@_register("cumsum")
def _cumsum(cv, eqn, invals):
    axis = eqn.params["axis"]
    reverse = eqn.params.get("reverse", False)
    out = cv.b.fresh("cumsum")
    cv.b.add(
        "CumSum",
        [cv.name_of(invals[0]), cv.b.i64(axis, "axis")],
        [out],
        exclusive=0,
        reverse=1 if reverse else 0,
    )
    return out


@_register("cumlogsumexp")
def _cumlogsumexp(cv, eqn, invals):
    raise UnsupportedPrimitive("cumlogsumexp")


# -- contractions ------------------------------------------------------------


@_register("dot_general")
def _dot_general(cv, eqn, invals):
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    lhs, rhs = invals
    lrank, rrank = len(lhs.aval.shape), len(rhs.aval.shape)
    letters = iter("abcdefghijklmnopqrstuvwxyz")
    l_sub = [None] * lrank
    r_sub = [None] * rrank
    out_sub = []
    for i, j in zip(lb, rb):  # batch dims, in order
        c = next(letters)
        l_sub[i] = r_sub[j] = c
        out_sub.append(c)
    for i, j in zip(lc, rc):  # contracted dims
        c = next(letters)
        l_sub[i] = r_sub[j] = c
    for i in range(lrank):  # lhs free dims
        if l_sub[i] is None:
            l_sub[i] = next(letters)
            out_sub.append(l_sub[i])
    for j in range(rrank):  # rhs free dims
        if r_sub[j] is None:
            r_sub[j] = next(letters)
            out_sub.append(r_sub[j])
    eqn_str = f"{''.join(l_sub)},{''.join(r_sub)}->{''.join(out_sub)}"
    out = cv.b.fresh("einsum")
    cv.b.add(
        "Einsum",
        [cv.name_of(lhs), cv.name_of(rhs)],
        [out],
        equation=eqn_str,
    )
    return out


# -- convolutions ------------------------------------------------------------


def _maybe_np_transform(cv, val: _Val, fn, hint: str, emit):
    """Apply fn to a constant in numpy, or emit graph nodes via emit()."""
    if val.const is not None:
        return cv.b.const(np.ascontiguousarray(fn(val.const)), hint)
    return emit(cv.name_of(val))


@_register("conv_general_dilated")
def _conv(cv, eqn, invals):
    lhs, rhs = invals
    dn = eqn.params["dimension_numbers"]
    strides = list(eqn.params["window_strides"])
    padding = list(eqn.params["padding"])
    lhs_dil = list(eqn.params["lhs_dilation"])
    rhs_dil = list(eqn.params["rhs_dilation"])
    groups = eqn.params["feature_group_count"]
    if eqn.params.get("batch_group_count", 1) != 1:
        raise UnsupportedPrimitive("conv batch_group_count > 1")
    n_sp = len(strides)

    # transpose lhs to [N, C, *spatial]
    lperm = [dn.lhs_spec[0], dn.lhs_spec[1], *dn.lhs_spec[2:]]
    x = cv.name_of(lhs)
    if lperm != list(range(len(lperm))):
        t = cv.b.fresh("x_ncw")
        cv.b.add("Transpose", [x], [t], perm=lperm)
        x = t

    transposed = any(d != 1 for d in lhs_dil)
    if transposed and (
        any(s != 1 for s in strides) or any(d != 1 for d in rhs_dil)
    ):
        raise UnsupportedPrimitive(
            "conv with both lhs_dilation and strides/rhs_dilation"
        )

    # kernel: lax rhs_spec gives (out_dim, in_dim, *spatial) positions
    o_dim, i_dim = dn.rhs_spec[0], dn.rhs_spec[1]
    sp_dims = list(dn.rhs_spec[2:])
    k_sizes = [rhs.aval.shape[d] for d in sp_dims]

    if not transposed:
        # ONNX Conv weight layout [O, I/g, *k]
        perm = [o_dim, i_dim, *sp_dims]

        def emit_w(name):
            t = cv.b.fresh("w_oiw")
            cv.b.add("Transpose", [name], [t], perm=perm)
            return t

        w = _maybe_np_transform(
            cv, rhs, lambda a: np.transpose(a, perm), "w", emit_w
        )
        pads = [p[0] for p in padding] + [p[1] for p in padding]
        y = cv.b.fresh("conv")
        cv.b.add(
            "Conv",
            [x, w],
            [y],
            dilations=rhs_dil,
            group=groups,
            kernel_shape=k_sizes,
            pads=pads,
            strides=strides,
        )
    else:
        # lax: correlate(dilate(x, s) with pads (lo, hi), w)
        # ONNX ConvTranspose(stride=s, pads=(K-1-lo, K-1-hi)) computes
        # correlate(dilate(x, s) with pads (K-1-pb, K-1-pe), flip(w)),
        # weight layout [I, O/g, *k]
        perm = [i_dim, o_dim, *sp_dims]
        flip = tuple(range(2, 2 + n_sp))

        def emit_w(name):
            t = cv.b.fresh("w_iow")
            cv.b.add("Transpose", [name], [t], perm=perm)
            imax = np.iinfo(np.int64).max
            fl = cv.b.fresh("w_flip")
            cv.b.add(
                "Slice",
                [
                    t,
                    cv.b.i64([k - 1 for k in k_sizes], "starts"),
                    cv.b.i64([-imax] * n_sp, "ends"),
                    cv.b.i64(list(flip), "axes"),
                    cv.b.i64([-1] * n_sp, "steps"),
                ],
                [fl],
            )
            return fl

        w = _maybe_np_transform(
            cv,
            rhs,
            lambda a: np.flip(np.transpose(a, perm), axis=flip),
            "w",
            emit_w,
        )
        pads_b = [k - 1 - p[0] for k, p in zip(k_sizes, padding)]
        pads_e = [k - 1 - p[1] for k, p in zip(k_sizes, padding)]
        if any(p < 0 for p in pads_b + pads_e):
            raise UnsupportedPrimitive(
                f"transposed conv pads {padding} exceed kernel {k_sizes}"
            )
        y = cv.b.fresh("convt")
        cv.b.add(
            "ConvTranspose",
            [x, w],
            [y],
            group=groups,
            kernel_shape=k_sizes,
            pads=pads_b + pads_e,
            strides=lhs_dil,
        )

    # transpose output [N, C, *spatial] -> out_spec
    operm = [dn.out_spec[0], dn.out_spec[1], *dn.out_spec[2:]]
    inv = [0] * len(operm)
    for i, d in enumerate(operm):
        inv[d] = i
    if inv != list(range(len(inv))):
        out = cv.b.fresh("y_spec")
        cv.b.add("Transpose", [y], [out], perm=inv)
        return out
    return y


# -- structural: inlining / unrolling ---------------------------------------


@_register("pjit", "jit", "closed_call", "core_call", "remat", "checkpoint",
           "custom_vjp_call_jaxpr")
def _inline_closed(cv, eqn, invals):
    closed = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
    if hasattr(closed, "jaxpr"):
        outs = cv.run_jaxpr(closed.jaxpr, closed.consts, invals)
    else:
        outs = cv.run_jaxpr(closed, (), invals)
    for var, o in zip(eqn.outvars, outs):
        cv.write(var, o)
    return None


@_register("custom_jvp_call")
def _inline_custom_jvp(cv, eqn, invals):
    closed = eqn.params["call_jaxpr"]
    outs = cv.run_jaxpr(closed.jaxpr, closed.consts, invals)
    for var, o in zip(eqn.outvars, outs):
        cv.write(var, o)
    return None


@_register("custom_vjp_call")
def _inline_custom_vjp(cv, eqn, invals):
    closed = eqn.params.get("call_jaxpr") or eqn.params.get("fun_jaxpr")
    outs = cv.run_jaxpr(closed.jaxpr, closed.consts, invals)
    for var, o in zip(eqn.outvars, outs):
        cv.write(var, o)
    return None


@_register("scan")
def _scan(cv, eqn, invals):
    """Unroll lax.scan (static trip count, per the framework's static-shape
    rule) — each iteration inlines the body jaxpr; ys are stacked."""
    p = eqn.params
    closed = p["jaxpr"]
    length = p["length"]
    n_consts, n_carry = p["num_consts"], p["num_carry"]
    reverse = p["reverse"]
    consts = invals[:n_consts]
    carry = list(invals[n_consts : n_consts + n_carry])
    xs = invals[n_consts + n_carry :]
    ys_parts: list[list[str]] = []
    order = range(length - 1, -1, -1) if reverse else range(length)
    for it in order:
        sliced = []
        for x in xs:
            shp = x.aval.shape
            if x.const is not None:
                sliced.append(_Val(None, None, x.const[it]))
                continue
            s = cv.b.fresh("scan_x")
            cv.b.add(
                "Slice",
                [
                    cv.name_of(x),
                    cv.b.i64([it], "starts"),
                    cv.b.i64([it + 1], "ends"),
                    cv.b.i64([0], "axes"),
                ],
                [s],
            )
            r = cv.b.fresh("scan_xs")
            cv.b.add("Reshape", [s, cv.b.i64(shp[1:], "shape")], [r])
            sliced.append(_Val(r, None))
        outs = cv.run_jaxpr(
            closed.jaxpr, closed.consts, [*consts, *carry, *sliced]
        )
        carry = outs[:n_carry]
        ys_now = outs[n_carry:]
        step_names = []
        for y in ys_now:
            shp = y.aval.shape
            u = cv.b.fresh("scan_y")
            cv.b.add(
                "Reshape",
                [cv.name_of(y), cv.b.i64([1, *shp], "shape")],
                [u],
            )
            step_names.append(u)
        ys_parts.append(step_names)
    if reverse:
        ys_parts.reverse()
    names = [cv.name_of(c) for c in carry]
    n_ys = len(ys_parts[0]) if ys_parts else 0
    for j in range(n_ys):
        out = cv.b.fresh("scan_stack")
        cv.b.add("Concat", [row[j] for row in ys_parts], [out], axis=0)
        names.append(out)
    for var, nm in zip(eqn.outvars, names):
        cv.write(var, _Val(nm, var.aval))
    return None


@_register("while")
def _while(cv, eqn, invals):
    raise UnsupportedPrimitive(
        "while_loop (inference stage graphs must be loop-free; "
        "use static shapes / scan)"
    )


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def export_model(
    fn,
    example_args,
    input_names: list[str],
    output_names: list[str],
    graph_name: str = "graph",
    doc_string: str = "",
) -> bytes:
    """Trace `fn(*example_args)` and serialize an ONNX ModelProto (opset 17).

    Closed-over arrays (weights) become initializers. Shapes are static
    (taken from example_args).
    """
    closed = jax.make_jaxpr(fn)(*example_args)
    jaxpr = closed.jaxpr
    if len(input_names) != len(jaxpr.invars):
        raise ValueError(
            f"{len(input_names)} input names for {len(jaxpr.invars)} inputs"
        )
    if len(output_names) != len(jaxpr.outvars):
        raise ValueError(
            f"{len(output_names)} output names for {len(jaxpr.outvars)} outputs"
        )

    cv = Converter()
    invals = []
    graph_inputs = []
    for name, var in zip(input_names, jaxpr.invars):
        aval = var.aval
        invals.append(_Val(name, aval))
        graph_inputs.append(
            pb.value_info(
                name,
                pb.np_to_onnx_dtype(np.dtype(aval.dtype)),
                list(aval.shape),
            )
        )
    outs = cv.run_jaxpr(jaxpr, closed.consts, invals)

    graph_outputs = []
    out_nodes_tail = []
    for name, v, var in zip(output_names, outs, jaxpr.outvars):
        src = cv.name_of(v, "out_const")
        if src != name:
            out_nodes_tail.append(
                pb.node("Identity", [src], [name], name=cv.b.fresh("out"))
            )
        aval = var.aval
        graph_outputs.append(
            pb.value_info(
                name,
                pb.np_to_onnx_dtype(np.dtype(aval.dtype)),
                list(aval.shape),
            )
        )

    g = pb.graph(
        cv.b.nodes + out_nodes_tail,
        graph_name,
        graph_inputs,
        graph_outputs,
        initializers=list(cv.b.initializers.values()),
        doc_string=doc_string,
    )
    return pb.model(g, doc_string=doc_string)


def count_ops(model_bytes: bytes) -> dict[str, int]:
    g = pb.parse_model(model_bytes)["graph"]
    out: dict[str, int] = {}
    for n in g["nodes"]:
        out[n["op_type"]] = out.get(n["op_type"], 0) + 1
    return out
