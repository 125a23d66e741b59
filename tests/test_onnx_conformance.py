"""ONNX bytes vs an INDEPENDENT spec checker (compat/onnx_check.py).

test_onnx.py verifies numerics through the in-repo numpy evaluator; a bug
shared by writer and evaluator would slip through it. This file routes the
same exported bytes through onnx_check, which decodes the protobuf wire
format and applies per-op ONNX schemas from scratch — no imports from
onnx_pb / jax2onnx / onnx_eval (enforced below). Reference contract:
onnx_modules/V230/models_onnx.py:896-1080 artifacts load in external
runtimes, so the bytes must be spec-conformant, not merely self-consistent.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from bert_vits2_tpu.compat import onnx_check
from bert_vits2_tpu.compat.jax2onnx import export_model
from bert_vits2_tpu.compat.onnx_check import check_model, decode_model


def _export(fn, args, n_out=1):
    arrs = [jnp.asarray(a) for a in args]
    return export_model(
        fn, tuple(arrs),
        [f"in{i}" for i in range(len(arrs))],
        [f"out{i}" for i in range(n_out)],
        "t",
    )


def _assert_conformant(mb: bytes):
    issues = check_model(mb)
    assert issues == [], "\n".join(issues)


def test_checker_is_independent_of_exporter():
    """onnx_check must not IMPORT anything from the writer/evaluator —
    shared code would defeat the point of a second implementation."""
    import ast
    import inspect

    tree = ast.parse(inspect.getsource(onnx_check))
    for node in ast.walk(tree):
        names = []
        if isinstance(node, ast.Import):
            names = [a.name for a in node.names]
        elif isinstance(node, ast.ImportFrom):
            names = [node.module or ""]
        for name in names:
            for forbidden in ("onnx_pb", "jax2onnx", "onnx_eval",
                              "onnx_export"):
                assert forbidden not in name, name


def test_elementwise_and_einsum():
    W = np.random.default_rng(0).normal(size=(8, 16)).astype(np.float32)
    _assert_conformant(_export(
        lambda x: jnp.tanh(x @ W) + jax.nn.sigmoid(x).sum(-1, keepdims=True),
        [np.zeros((4, 8), np.float32)]))


def test_conv_attrs():
    k = np.random.default_rng(1).normal(size=(6, 2, 5)).astype(np.float32)

    def f(x):
        return lax.conv_general_dilated(
            x, k, window_strides=(2,), padding=[(4, 4)],
            rhs_dilation=(2,), feature_group_count=2,
            dimension_numbers=("NCH", "OIH", "NCH"))

    mb = _export(f, [np.zeros((1, 4, 32), np.float32)])
    _assert_conformant(mb)
    g = decode_model(mb).graph
    convs = [n for n in g.nodes if n.op_type == "Conv"]
    assert convs, "expected a Conv node"
    attrs = convs[0].attrs
    assert attrs["strides"].ints == [2]
    assert attrs["dilations"].ints == [2]
    assert attrs["group"].i == 2


def test_conv_transpose_attrs():
    k = np.random.default_rng(2).normal(size=(3, 4, 8)).astype(np.float32)

    def f(x):
        return lax.conv_transpose(
            x, k, strides=(4,), padding=[(2, 2)],
            dimension_numbers=("NCH", "IOH", "NCH"))

    mb = _export(f, [np.zeros((1, 3, 16), np.float32)])
    _assert_conformant(mb)
    g = decode_model(mb).graph
    assert any(n.op_type == "ConvTranspose" for n in g.nodes)


def test_gather_pad_scatter_cumsum():
    def f(x, idx):
        g = jnp.take(x, idx, axis=0)
        p = jnp.pad(g, ((1, 2), (0, 0)), constant_values=0.5)
        s = p.at[0].add(1.0)
        return jnp.cumsum(s, axis=1)

    mb = _export(f, [np.ones((5, 3), np.float32),
                     np.array([0, 2, 4], np.int64)])
    _assert_conformant(mb)


def test_reduce_opset17_semantics():
    """At opset 17 ReduceSum takes axes as an INPUT; ReduceMax as an
    ATTRIBUTE. Emitting the wrong form would break external runtimes."""
    mb = _export(lambda x: (x.sum(1), x.max(1)),
                 [np.ones((4, 6), np.float32)], n_out=2)
    _assert_conformant(mb)
    g = decode_model(mb).graph
    rs = [n for n in g.nodes if n.op_type == "ReduceSum"]
    rm = [n for n in g.nodes if n.op_type == "ReduceMax"]
    assert rs and len([i for i in rs[0].inputs if i]) == 2
    assert rs[0].attrs.get("axes") is None
    assert rm and rm[0].attrs["axes"].ints == [1]


def test_initializer_bytes_decode_independently():
    """Constant payload in the bytes must decode (by the independent parser)
    to the exact values the exporter embedded."""
    W = np.arange(24, dtype=np.float32).reshape(4, 6) / 7.0
    mb = _export(lambda x: x @ W, [np.zeros((2, 4), np.float32)])
    _assert_conformant(mb)
    g = decode_model(mb).graph
    mats = [t for t in g.initializers.values()
            if tuple(t.dims) == (4, 6)]
    assert mats, "weight initializer not found"
    np.testing.assert_array_equal(mats[0].to_numpy(), W)


def test_negative_controls():
    """The checker must actually catch corruption, or a clean pass means
    nothing."""
    mb = bytearray(_export(lambda x: x + 1.0,
                           [np.zeros((2, 2), np.float32)]))
    assert check_model(bytes(mb)) == []
    # truncation -> wire-format error
    assert check_model(bytes(mb[:len(mb) // 2]))
    # flip a byte inside the payload -> some structural issue (wire error,
    # SSA break, dtype error, or size mismatch); sweep a few offsets and
    # require at least one detection
    detected = 0
    for off in range(4, min(len(mb), 64), 7):
        corrupt = bytearray(mb)
        corrupt[off] ^= 0xFF
        try:
            if check_model(bytes(corrupt)):
                detected += 1
        except Exception:
            detected += 1
    assert detected > 0


def test_stage_exports_conformant(tiny_model, tmp_path):
    """Every artifact of the full tiny-model export passes the independent
    checker (same artifacts test_onnx.py verifies numerically)."""
    from bert_vits2_tpu.compat.onnx_export import export_onnx

    model, params = tiny_model
    paths = export_onnx(model, params, str(tmp_path), "Tiny",
                        t_x=8, max_frames=16)
    assert set(paths) == {"emb", "enc_p", "sdp", "dp", "flow", "dec"}
    for stage, p in paths.items():
        issues = check_model(open(p, "rb").read())
        assert issues == [], f"{stage}:\n" + "\n".join(issues)
