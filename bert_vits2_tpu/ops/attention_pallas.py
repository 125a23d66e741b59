"""Pallas TPU kernels: fused self-attention with banded relative-position bias.

The VITS2 encoder attention (reference: attentions.py:205-341) is dense
content attention plus a learnable relative-position bias restricted to a
+-window_size diagonal band (window_size=4 everywhere). The XLA formulation
materializes several [b, h, t, t] tensors per layer in HBM (scores, skewed
bias, mask select, softmax, band re-extraction) and runs ~10x off the
bandwidth roofline at t~1000. This kernel fuses the whole post-projection
attention — scores, band bias placement, sequence masking, softmax, p@v, and
the value-side band term — into one VMEM-resident program per
(batch, head, query-block):

    s        = q @ k^T + scatter_diag(q @ emb_k^T)        [Bq, T] in VMEM
    p        = softmax(where(mask, s, -1e4))              fp32, one pass
    out      = p @ v + (band(p) @ emb_v)                  band(p) extracted
                                                          as 2w+1 masked sums

The band scatter/gather never touches HBM: the (2w+1)-column relative logits
are placed on the diagonals with unrolled iota-compare selects (w=4 -> 9
selects on the VPU), replacing the O(t^2)-wide pad/reshape skew trick
(reference attentions.py:360-395).

TRAINING (round 5): the op carries a custom_vjp with flash-attention-style
Pallas backward kernels, so the non-reverse flow/encoder direction rides the
fused kernel too (reference trains through the same attention,
attentions.py:205-341):

    bwd-q kernel (grid b,h,q-blocks): recomputes p for its rows, produces
        dq plus the accumulated relative-table grads dek, dev
    bwd-k kernel (grid b,h,k-blocks): rebuilds its p columns from the saved
        row stats (m, l), produces dk, dv

Attention-prob dropout (reference attentions.py:278, p=0.1 in training) is
applied INSIDE the kernel from a counter-based position hash — the keep mask
is a pure function of (absolute row, absolute col, batch*head, seed), so the
backward kernels regenerate it exactly without materializing a [t, t] mask in
HBM. The XLA fallback path uses the same hash, so CPU/TPU train the same
function (the stream differs from flax's nn.Dropout — regularization noise,
not a parity surface; deterministic runs are bit-identical to before).

Numerics: scores and softmax accumulate in fp32 regardless of input dtype
(the XLA path softmaxes in the activation dtype, so bf16 runs of this kernel
are slightly MORE accurate). Sequence masking uses the same -1e4 fill as the
reference, so fully-padded rows produce the same uniform distribution.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _seed_spec():
    """The int32 [1] dropout seed rides in SMEM (scalar memory)."""
    return pl.BlockSpec(memory_space=pltpu.SMEM)

_LANE = 128
_NEG = -1e4  # matches the reference mask fill (attentions.py:303)
_BWD_BQ = 256  # bwd block cap: 4 [Bq, T] f32 live tensors must fit VMEM


def _drop_threshold(p_drop: float) -> int:
    return min(int(p_drop * 2147483648.0), 2**31 - 1)


def _hash_keep(rows, cols, salt, seed, thr: int):
    """Deterministic per-position Bernoulli(1-p) keep mask in {0.0, 1.0}.

    murmur3-style integer finalizer over (row, col, batch*head, seed);
    int32 ops wrap, matching XLA semantics in both Mosaic and interpret
    mode. Pure jnp, so the XLA fallback path reuses it verbatim.
    """
    x = rows * np.int32(-1640531527) + cols * np.int32(-2048144777)
    x = x ^ (salt * np.int32(374761393) + seed)
    x = x ^ jax.lax.shift_right_logical(x, 16)
    x = x * np.int32(-2048144789)
    x = x ^ jax.lax.shift_right_logical(x, 13)
    x = x * np.int32(-1028477387)
    x = x ^ jax.lax.shift_right_logical(x, 16)
    return ((x & np.int32(0x7FFFFFFF)) >= thr).astype(jnp.float32)


def _attn_fwd_kernel(q_ref, k_ref, v_ref, mask_ref, ek_ref, ev_ref, seed_ref,
                     o_ref, m_ref=None, l_ref=None, *, w, t, bq, p_drop,
                     stats):
    """One (batch, head, query-block) forward program.

    q [1,1,Bq,D] (pre-scaled), k/v [1,1,T,D], mask [1,T] (this batch row),
    ek/ev [R,D] with the 2w+1 real rows zero-padded to R, out [1,1,Bq,D].
    With stats=True also writes the softmax row stats m, l [1,1,Bq] used by
    the bwd-k kernel to rebuild p columns.
    """
    j = pl.program_id(2)
    q = q_ref[0, 0]  # [Bq, D]
    k = k_ref[0, 0]  # [T, D]
    v = v_ref[0, 0]

    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # [Bq, T]
    rel = jnp.dot(q, ek_ref[:].T, preferred_element_type=jnp.float32)  # [Bq, R]

    rows = jax.lax.broadcasted_iota(jnp.int32, (bq, t), 0) + j * bq
    cols = jax.lax.broadcasted_iota(jnp.int32, (bq, t), 1)
    diag = cols - rows + w  # in [0, 2w] inside the band
    for c in range(2 * w + 1):
        s = s + jnp.where(diag == c, rel[:, c][:, None], 0.0)

    # Key-side sequence mask only. The XLA path also masks query rows, but a
    # padded row's output is re-masked by every consumer (Encoder returns
    # x*mask; FFN masks its input), and for valid rows mask_i == 1 makes the
    # two formulations identical — so the row mask is dropped here, avoiding
    # an unprovable dynamic lane slice.
    mask_j = mask_ref[0, 0]  # [T]
    s = jnp.where(mask_j[None, :] == 0, _NEG, s)

    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    pf = e / l  # [Bq, T] fp32
    if p_drop > 0.0:
        salt = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
        keep = _hash_keep(rows, cols, salt, seed_ref[0],
                          _drop_threshold(p_drop))
        pf = pf * keep * (1.0 / (1.0 - p_drop))
    p = pf.astype(v.dtype)

    out = jnp.dot(p, v, preferred_element_type=jnp.float32)  # [Bq, D]
    # value-side relative term: out[i] += sum_c p[i, i+c-w] * emb_v[c]
    # (reference attentions.py:316-322). Extract the 2w+1 band columns as
    # masked row-sums of p — never materializing the [t, 2t-1] skew.
    ev = ev_ref[:].astype(jnp.float32)
    for c in range(2 * w + 1):
        band_c = jnp.sum(jnp.where(diag == c, pf, 0.0), axis=-1)  # [Bq]
        out = out + band_c[:, None] * ev[c][None, :]
    o_ref[0, 0] = out.astype(o_ref.dtype)
    if stats:
        # row stats lane-replicated to [Bq, 128] (TPU block tiling wants a
        # 128-lane last dim; the value is the same in every lane)
        m_ref[0, 0] = jnp.broadcast_to(m, (bq, _LANE))
        l_ref[0, 0] = jnp.broadcast_to(l, (bq, _LANE))


def _attn_bwd_q_kernel(q_ref, k_ref, v_ref, mask_ref, ek_ref, ev_ref,
                       seed_ref, g_ref, dq_ref, dek_ref, dev_ref,
                       *, w, t, bq, p_drop):
    """Backward, query side: one (batch, head, q-block) program.

    Recomputes its full softmax rows, then
        dp = g @ v^T + scatter_diag(g @ ev^T)     (grad wrt dropped probs)
        ds = p * (dp' - rowsum(dp' * p))          (softmax bwd, dp' dropped)
        dq = ds @ k + gather_band(ds) @ ek
        dek += gather_band(ds)^T @ q ; dev += gather_band(p_drop)^T @ g
    dek/dev accumulate across the whole grid into one [R, D] block (TPU grid
    steps are sequential; the block stays resident in VMEM).
    """
    i_b, i_h, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    g = g_ref[0, 0]

    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    rel = jnp.dot(q, ek_ref[:].T, preferred_element_type=jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (bq, t), 0) + j * bq
    cols = jax.lax.broadcasted_iota(jnp.int32, (bq, t), 1)
    diag = cols - rows + w
    for c in range(2 * w + 1):
        s = s + jnp.where(diag == c, rel[:, c][:, None], 0.0)
    mask_j = mask_ref[0, 0]
    s = jnp.where(mask_j[None, :] == 0, _NEG, s)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # [Bq, T] fp32

    gv = jnp.dot(g, v.T, preferred_element_type=jnp.float32)  # [Bq, T]
    gev = jnp.dot(g, ev_ref[:].T, preferred_element_type=jnp.float32)
    dp = gv
    for c in range(2 * w + 1):
        dp = dp + jnp.where(diag == c, gev[:, c][:, None], 0.0)

    if p_drop > 0.0:
        salt = i_b * pl.num_programs(1) + i_h
        keep = _hash_keep(rows, cols, salt, seed_ref[0],
                          _drop_threshold(p_drop))
        scale = keep * (1.0 / (1.0 - p_drop))
        pd = p * scale  # dropped probs (what fwd multiplied into v/ev)
        dp = dp * scale  # chain through the dropout mask
    else:
        pd = p
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # [Bq, T]

    dq = jnp.dot(ds.astype(k.dtype), k, preferred_element_type=jnp.float32)
    qf = q.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    first = jnp.logical_and(jnp.logical_and(i_b == 0, i_h == 0), j == 0)

    @pl.when(first)
    def _init():
        dek_ref[...] = jnp.zeros(dek_ref.shape, dek_ref.dtype)
        dev_ref[...] = jnp.zeros(dev_ref.shape, dev_ref.dtype)

    ek = ek_ref[:].astype(jnp.float32)
    # gather the 2w+1 band columns of ds / dropped-p as masked row sums,
    # then one [R, Bq] x [Bq, D] matmul each for the table grads
    ds_band = []
    pd_band = []
    for c in range(2 * w + 1):
        ds_c = jnp.sum(jnp.where(diag == c, ds, 0.0), axis=-1)  # [Bq]
        pd_c = jnp.sum(jnp.where(diag == c, pd, 0.0), axis=-1)
        dq = dq + ds_c[:, None] * ek[c][None, :]
        ds_band.append(ds_c)
        pd_band.append(pd_c)
    r_pad = dek_ref.shape[0]
    zeros = jnp.zeros_like(ds_band[0])
    ds_band += [zeros] * (r_pad - len(ds_band))  # align store to the block
    pd_band += [zeros] * (r_pad - len(pd_band))
    dek_ref[...] += jnp.dot(jnp.stack(ds_band), qf,
                            preferred_element_type=jnp.float32)
    dev_ref[...] += jnp.dot(jnp.stack(pd_band), gf,
                            preferred_element_type=jnp.float32)
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


def _attn_bwd_k_kernel(q_ref, g_ref, k_ref, v_ref, lens_ref, ek_ref, ev_ref,
                       m_ref, l_ref, d_ref, seed_ref, dk_ref, dv_ref,
                       *, w, t, bk, p_drop):
    """Backward, key side: one (batch, head, k-block) program.

    Rebuilds its p columns from the forward's saved row stats (m, l) —
    no cross-block reduction — then
        dv = p_drop^T @ g
        ds = p * (dp' - D)        with D = rowsum(g * out), precomputed
        dk = ds^T @ q
    q/g ride in full [T, D] (T<=1024 x 128 lanes fits VMEM comfortably).
    """
    jk = pl.program_id(2)
    q = q_ref[0, 0]  # [T, D]
    g = g_ref[0, 0]  # [T, D]
    k = k_ref[0, 0]  # [Bk, D]
    v = v_ref[0, 0]

    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # [T, Bk]
    rel = jnp.dot(q, ek_ref[:].T, preferred_element_type=jnp.float32)  # [T, R]
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, bk), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, bk), 1) + jk * bk
    diag = cols - rows + w
    for c in range(2 * w + 1):
        s = s + jnp.where(diag == c, rel[:, c][:, None], 0.0)
    # key mask from the sequence LENGTH (x_mask is a prefix mask here;
    # a [Bk]-wide mask block can violate TPU lane tiling for odd t)
    s = jnp.where(cols >= lens_ref[pl.program_id(0)], _NEG, s)
    m = m_ref[0, 0][:, :1]  # [T, 1] (stats are lane-replicated)
    l = l_ref[0, 0][:, :1]
    p = jnp.exp(s - m) / l  # [T, Bk] fp32

    gv = jnp.dot(g, v.T, preferred_element_type=jnp.float32)  # [T, Bk]
    gev = jnp.dot(g, ev_ref[:].T, preferred_element_type=jnp.float32)
    dp = gv
    for c in range(2 * w + 1):
        dp = dp + jnp.where(diag == c, gev[:, c][:, None], 0.0)

    if p_drop > 0.0:
        salt = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
        keep = _hash_keep(rows, cols, salt, seed_ref[0],
                          _drop_threshold(p_drop))
        scale = keep * (1.0 / (1.0 - p_drop))
        pd = p * scale
        dp = dp * scale
    else:
        pd = p
    # D_i = rowsum_j(dp'_ij * p_ij) collapses to g_i . out_i (the band term
    # folds into the same identity), computed once outside the kernel
    ds = p * (dp - d_ref[0, 0][:, :1])  # [T, Bk]

    dv_ref[0, 0] = jnp.dot(
        pd.astype(g.dtype).T, g, preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)
    dk_ref[0, 0] = jnp.dot(
        ds.astype(q.dtype).T, q, preferred_element_type=jnp.float32
    ).astype(dk_ref.dtype)


def _pick_block(t: int) -> int | None:
    for bq in (512, 256, 128, 64, 32, 16, 8):
        if t % bq == 0:
            return min(bq, t)
    return None


def _pad_inputs(q, k, v, emb_rel_k, emb_rel_v, w):
    d = q.shape[-1]
    d_pad = ((d + _LANE - 1) // _LANE) * _LANE
    r_pad = ((2 * w + 1 + 7) // 8) * 8
    if d_pad != d:
        padd = ((0, 0), (0, 0), (0, 0), (0, d_pad - d))
        q, k, v = (jnp.pad(a, padd) for a in (q, k, v))
    ek = jnp.pad(emb_rel_k, ((0, r_pad - 2 * w - 1), (0, d_pad - d)))
    ev = jnp.pad(emb_rel_v, ((0, r_pad - 2 * w - 1), (0, d_pad - d)))
    return q, k, v, ek, ev, d_pad, r_pad


def _fwd_call(q, k, v, x_mask, ek, ev, seed, *, w, p_drop, stats, interpret):
    b, h, t, d_pad = q.shape
    r_pad = ek.shape[0]
    bq = _pick_block(t)
    assert bq is not None, t
    mask3 = x_mask.astype(jnp.float32)[:, None, :]  # [b, 1, t] (tiling rules)
    grid = (b, h, t // bq)
    out_shape = [jax.ShapeDtypeStruct((b, h, t, d_pad), q.dtype)]
    out_specs = [
        pl.BlockSpec((1, 1, bq, d_pad), lambda i, g, j: (i, g, j, 0))
    ]
    if stats:
        out_shape += [jax.ShapeDtypeStruct((b, h, t, _LANE), jnp.float32)] * 2
        out_specs += [
            pl.BlockSpec((1, 1, bq, _LANE), lambda i, g, j: (i, g, j, 0))
        ] * 2
    res = pl.pallas_call(
        functools.partial(_attn_fwd_kernel, w=w, t=t, bq=bq,
                          p_drop=p_drop, stats=stats),
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d_pad), lambda i, g, j: (i, g, j, 0)),
            pl.BlockSpec((1, 1, t, d_pad), lambda i, g, j: (i, g, 0, 0)),
            pl.BlockSpec((1, 1, t, d_pad), lambda i, g, j: (i, g, 0, 0)),
            pl.BlockSpec((1, 1, t), lambda i, g, j: (i, 0, 0)),
            pl.BlockSpec((r_pad, d_pad), lambda i, g, j: (0, 0)),
            pl.BlockSpec((r_pad, d_pad), lambda i, g, j: (0, 0)),
            _seed_spec(),
        ],
        out_specs=out_specs,
        interpret=interpret,
    )(q, k, v, mask3, ek, ev, seed)
    return res if stats else (res[0], None, None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _banded_core(w, p_drop, interpret, q, k, v, x_mask, ek, ev, seed):
    """Padded-shape core ([b,h,t,d_pad] in/out, [R,d_pad] tables)."""
    out, _, _ = _fwd_call(q, k, v, x_mask, ek, ev, seed,
                          w=w, p_drop=p_drop, stats=False,
                          interpret=interpret)
    return out


def _banded_core_fwd(w, p_drop, interpret, q, k, v, x_mask, ek, ev, seed):
    out, m, l = _fwd_call(q, k, v, x_mask, ek, ev, seed,
                          w=w, p_drop=p_drop, stats=True,
                          interpret=interpret)
    return out, (q, k, v, x_mask, ek, ev, seed, m, l, out)


def _banded_core_bwd(w, p_drop, interpret, res, g):
    q, k, v, x_mask, ek, ev, seed, m, l, out = res
    b, h, t, d_pad = q.shape
    r_pad = ek.shape[0]
    bq = min(_pick_block(t), _BWD_BQ)
    mask3 = x_mask.astype(jnp.float32)[:, None, :]
    g = g.astype(q.dtype)

    grid = (b, h, t // bq)
    dq, dek, dev = pl.pallas_call(
        functools.partial(_attn_bwd_q_kernel, w=w, t=t, bq=bq,
                          p_drop=p_drop),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, t, d_pad), q.dtype),
            jax.ShapeDtypeStruct((r_pad, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, d_pad), jnp.float32),
        ],
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d_pad), lambda i, g, j: (i, g, j, 0)),
            pl.BlockSpec((1, 1, t, d_pad), lambda i, g, j: (i, g, 0, 0)),
            pl.BlockSpec((1, 1, t, d_pad), lambda i, g, j: (i, g, 0, 0)),
            pl.BlockSpec((1, 1, t), lambda i, g, j: (i, 0, 0)),
            pl.BlockSpec((r_pad, d_pad), lambda i, g, j: (0, 0)),
            pl.BlockSpec((r_pad, d_pad), lambda i, g, j: (0, 0)),
            _seed_spec(),
            pl.BlockSpec((1, 1, bq, d_pad), lambda i, g, j: (i, g, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, d_pad), lambda i, g, j: (i, g, j, 0)),
            pl.BlockSpec((r_pad, d_pad), lambda i, g, j: (0, 0)),
            pl.BlockSpec((r_pad, d_pad), lambda i, g, j: (0, 0)),
        ],
        interpret=interpret,
    )(q, k, v, mask3, ek, ev, seed, g)

    # D_i = g_i . out_i (see bwd-k kernel docstring), lane-replicated like
    # the saved row stats
    d_row = jnp.broadcast_to(
        jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                axis=-1, keepdims=True),
        (b, h, t, _LANE),
    )
    lens = jnp.sum(x_mask.astype(jnp.float32), axis=-1).astype(jnp.int32)
    dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_k_kernel, w=w, t=t, bk=bq,
                          p_drop=p_drop),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, t, d_pad), q.dtype),
            jax.ShapeDtypeStruct((b, h, t, d_pad), q.dtype),
        ],
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, t, d_pad), lambda i, g, j: (i, g, 0, 0)),
            pl.BlockSpec((1, 1, t, d_pad), lambda i, g, j: (i, g, 0, 0)),
            pl.BlockSpec((1, 1, bq, d_pad), lambda i, g, j: (i, g, j, 0)),
            pl.BlockSpec((1, 1, bq, d_pad), lambda i, g, j: (i, g, j, 0)),
            _seed_spec(),  # lens [b] int32, SMEM
            pl.BlockSpec((r_pad, d_pad), lambda i, g, j: (0, 0)),
            pl.BlockSpec((r_pad, d_pad), lambda i, g, j: (0, 0)),
            pl.BlockSpec((1, 1, t, _LANE), lambda i, g, j: (i, g, 0, 0)),
            pl.BlockSpec((1, 1, t, _LANE), lambda i, g, j: (i, g, 0, 0)),
            pl.BlockSpec((1, 1, t, _LANE), lambda i, g, j: (i, g, 0, 0)),
            _seed_spec(),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, d_pad), lambda i, g, j: (i, g, j, 0)),
            pl.BlockSpec((1, 1, bq, d_pad), lambda i, g, j: (i, g, j, 0)),
        ],
        interpret=interpret,
    )(q, g, k, v, lens, ek, ev, m, l, d_row, seed)

    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return (dq, dk, dv, jnp.zeros_like(x_mask), dek.astype(ek.dtype),
            dev.astype(ev.dtype), dseed)


_banded_core.defvjp(_banded_core_fwd, _banded_core_bwd)


def banded_rel_self_attention(q, k, v, x_mask, emb_rel_k, emb_rel_v,
                              window_size, dropout_p: float = 0.0,
                              dropout_seed=None, interpret: bool = False):
    """q,k,v: [b, h, t, d] (q pre-scaled by 1/sqrt(d)); x_mask: [b, t] 0/1;
    emb_rel_k/v: [2w+1, d] (heads-shared table). Returns [b, h, t, d].

    Differentiable (custom_vjp, Pallas backward). dropout_p > 0 applies
    attention-prob dropout inside the kernel from `dropout_seed` (int32 [1];
    required when dropout_p > 0) — reference attentions.py:278.
    """
    d = q.shape[-1]
    w = int(window_size)
    if dropout_seed is None:
        dropout_seed = jnp.zeros((1,), jnp.int32)
    q, k, v, ek, ev, d_pad, _ = _pad_inputs(q, k, v, emb_rel_k, emb_rel_v, w)
    out = _banded_core(w, float(dropout_p), bool(interpret),
                       q, k, v, x_mask, ek, ev, dropout_seed)
    return out[..., :d] if d_pad != d else out


def hash_dropout_probs(p_attn, p_drop: float, seed):
    """XLA-path twin of the in-kernel dropout: p_attn [b, h, t, t] ->
    dropped+rescaled probs using the identical position hash, so the dense
    fallback (CPU target of jax.lax.platform_dependent) trains the same
    function as the TPU kernel."""
    b, h, t, _ = p_attn.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (b, h, t, t), 2)
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, h, t, t), 3)
    bi = jax.lax.broadcasted_iota(jnp.int32, (b, h, t, t), 0)
    hi = jax.lax.broadcasted_iota(jnp.int32, (b, h, t, t), 1)
    keep = _hash_keep(rows, cols, bi * h + hi, seed[0],
                      _drop_threshold(p_drop))
    return p_attn * keep.astype(p_attn.dtype) / (1.0 - p_drop)


_FORCE_LAX = False


class force_lax_attention:
    """Context manager: make every attention call site take the dense lax
    path regardless of platform. Used when tracing for portable export
    (ONNX / StableHLO) where Pallas kernels must not appear in the graph."""

    def __enter__(self):
        global _FORCE_LAX
        self._prev = _FORCE_LAX
        _FORCE_LAX = True
        return self

    def __exit__(self, *exc):
        global _FORCE_LAX
        _FORCE_LAX = self._prev
        return False


def banded_attention_supported(t: int) -> bool:
    if _FORCE_LAX:
        return False
    return _pick_block(t) is not None
