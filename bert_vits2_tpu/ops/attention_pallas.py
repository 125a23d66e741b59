"""Pallas TPU kernel: fused self-attention with banded relative-position bias.

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

Numerics: scores and softmax accumulate in fp32 regardless of input dtype
(the XLA path softmaxes in the activation dtype, so bf16 runs of this kernel
are slightly MORE accurate). Sequence masking uses the same -1e4 fill as the
reference, so fully-padded rows produce the same uniform distribution.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_NEG = -1e4  # matches the reference mask fill (attentions.py:303)


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, ek_ref, ev_ref, o_ref, *, w, t, bq):
    """One (batch, head, query-block) program.

    q [1,1,Bq,D] (pre-scaled), k/v [1,1,T,D], mask [1,T] (this batch row),
    ek/ev [R,D] with the 2w+1 real rows zero-padded to R, out [1,1,Bq,D].
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
    p = (e / l).astype(v.dtype)  # [Bq, T]

    out = jnp.dot(p, v, preferred_element_type=jnp.float32)  # [Bq, D]
    # value-side relative term: out[i] += sum_c p[i, i+c-w] * emb_v[c]
    # (reference attentions.py:316-322). Extract the 2w+1 band columns as
    # masked row-sums of p — never materializing the [t, 2t-1] skew.
    ev = ev_ref[:].astype(jnp.float32)
    pf = e / l
    for c in range(2 * w + 1):
        band_c = jnp.sum(jnp.where(diag == c, pf, 0.0), axis=-1)  # [Bq]
        out = out + band_c[:, None] * ev[c][None, :]
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _pick_block(t: int) -> int | None:
    for bq in (512, 256, 128, 64, 32, 16, 8):
        if t % bq == 0:
            return min(bq, t)
    return None


@functools.partial(jax.jit, static_argnames=("window_size",))
def banded_rel_self_attention(q, k, v, x_mask, emb_rel_k, emb_rel_v, window_size):
    """q,k,v: [b, h, t, d] (q pre-scaled by 1/sqrt(d)); x_mask: [b, t] 0/1;
    emb_rel_k/v: [2w+1, d] (heads-shared table). Returns [b, h, t, d]."""
    b, h, t, d = q.shape
    w = window_size
    bq = _pick_block(t)
    assert bq is not None, t

    d_pad = ((d + _LANE - 1) // _LANE) * _LANE
    r_pad = ((2 * w + 1 + 7) // 8) * 8
    if d_pad != d:
        padd = ((0, 0), (0, 0), (0, 0), (0, d_pad - d))
        q, k, v = (jnp.pad(a, padd) for a in (q, k, v))
    ek = jnp.pad(emb_rel_k, ((0, r_pad - 2 * w - 1), (0, d_pad - d)))
    ev = jnp.pad(emb_rel_v, ((0, r_pad - 2 * w - 1), (0, d_pad - d)))
    x_mask = x_mask.astype(jnp.float32)[:, None, :]  # [b, 1, t] (tiling rules)

    grid = (b, h, t // bq)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, w=w, t=t, bq=bq),
        out_shape=jax.ShapeDtypeStruct((b, h, t, d_pad), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d_pad), lambda i, g, j: (i, g, j, 0)),
            pl.BlockSpec((1, 1, t, d_pad), lambda i, g, j: (i, g, 0, 0)),
            pl.BlockSpec((1, 1, t, d_pad), lambda i, g, j: (i, g, 0, 0)),
            pl.BlockSpec((1, 1, t), lambda i, g, j: (i, 0, 0)),
            pl.BlockSpec((r_pad, d_pad), lambda i, g, j: (0, 0)),
            pl.BlockSpec((r_pad, d_pad), lambda i, g, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d_pad), lambda i, g, j: (i, g, j, 0)),
    )(q, k, v, x_mask, ek, ev)
    return out[..., :d] if d_pad != d else out


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
