"""Pallas TPU kernel for monotonic alignment search (MAS).

The reference computes MAS on the host with a numba kernel and a
device->host->device round trip (monotonic_align/__init__.py:7-16,
core.py:4-47). `ops.align.maximum_path_scan` moves the same DP on-device via
lax.scan but pays XLA loop overhead twice per frame; this kernel runs the
whole forward DP + backtrack in ONE Pallas program:

- the full batch is vectorized across sublanes (rows [b_pad, t_x_pad], so the
  inherently sequential frame loop is a single VPU instruction stream);
- score rows stream HBM->VMEM in chunks of 4 frames with double-buffered
  async DMA (chunk k+1 in flight while k computes), and both loops are
  manually unrolled 4x to amortize loop overhead (Mosaic has no partial
  fori_loop unroll);
- instead of keeping the O(t_y * t_x) score matrix for the backtrack, each
  step stores one int8 row of DECISION BITS: move-left[y, x] =
  (x == y) | (v[y-1, x] < v[y-1, x-1]) — exactly the predicate the numba
  backtrack evaluates (core.py:37-44);
- the backtrack walks the decision bits top-down and emits int8 one-hot path
  rows (dynamic indexing on the leading/frame axis only — Mosaic forbids
  dynamic lane offsets).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9
_SUBLANE = 8
_LANE = 128
_UNROLL = 4  # frames per loop iteration / DMA chunk


def _mas_kernel(neg_hbm, t_ys_ref, t_xs_ref, path_ref, dec_ref, row_buf, sems):
    """Single-program fused MAS. Shapes:
    neg_hbm [t_y_pad, b_pad, x_pad] (ANY/HBM), t_ys/t_xs [b_pad, 1] VMEM,
    path_ref [t_y_pad, b_pad, x_pad] int8 VMEM out, dec_ref same-shape int8
    scratch, row_buf [2, _UNROLL, b_pad, x_pad] f32 scratch, sems: 2 DMA
    semaphores. t_y_pad is a multiple of _UNROLL; frames beyond the true
    lengths are inert (outside every band / length mask).
    """
    t_y_pad, b_pad, x_pad = neg_hbm.shape
    n_chunks = t_y_pad // _UNROLL
    xs = jax.lax.broadcasted_iota(jnp.int32, (b_pad, x_pad), 1)
    t_ys = t_ys_ref[:]  # [b_pad, 1]
    t_xs = t_xs_ref[:]

    def chunk_dma(slot, k):
        return pltpu.make_async_copy(
            neg_hbm.at[pl.ds(k * _UNROLL, _UNROLL)],
            row_buf.at[slot],
            sems.at[slot],
        )

    chunk_dma(0, 0).start()

    def row_update(y, j, slot, prev_row):
        """One DP step: consume stored row y-1 (prev_row), emit row y."""
        raw = row_buf[slot, j]
        shifted = pltpu.roll(prev_row, 1, axis=1)  # v[y-1, x-1] (x=0 unused)
        dec_ref[y] = ((xs == y) | (prev_row < shifted)).astype(jnp.int8)
        # band + masks identical to ops.align._forward_dp / numba core.py:20-35
        v_prev = jnp.where(xs == 0, jnp.where(y == 0, 0.0, _NEG), shifted)
        v_cur = jnp.where(xs == y, _NEG, prev_row)
        lo = jnp.maximum(0, t_xs + y - t_ys)
        hi = jnp.minimum(t_xs, y + 1)
        in_band = (xs >= lo) & (xs < hi)
        return raw + jnp.where(in_band, jnp.maximum(v_prev, v_cur), 0.0)

    def fwd(k, prev_row):
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < n_chunks)
        def _():
            chunk_dma(jax.lax.rem(k + 1, 2), k + 1).start()

        chunk_dma(slot, k).wait()
        for j in range(_UNROLL):
            prev_row = row_update(k * _UNROLL + j, j, slot, prev_row)
        return prev_row

    init = jnp.full((b_pad, x_pad), _NEG, jnp.float32)
    jax.lax.fori_loop(0, n_chunks, fwd, init)

    def bwd_step(y, index):
        active = y < t_ys
        on_path = xs == index
        path_ref[y] = (on_path & active).astype(jnp.int8)
        d = jnp.sum(
            jnp.where(on_path, dec_ref[y].astype(jnp.int32), 0),
            axis=1,
            keepdims=True,
        )
        move = active & (index != 0) & (d > 0)
        return jnp.where(move, index - 1, index)

    def bwd(k, index):  # index: [b_pad, 1] current path column
        base = t_y_pad - 1 - k * _UNROLL
        for j in range(_UNROLL):
            index = bwd_step(base - j, index)
        return index

    jax.lax.fori_loop(0, n_chunks, bwd, t_xs - 1)


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def maximum_path_pallas(
    neg_cent: jax.Array,
    t_ys: jax.Array,
    t_xs: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """MAS on TPU via a fused Pallas kernel.

    neg_cent [b, t_y, t_x] fp32, lengths [b] int32 -> one-hot path
    [b, t_y, t_x] fp32, bit-identical to the reference numba kernel.
    """
    b, t_y, t_x = neg_cent.shape
    b_pad = _pad_to(max(b, 1), _SUBLANE)
    x_pad = _pad_to(t_x, _LANE)
    t_y_pad = _pad_to(t_y, _UNROLL)

    # frame-major layout so each DMA chunk is contiguous [_UNROLL, b, x] tiles
    neg = jnp.zeros((t_y_pad, b_pad, x_pad), jnp.float32)
    neg = neg.at[:t_y, :b, :t_x].set(
        jnp.swapaxes(neg_cent.astype(jnp.float32), 0, 1)
    )
    ys = jnp.zeros((b_pad, 1), jnp.int32).at[:b, 0].set(t_ys.astype(jnp.int32))
    xs = jnp.ones((b_pad, 1), jnp.int32).at[:b, 0].set(t_xs.astype(jnp.int32))

    path = pl.pallas_call(
        _mas_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # streamed chunk by chunk
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_y_pad, b_pad, x_pad), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((t_y_pad, b_pad, x_pad), jnp.int8),
            pltpu.VMEM((2, _UNROLL, b_pad, x_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(neg, ys, xs)

    return jnp.swapaxes(path[:t_y, :b, :t_x], 0, 1).astype(neg_cent.dtype)
