"""Monotonic alignment search (MAS), on-device (reference: monotonic_align/).

The reference runs a numba CPU kernel with a device->host->device round-trip
(monotonic_align/__init__.py:7-16, core.py:4-47). Here the same Viterbi DP is a
`lax.scan` over mel frames (each step is one vectorized [b, t_x] row update),
entirely on TPU, followed by a scanned backtrack emitting one-hot rows. A
Pallas kernel (`align_pallas.py`) provides the fused fast path; this module is
the always-correct reference formulation and the public entry point.

Semantics match the numba kernel exactly, including the band condition
x in [max(0, t_x + y - t_y), min(t_x, y + 1)) and the tie-breaking
`value[y-1, x] < value[y-1, x-1]` (strict) in the backtrack.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_NEG = -1e9


def _forward_dp(neg_cent: jax.Array, t_ys: jax.Array, t_xs: jax.Array) -> jax.Array:
    """Accumulate best-path scores row by row. neg_cent: [b, t_y, t_x] -> V."""
    b, t_y, t_x = neg_cent.shape
    xs_idx = jnp.arange(t_x)  # [t_x]

    def step(prev_row, inp):
        y, raw = inp  # raw: [b, t_x]
        shifted = jnp.concatenate(
            [jnp.full((b, 1), _NEG, raw.dtype), prev_row[:, :-1]], axis=1
        )
        v_prev = jnp.where(
            xs_idx[None, :] == 0,
            jnp.where(y == 0, 0.0, _NEG),
            shifted,
        )
        v_cur = jnp.where(xs_idx[None, :] == y, _NEG, prev_row)
        lo = jnp.maximum(0, t_xs + y - t_ys)[:, None]  # [b,1]
        hi = jnp.minimum(t_xs, y + 1)[:, None]
        in_band = (xs_idx[None, :] >= lo) & (xs_idx[None, :] < hi)
        row = raw + jnp.where(in_band, jnp.maximum(v_prev, v_cur), 0.0)
        return row, row

    ys = jnp.arange(t_y)
    init = jnp.full((b, t_x), _NEG, neg_cent.dtype)
    _, rows = jax.lax.scan(step, init, (ys, jnp.swapaxes(neg_cent, 0, 1)))
    return jnp.swapaxes(rows, 0, 1)  # [b, t_y, t_x]


def _backtrack(values: jax.Array, t_ys: jax.Array, t_xs: jax.Array) -> jax.Array:
    """Walk the argmax path top-down, emitting one-hot rows. -> [b, t_y, t_x]."""
    b, t_y, t_x = values.shape
    # row y-1 for each y (clamped at 0; y=0 never dereferences it on valid paths)
    prev_rows = jnp.concatenate([values[:, :1], values[:, :-1]], axis=1)

    def step(index, inp):
        y, prev_row = inp  # prev_row: [b, t_x] = values[:, y-1]
        active = y < t_ys  # [b]
        emit = jax.nn.one_hot(index, t_x, dtype=values.dtype) * active[:, None]
        v_here = jnp.take_along_axis(prev_row, index[:, None], axis=1)[:, 0]
        v_left = jnp.take_along_axis(
            prev_row, jnp.maximum(index - 1, 0)[:, None], axis=1
        )[:, 0]
        move = (index != 0) & ((index == y) | (v_here < v_left))
        index = jnp.where(active & move, index - 1, index)
        return index, emit

    ys = jnp.arange(t_y - 1, -1, -1)
    init_index = t_xs - 1
    _, emits = jax.lax.scan(
        step, init_index, (ys, jnp.swapaxes(prev_rows, 0, 1)[::-1])
    )
    return jnp.swapaxes(emits[::-1], 0, 1)  # [b, t_y, t_x]


def maximum_path_scan(
    neg_cent: jax.Array, t_ys: jax.Array, t_xs: jax.Array
) -> jax.Array:
    """MAS via lax.scan. neg_cent [b, t_y, t_x] fp32, lengths [b] int32."""
    values = _forward_dp(neg_cent.astype(jnp.float32), t_ys, t_xs)
    return _backtrack(values, t_ys, t_xs)


def maximum_path_auto(
    neg_cent: jax.Array, t_ys: jax.Array, t_xs: jax.Array
) -> jax.Array:
    """Best available MAS: the fused Pallas kernel on TPU (when the VMEM
    working set fits), the lax.scan formulation elsewhere. Both are
    bit-identical to the reference numba kernel.

    The branch is picked with `lax.platform_dependent` at *lowering* time, not
    from `jax.default_backend()`: the same traced program may be compiled for
    CPU devices (virtual-mesh dry runs) while a TPU plugin is the default
    backend, and the Pallas kernel only lowers on TPU.
    """
    b, t_y, t_x = neg_cent.shape
    b_pad = ((max(b, 1) + 7) // 8) * 8
    x_pad = ((t_x + 127) // 128) * 128
    vmem_bytes = 2 * t_y * b_pad * x_pad + 8 * 4 * b_pad * x_pad
    if vmem_bytes <= 12 * 1024 * 1024:
        from bert_vits2_tpu.ops.align_pallas import maximum_path_pallas

        return jax.lax.platform_dependent(
            neg_cent,
            t_ys,
            t_xs,
            tpu=maximum_path_pallas,
            default=maximum_path_scan,
        )
    return maximum_path_scan(neg_cent, t_ys, t_xs)


def maximum_path(neg_cent: jax.Array, attn_mask: jax.Array) -> jax.Array:
    """Drop-in equivalent of monotonic_align.maximum_path (reference API).

    neg_cent: [b, t_y, t_x]; attn_mask: [b, t_y, t_x] (0/1).
    Returns a float path matrix of the same shape.
    """
    t_ys = jnp.sum(attn_mask[:, :, 0], axis=1).astype(jnp.int32)
    t_xs = jnp.sum(attn_mask[:, 0, :], axis=1).astype(jnp.int32)
    return maximum_path_auto(neg_cent, t_ys, t_xs)


def maximum_path_numpy(neg_cent: np.ndarray, t_ys: np.ndarray, t_xs: np.ndarray):
    """Pure-numpy golden model of the numba DP (tests only; core.py:4-47)."""
    neg_cent = neg_cent.astype(np.float32).copy()
    b, T_y, T_x = neg_cent.shape
    path = np.zeros((b, T_y, T_x), dtype=np.float32)
    for i in range(b):
        v = neg_cent[i]
        t_y, t_x = int(t_ys[i]), int(t_xs[i])
        for y in range(t_y):
            for x in range(max(0, t_x + y - t_y), min(t_x, y + 1)):
                v_cur = _NEG if x == y else v[y - 1, x]
                v_prev = (0.0 if y == 0 else _NEG) if x == 0 else v[y - 1, x - 1]
                v[y, x] += max(v_prev, v_cur)
        index = t_x - 1
        for y in range(t_y - 1, -1, -1):
            path[i, y, index] = 1.0
            if index != 0 and (index == y or v[y - 1, index] < v[y - 1, index - 1]):
                index -= 1
    return path
