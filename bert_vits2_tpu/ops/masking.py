"""Sequence-mask / path / slicing primitives (reference: commons.py:22-140).

All functions are pure jnp, shape-static, and channel-last ([b, t, c]) unless
stated otherwise. Masks are float arrays of shape [b, t] (no singleton channel
axis — broadcasting against [b, t, c] activations is implicit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sequence_mask(lengths: jax.Array, max_length: int) -> jax.Array:
    """[b] int lengths -> [b, t] float32 mask. Ref: commons.py:118-123."""
    pos = jnp.arange(max_length, dtype=lengths.dtype)
    return (pos[None, :] < lengths[:, None]).astype(jnp.float32)


def intersperse(seq, item):
    """Insert `item` between every element and at both ends (host-side helper).

    Ref: commons.py:22-25. [a, b] -> [item, a, item, b, item].
    """
    out = [item] * (len(seq) * 2 + 1)
    out[1::2] = seq
    return out


def intersperse_jnp(x: jax.Array, item) -> jax.Array:
    """Device-side intersperse along the last axis: [..., t] -> [..., 2t+1]."""
    shape = x.shape[:-1] + (2 * x.shape[-1] + 1,)
    out = jnp.full(shape, item, dtype=x.dtype)
    return out.at[..., 1::2].set(x)


def slice_segments(x: jax.Array, starts: jax.Array, segment_size: int) -> jax.Array:
    """Gather fixed-length time windows. x: [b, t, c], starts: [b] -> [b, s, c].

    Ref: commons.py:48-53 (gather formulation, channel-last here).
    """
    idx = starts[:, None] + jnp.arange(segment_size)[None, :]  # [b, s]
    return jnp.take_along_axis(x, idx[:, :, None], axis=1)


def rand_slice_segments(
    x: jax.Array, lengths: jax.Array, segment_size: int, rng: jax.Array
):
    """Random training windows. Ref: commons.py:56-62.

    x: [b, t, c]; lengths: [b] -> (segments [b, s, c], starts [b]).
    """
    b = x.shape[0]
    max_start = jnp.maximum(lengths - segment_size + 1, 0).astype(jnp.float32)
    u = jax.random.uniform(rng, (b,))
    starts = (u * max_start).astype(jnp.int32)
    return slice_segments(x, starts, segment_size), starts


def generate_path(duration: jax.Array, x_mask: jax.Array, y_mask: jax.Array):
    """Monotonic 0/1 alignment from integer durations (inference expansion).

    duration: [b, t_x] (already masked), x_mask: [b, t_x], y_mask: [b, t_y]
    -> path [b, t_y, t_x] float. Ref: commons.py:126-140 (cumsum + mask-diff
    trick; here without the singleton channel axes).
    """
    t_y = y_mask.shape[1]
    cum = jnp.cumsum(duration, axis=-1)  # [b, t_x]
    pos = jnp.arange(t_y, dtype=cum.dtype)  # [t_y]
    # path_cum[b, x, y] = y < cum[b, x]
    path = (pos[None, None, :] < cum[:, :, None]).astype(jnp.float32)  # [b,t_x,t_y]
    # subtract the shifted cumulative rows -> exclusive band per x
    path = path - jnp.pad(path, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    path = jnp.transpose(path, (0, 2, 1))  # [b, t_y, t_x]
    return path * x_mask[:, None, :] * y_mask[:, :, None]


def kl_divergence_gaussian(m_p, logs_p, m_q, logs_q):
    """KL(P||Q) per element for diagonal Gaussians. Ref: commons.py:28-34."""
    return (
        (logs_q - logs_p)
        - 0.5
        + 0.5 * (jnp.exp(2.0 * logs_p) + (m_p - m_q) ** 2) * jnp.exp(-2.0 * logs_q)
    )
