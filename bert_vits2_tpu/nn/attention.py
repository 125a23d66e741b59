"""Relative-position transformer encoder (reference: attentions.py:37-464).

Channel-last [b, t, h]. The +-window relative-position bias uses the standard
skew trick (pad + reshape; ref attentions.py:360-395) which XLA compiles to
pure data movement. Speaker conditioning is injected before layer
`cond_layer_idx` (vits2; ref attentions.py:103-110). heads_share=True as in the
reference (one relative embedding table shared across heads).
"""

from __future__ import annotations

import math
import os

import flax.linen as nn
import jax
import jax.numpy as jnp

from bert_vits2_tpu.nn.conv import Dense
from bert_vits2_tpu.nn.norm import LayerNorm


def _rel_to_abs(x: jax.Array) -> jax.Array:
    """[b, h, t, 2t-1] relative logits -> [b, h, t, t]. Ref: attentions.py:360-377."""
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))  # [b,h,t,2t]
    x = x.reshape(b, h, t * 2 * t)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, t - 1)))
    x = x.reshape(b, h, t + 1, 2 * t - 1)
    return x[:, :, :t, t - 1 :]


def _abs_to_rel(x: jax.Array) -> jax.Array:
    """[b, h, t, t] attention weights -> [b, h, t, 2t-1]. Ref: attentions.py:379-392."""
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, t - 1)))
    x = x.reshape(b, h, t * t + t * (t - 1))
    x = jnp.pad(x, ((0, 0), (0, 0), (t, 0)))
    x = x.reshape(b, h, t, 2 * t)
    return x[:, :, :, 1:]


def _window_embeddings(emb: jax.Array, length: int, window_size: int) -> jax.Array:
    """Slice/pad the +-window table to 2*length-1 positions. Ref: attentions.py:344-358."""
    pad = max(length - (window_size + 1), 0)
    start = max((window_size + 1) - length, 0)
    if pad > 0:
        emb = jnp.pad(emb, ((0, 0), (pad, pad), (0, 0)))
    return emb[:, start : start + 2 * length - 1]


def _band_mask(t: int, w: int, dtype=jnp.float32) -> jax.Array:
    r = jnp.arange(t)
    return (jnp.abs(r[None, :] - r[:, None]) <= w).astype(dtype)


def _band_to_abs(x: jax.Array, t: int, w: int) -> jax.Array:
    """Banded rel logits [b, h, t, 2w+1] -> [b, h, t, t] bias with
    B[t, s] = x[t, s - t + w] inside the band, 0 outside.

    Flat-view stride trick: padding each row of x to width t+1 and viewing
    the flat buffer offset by w realizes the diagonal placement with pure
    data movement — the O(t^2)-wide skew (_rel_to_abs on a 2t-1 tensor,
    ref attentions.py:360-377) is never materialized. Corner wrap-around is
    cancelled by the band mask.
    """
    b, h, _, width = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, t + 1 - width)))
    flat = x.reshape(b, h, t * (t + 1))
    flat = jnp.pad(flat, ((0, 0), (0, 0), (0, w)))[:, :, w:]
    return flat[:, :, : t * t].reshape(b, h, t, t) * _band_mask(t, w, x.dtype)


def _abs_to_band(p: jax.Array, w: int) -> jax.Array:
    """Attention weights [b, h, t, t] -> band [b, h, t, 2w+1] with
    band[t, c] = p[t, t + c - w] (0 where t + c - w is out of range).
    Inverse flat-view of _band_to_abs; replaces _abs_to_rel's [t, 2t-1]
    intermediate (ref attentions.py:379-392)."""
    b, h, t, _ = p.shape
    flat = p.reshape(b, h, t * t)
    flat = jnp.pad(flat, ((0, 0), (0, 0), (w, t + 1 - w)))
    band = flat[:, :, : t * (t + 1)].reshape(b, h, t, t + 1)[:, :, :, : 2 * w + 1]
    # zero the wrapped corners (t + c - w outside [0, t))
    tt = jnp.arange(t)[:, None]
    cc = jnp.arange(2 * w + 1)[None, :]
    valid = ((tt + cc - w >= 0) & (tt + cc - w < t)).astype(p.dtype)
    return band * valid


class MultiHeadAttention(nn.Module):
    """Self/cross attention with optional relative-position bias.

    Ref: attentions.py:205-341. proximal bias/init and block_length local
    masking are supported for completeness (used by the reference Decoder).
    """

    channels: int
    out_channels: int
    n_heads: int
    p_dropout: float = 0.0
    window_size: int | None = None
    heads_share: bool = True
    block_length: int | None = None
    proximal_bias: bool = False

    @nn.compact
    def __call__(self, x, c, attn_mask=None, deterministic=True, x_mask_vec=None):
        h = self.n_heads
        k_channels = self.channels // h
        q = Dense(self.channels, name="conv_q")(x)
        k = Dense(self.channels, name="conv_k")(c)
        v = Dense(self.channels, name="conv_v")(c)

        b, t_t, _ = q.shape
        t_s = k.shape[1]
        # [b, t, c] -> [b, h, t, d]
        q = q.reshape(b, t_t, h, k_channels).transpose(0, 2, 1, 3)
        k = k.reshape(b, t_s, h, k_channels).transpose(0, 2, 1, 3)
        v = v.reshape(b, t_s, h, k_channels).transpose(0, 2, 1, 3)

        scale = 1.0 / math.sqrt(k_channels)

        # Fused Pallas path: banded rel-pos self-attention with a 1-D sequence
        # mask, heads-shared table — i.e. every VITS2 encoder/flow call site,
        # at INFERENCE. The op also carries a custom_vjp with Pallas backward
        # kernels (in-kernel position-hash dropout), but the TRAINING
        # direction defaults to the dense XLA path: a full-train-step A/B
        # (tools/ab_train_attention.py, v5e) measured the composed step 4.5%
        # FASTER with dense attention (6.68 vs 6.38 steps/s on-device) even
        # though the kernel wins 1.8x in isolation — the custom_vjp boundary
        # blocks XLA fusion/remat around the call. Opt the training direction
        # back in with BV2_FUSED_ATTENTION_TRAIN=1 (exact-gradient tests in
        # tests/test_ops.py keep the VJP correct). Selected per
        # compile-target platform (the kernel only lowers on TPU).
        from bert_vits2_tpu.ops.attention_pallas import (
            banded_attention_supported,
            banded_rel_self_attention,
            hash_dropout_probs,
        )

        if (
            self.window_size is not None
            and self.heads_share
            and x_mask_vec is not None
            and t_s == t_t
            and 2 * self.window_size + 1 <= t_s + 1
            and self.block_length is None
            and not self.proximal_bias
            and banded_attention_supported(t_s)
            and (deterministic
                 or os.environ.get("BV2_FUSED_ATTENTION_TRAIN") == "1")
            # flax init runs eagerly: don't pay a per-op Mosaic compile for
            # a kernel whose only job here would be producing shapes
            and not self.is_initializing()
        ):
            w = self.window_size
            rel_stddev = k_channels**-0.5
            emb_rel_k = self.param(
                "emb_rel_k",
                nn.initializers.normal(rel_stddev),
                (1, 2 * w + 1, k_channels),
            )
            emb_rel_v = self.param(
                "emb_rel_v",
                nn.initializers.normal(rel_stddev),
                (1, 2 * w + 1, k_channels),
            )
            p_drop = 0.0 if deterministic else float(self.p_dropout)
            if p_drop > 0.0:
                seed = jax.lax.bitcast_convert_type(
                    jax.random.bits(self.make_rng("dropout"), (1,)),
                    jnp.int32,
                )
            else:
                seed = jnp.zeros((1,), jnp.int32)

            def _fused(q, k, v, m, ek, ev, seed):
                return banded_rel_self_attention(
                    q, k, v, m, ek, ev, w,
                    dropout_p=p_drop, dropout_seed=seed,
                )

            def _dense(q, k, v, m, ek, ev, seed):
                scores = jnp.einsum("bhtd,bhsd->bhts", q, k)
                rel_band = jnp.einsum("bhtd,cd->bhtc", q, ek)
                scores = scores + _band_to_abs(rel_band, t_s, w)
                am = m[:, None, :, None] * m[:, None, None, :]
                scores = jnp.where(am == 0, -1e4, scores)
                p_attn = jax.nn.softmax(scores, axis=-1)
                if p_drop > 0.0:  # identical hash stream as the kernel
                    p_attn = hash_dropout_probs(p_attn, p_drop, seed)
                out = jnp.einsum("bhts,bhsd->bhtd", p_attn, v)
                band = _abs_to_band(p_attn, w)
                return out + jnp.einsum("bhtc,cd->bhtd", band, ev)

            dt = q.dtype
            output = jax.lax.platform_dependent(
                (q * scale).astype(dt),
                k,
                v,
                x_mask_vec.astype(dt),
                emb_rel_k[0].astype(dt),
                emb_rel_v[0].astype(dt),
                seed,
                tpu=_fused,
                default=_dense,
            )
            output = output.transpose(0, 2, 1, 3).reshape(b, t_t, self.channels)
            return Dense(self.out_channels, name="conv_o")(output)

        scores = jnp.einsum("bhtd,bhsd->bhts", q * scale, k)

        banded = False
        if self.window_size is not None:
            assert t_s == t_t, "relative attention requires self-attention"
            w = self.window_size
            n_heads_rel = 1 if self.heads_share else h
            rel_stddev = k_channels**-0.5
            emb_rel_k = self.param(
                "emb_rel_k",
                nn.initializers.normal(rel_stddev),
                (n_heads_rel, 2 * w + 1, k_channels),
            )
            emb_rel_v = self.param(
                "emb_rel_v",
                nn.initializers.normal(rel_stddev),
                (n_heads_rel, 2 * w + 1, k_channels),
            )
            # banded fast path: the bias lives in a +-w diagonal band, so
            # compute logits against the raw (2w+1)-entry table and place
            # them diagonally — never building the O(t * 2t) skew tensors
            banded = 2 * w + 1 <= t_s + 1
            emb_rel_k = emb_rel_k.astype(q.dtype)
            emb_rel_v = emb_rel_v.astype(q.dtype)
            if banded:
                rel_band = jnp.einsum("bhtd,gcd->bhtc", q * scale, emb_rel_k)
                scores = scores + _band_to_abs(rel_band, t_s, w)
            else:
                key_rel = _window_embeddings(emb_rel_k, t_s, w)
                rel_logits = jnp.einsum("bhtd,gmd->bhtm", q * scale, key_rel)
                scores = scores + _rel_to_abs(rel_logits)

        if self.proximal_bias:
            r = jnp.arange(t_s, dtype=jnp.float32)
            diff = r[None, :] - r[:, None]
            scores = scores + (-jnp.log1p(jnp.abs(diff)))[None, None]

        if attn_mask is not None:
            scores = jnp.where(attn_mask == 0, -1e4, scores)
            if self.block_length is not None:
                pos = jnp.arange(t_s)
                band = jnp.abs(pos[None, :] - pos[:, None]) <= self.block_length
                scores = jnp.where(band[None, None], scores, -1e4)

        p_attn = jax.nn.softmax(scores, axis=-1)
        p_attn = nn.Dropout(self.p_dropout)(p_attn, deterministic=deterministic)
        output = jnp.einsum("bhts,bhsd->bhtd", p_attn, v)

        if self.window_size is not None:
            if banded:
                band = _abs_to_band(p_attn, self.window_size)
                output = output + jnp.einsum("bhtc,gcd->bhtd", band, emb_rel_v)
            else:
                rel_weights = _abs_to_rel(p_attn)
                value_rel = _window_embeddings(emb_rel_v, t_s, self.window_size)
                output = output + jnp.einsum(
                    "bhtm,gmd->bhtd", rel_weights, value_rel
                )

        output = output.transpose(0, 2, 1, 3).reshape(b, t_t, self.channels)
        return Dense(self.out_channels, name="conv_o")(output)


class FFN(nn.Module):
    """Conv feed-forward (kernel 3 in the encoder). Ref: attentions.py:398-464."""

    out_channels: int
    filter_channels: int
    kernel_size: int
    p_dropout: float = 0.0
    activation: str | None = None
    causal: bool = False

    def _pad(self, x):
        if self.kernel_size == 1:
            return x
        if self.causal:
            pad = (self.kernel_size - 1, 0)
        else:
            pad = ((self.kernel_size - 1) // 2, self.kernel_size // 2)
        return jnp.pad(x, ((0, 0), pad, (0, 0)))

    @nn.compact
    def __call__(self, x, x_mask, deterministic=True):
        from bert_vits2_tpu.nn.conv import Conv1d

        mask = x_mask[..., None]
        x = Conv1d(self.filter_channels, self.kernel_size, name="conv_1")(
            self._pad(x * mask)
        )
        if self.activation == "gelu":
            x = x * jax.nn.sigmoid(1.702 * x)
        else:
            x = jax.nn.relu(x)
        x = nn.Dropout(self.p_dropout)(x, deterministic=deterministic)
        x = Conv1d(self.out_channels, self.kernel_size, name="conv_2")(
            self._pad(x * mask)
        )
        return x * mask


class Encoder(nn.Module):
    """Pre-LN-free (post-norm) transformer encoder with rel-pos self-attention.

    Ref: attentions.py:37-120. `gin_channels > 0` enables speaker conditioning
    added to the stream before layer `cond_layer_idx` (2 by default, per vits2;
    flows pass cond_layer_idx = n_layers which disables it by construction in
    the reference — callers here pass cond_every_layer=False and idx as given).
    """

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    p_dropout: float = 0.0
    window_size: int = 4
    gin_channels: int = 0
    cond_layer_idx: int = 2

    @nn.compact
    def __call__(self, x, x_mask, g=None, deterministic=True):
        attn_mask = (x_mask[:, None, :, None] * x_mask[:, None, None, :])
        mask = x_mask[..., None]
        x = x * mask
        for i in range(self.n_layers):
            if i == self.cond_layer_idx and g is not None and self.gin_channels > 0:
                gproj = Dense(self.hidden_channels, name="spk_emb_linear")(g)
                x = (x + gproj[:, None, :]) * mask
            y = MultiHeadAttention(
                self.hidden_channels,
                self.hidden_channels,
                self.n_heads,
                p_dropout=self.p_dropout,
                window_size=self.window_size,
                name=f"attn_layers_{i}",
            )(x, x, attn_mask, deterministic=deterministic, x_mask_vec=x_mask)
            y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
            x = LayerNorm(self.hidden_channels, name=f"norm_layers_1_{i}")(x + y)

            y = FFN(
                self.hidden_channels,
                self.filter_channels,
                self.kernel_size,
                p_dropout=self.p_dropout,
                name=f"ffn_layers_{i}",
            )(x, x_mask, deterministic=deterministic)
            y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
            x = LayerNorm(self.hidden_channels, name=f"norm_layers_2_{i}")(x + y)
        return x * mask
