"""Relative-position transformer encoder (reference: attentions.py:37-464).

Channel-last [b, t, h]. The +-window relative-position bias uses the standard
skew trick (pad + reshape; ref attentions.py:360-395) which XLA compiles to
pure data movement. Speaker conditioning is injected before layer
`cond_layer_idx` (vits2; ref attentions.py:103-110). heads_share=True as in the
reference (one relative embedding table shared across heads).
"""

from __future__ import annotations

import math

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
    def __call__(self, x, c, attn_mask=None, deterministic=True):
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
        scores = jnp.einsum("bhtd,bhsd->bhts", q * scale, k)

        if self.window_size is not None:
            assert t_s == t_t, "relative attention requires self-attention"
            n_heads_rel = 1 if self.heads_share else h
            rel_stddev = k_channels**-0.5
            emb_rel_k = self.param(
                "emb_rel_k",
                nn.initializers.normal(rel_stddev),
                (n_heads_rel, 2 * self.window_size + 1, k_channels),
            )
            emb_rel_v = self.param(
                "emb_rel_v",
                nn.initializers.normal(rel_stddev),
                (n_heads_rel, 2 * self.window_size + 1, k_channels),
            )
            key_rel = _window_embeddings(emb_rel_k, t_s, self.window_size)
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
            rel_weights = _abs_to_rel(p_attn)
            value_rel = _window_embeddings(emb_rel_v, t_s, self.window_size)
            output = output + jnp.einsum("bhtm,gmd->bhtd", rel_weights, value_rel)

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
            )(x, x, attn_mask, deterministic=deterministic)
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
