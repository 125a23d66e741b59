"""Normalizing-flow building blocks (reference: modules.py:363-580).

Channel-last [b, t, c]. Every flow takes (x, x_mask, ...) and returns
(y, logdet[b]) forward, or y in reverse. Flip reverses the channel axis (the
reference flips dim 1 = channels, modules.py:374-381).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from bert_vits2_tpu.nn.attention import Encoder
from bert_vits2_tpu.nn.conv import Conv1d
from bert_vits2_tpu.nn.ddsconv import DDSConv
from bert_vits2_tpu.nn.wavenet import WN
from bert_vits2_tpu.ops.spline import piecewise_rational_quadratic_transform


class Log(nn.Module):
    """y = log(clamp(x, 1e-5)); logdet = sum(-y). Ref: modules.py:363-371."""

    @nn.compact
    def __call__(self, x, x_mask, reverse=False):
        mask = x_mask[..., None]
        if not reverse:
            y = jnp.log(jnp.clip(x, min=1e-5)) * mask
            logdet = jnp.sum(-y, axis=(1, 2))
            return y, logdet
        return jnp.exp(x) * mask


def flip(x):
    return jnp.flip(x, axis=-1)


class ElementwiseAffine(nn.Module):
    """Per-channel affine. Ref: modules.py:384-399."""

    channels: int

    @nn.compact
    def __call__(self, x, x_mask, reverse=False):
        m = self.param("m", nn.initializers.zeros, (self.channels,))
        logs = self.param("logs", nn.initializers.zeros, (self.channels,))
        mask = x_mask[..., None]
        if not reverse:
            y = (m + jnp.exp(logs) * x) * mask
            logdet = jnp.sum(logs * mask, axis=(1, 2))
            return y, logdet
        return (x - m) * jnp.exp(-logs) * mask


class ResidualCouplingLayer(nn.Module):
    """WN-parameterized affine coupling (vits1 flow). Ref: modules.py:402-456."""

    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    p_dropout: float = 0.0
    gin_channels: int = 0
    mean_only: bool = False

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse=False, deterministic=True):
        half = self.channels // 2
        mask = x_mask[..., None]
        x0, x1 = x[..., :half], x[..., half:]
        h = Conv1d(self.hidden_channels, 1, name="pre")(x0) * mask
        h = WN(
            self.hidden_channels,
            self.kernel_size,
            self.dilation_rate,
            self.n_layers,
            gin_channels=self.gin_channels,
            p_dropout=self.p_dropout,
            name="enc",
        )(h, x_mask, g=g, deterministic=deterministic)
        stats = Conv1d(
            half * (2 - self.mean_only),
            1,
            kernel_init=nn.initializers.zeros,
            name="post",
        )(h) * mask
        if not self.mean_only:
            m, logs = stats[..., :half], stats[..., half:]
        else:
            m, logs = stats, jnp.zeros_like(stats)

        if not reverse:
            x1 = m + x1 * jnp.exp(logs) * mask
            logdet = jnp.sum(logs, axis=(1, 2))
            return jnp.concatenate([x0, x1], -1), logdet
        x1 = (x1 - m) * jnp.exp(-logs) * mask
        return jnp.concatenate([x0, x1], -1)


class TransformerCouplingLayer(nn.Module):
    """Transformer-parameterized mean-only coupling (vits2). Ref: modules.py:519-580."""

    channels: int
    hidden_channels: int
    kernel_size: int
    n_layers: int
    n_heads: int
    p_dropout: float = 0.0
    filter_channels: int = 0
    mean_only: bool = False
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse=False, deterministic=True):
        half = self.channels // 2
        mask = x_mask[..., None]
        x0, x1 = x[..., :half], x[..., half:]
        h = Conv1d(self.hidden_channels, 1, name="pre")(x0) * mask
        h = Encoder(
            self.hidden_channels,
            self.filter_channels,
            self.n_heads,
            self.n_layers,
            kernel_size=self.kernel_size,
            p_dropout=self.p_dropout,
            gin_channels=self.gin_channels,
            name="enc",
        )(h, x_mask, g=g, deterministic=deterministic)
        stats = Conv1d(
            half * (2 - self.mean_only),
            1,
            kernel_init=nn.initializers.zeros,
            name="post",
        )(h) * mask
        if not self.mean_only:
            m, logs = stats[..., :half], stats[..., half:]
        else:
            m, logs = stats, jnp.zeros_like(stats)

        if not reverse:
            x1 = m + x1 * jnp.exp(logs) * mask
            logdet = jnp.sum(logs, axis=(1, 2))
            return jnp.concatenate([x0, x1], -1), logdet
        x1 = (x1 - m) * jnp.exp(-logs) * mask
        return jnp.concatenate([x0, x1], -1)


class ConvFlow(nn.Module):
    """Rational-quadratic-spline coupling over 2-channel streams. Ref: modules.py:459-516."""

    in_channels: int
    filter_channels: int
    kernel_size: int
    n_layers: int
    num_bins: int = 10
    tail_bound: float = 5.0

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse=False, deterministic=True):
        half = self.in_channels // 2
        mask = x_mask[..., None]
        x0, x1 = x[..., :half], x[..., half:]
        h = Conv1d(self.filter_channels, 1, name="pre")(x0)
        h = DDSConv(
            self.filter_channels, self.kernel_size, self.n_layers, name="convs"
        )(h, x_mask, g=g, deterministic=deterministic)
        h = Conv1d(
            half * (self.num_bins * 3 - 1),
            1,
            kernel_init=nn.initializers.zeros,
            name="proj",
        )(h) * mask

        b, t, _ = x0.shape
        h = h.reshape(b, t, half, self.num_bins * 3 - 1)
        denom = math.sqrt(self.filter_channels)
        uw = h[..., : self.num_bins] / denom
        uh = h[..., self.num_bins : 2 * self.num_bins] / denom
        ud = h[..., 2 * self.num_bins :]

        x1, logabsdet = piecewise_rational_quadratic_transform(
            x1, uw, uh, ud, inverse=reverse, tails="linear", tail_bound=self.tail_bound
        )
        x = jnp.concatenate([x0, x1], -1) * mask
        logdet = jnp.sum(logabsdet * mask, axis=(1, 2))
        if not reverse:
            return x, logdet
        return x
