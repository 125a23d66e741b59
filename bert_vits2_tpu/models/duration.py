"""Duration predictors (reference: models.py:148-299).

- DurationPredictor: deterministic conv stack -> log-duration.
- StochasticDurationPredictor: flow-based; training returns per-utterance NLL,
  reverse samples log-durations from noise. Inputs are stop-gradient'ed as in
  the reference (torch.detach at models.py:199, 283).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from bert_vits2_tpu.nn.conv import Conv1d
from bert_vits2_tpu.nn.ddsconv import DDSConv
from bert_vits2_tpu.nn.flows import ConvFlow, ElementwiseAffine, Log, flip
from bert_vits2_tpu.nn.norm import LayerNorm

_LOG_2PI = math.log(2 * math.pi)


class DurationPredictor(nn.Module):
    in_channels: int
    filter_channels: int
    kernel_size: int
    p_dropout: float
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, x_mask, g=None, deterministic=True):
        mask = x_mask[..., None]
        x = jax.lax.stop_gradient(x)
        if g is not None:
            g = jax.lax.stop_gradient(g)
            x = x + Conv1d(self.in_channels, 1, name="cond")(g[:, None, :])
        x = Conv1d(
            self.filter_channels, self.kernel_size, padding=self.kernel_size // 2,
            name="conv_1",
        )(x * mask)
        x = jax.nn.relu(x)
        x = LayerNorm(self.filter_channels, name="norm_1")(x)
        x = nn.Dropout(self.p_dropout)(x, deterministic=deterministic)
        x = Conv1d(
            self.filter_channels, self.kernel_size, padding=self.kernel_size // 2,
            name="conv_2",
        )(x * mask)
        x = jax.nn.relu(x)
        x = LayerNorm(self.filter_channels, name="norm_2")(x)
        x = nn.Dropout(self.p_dropout)(x, deterministic=deterministic)
        x = Conv1d(1, 1, name="proj")(x * mask)
        return x * mask  # [b, t, 1]


class StochasticDurationPredictor(nn.Module):
    in_channels: int
    filter_channels: int  # note: the reference overrides this to in_channels (models.py:161)
    kernel_size: int
    p_dropout: float
    n_flows: int = 4
    gin_channels: int = 0

    def setup(self):
        fc = self.in_channels  # reference quirk: filter_channels = in_channels
        self._fc = fc
        self.log_flow = Log()
        self.flow_ea = ElementwiseAffine(2)
        self.flows = [
            ConvFlow(2, fc, self.kernel_size, n_layers=3, name=f"flows_{i}")
            for i in range(self.n_flows)
        ]
        self.post_pre = Conv1d(fc, 1, name="post_pre")
        self.post_proj = Conv1d(fc, 1, name="post_proj")
        self.post_convs = DDSConv(fc, self.kernel_size, 3, p_dropout=self.p_dropout,
                                  name="post_convs")
        self.post_flow_ea = ElementwiseAffine(2)
        self.post_flows = [
            ConvFlow(2, fc, self.kernel_size, n_layers=3, name=f"post_flows_{i}")
            for i in range(4)
        ]
        self.pre = Conv1d(fc, 1, name="pre")
        self.proj = Conv1d(fc, 1, name="proj")
        self.convs = DDSConv(fc, self.kernel_size, 3, p_dropout=self.p_dropout,
                             name="convs")
        if self.gin_channels != 0:
            self.cond = Conv1d(fc, 1, name="cond")

    def _condition(self, x, x_mask, g, deterministic):
        x = jax.lax.stop_gradient(x)
        x = self.pre(x)
        if g is not None and self.gin_channels != 0:
            g = jax.lax.stop_gradient(g)
            x = x + self.cond(g[:, None, :])
        x = self.convs(x, x_mask, deterministic=deterministic)
        return self.proj(x) * x_mask[..., None]

    def __call__(self, x, x_mask, w=None, g=None, reverse=False, noise_scale=1.0,
                 deterministic=True, z_in=None):
        if reverse:
            return self.reverse(x, x_mask, g=g, noise_scale=noise_scale,
                                deterministic=deterministic, z_in=z_in)
        return self.nll(x, x_mask, w, g=g, deterministic=deterministic)

    def nll(self, x, x_mask, w, g=None, deterministic=True):
        """Training NLL [b]. Ref: models.py:206-240."""
        mask = x_mask[..., None]
        x = self._condition(x, x_mask, g, deterministic)

        h_w = self.post_pre(w)
        h_w = self.post_convs(h_w, x_mask, deterministic=deterministic)
        h_w = self.post_proj(h_w) * mask

        e_q = jax.random.normal(
            self.make_rng("noise"), (x.shape[0], x.shape[1], 2), x.dtype
        ) * mask
        z_q = e_q
        logdet_tot_q = 0.0
        z_q, ld = self.post_flow_ea(z_q, x_mask)
        logdet_tot_q += ld
        for f in self.post_flows:
            z_q, ld = f(z_q, x_mask, g=(x + h_w), deterministic=deterministic)
            logdet_tot_q += ld
            z_q = flip(z_q)
        z_u, z1 = z_q[..., :1], z_q[..., 1:]
        u = jax.nn.sigmoid(z_u) * mask
        z0 = (w - u) * mask
        logdet_tot_q += jnp.sum(
            (jax.nn.log_sigmoid(z_u) + jax.nn.log_sigmoid(-z_u)) * mask, axis=(1, 2)
        )
        logq = (
            jnp.sum(-0.5 * (_LOG_2PI + e_q**2) * mask, axis=(1, 2)) - logdet_tot_q
        )

        logdet_tot = 0.0
        z0, ld = self.log_flow(z0, x_mask)
        logdet_tot += ld
        z = jnp.concatenate([z0, z1], axis=-1)
        z, ld = self.flow_ea(z, x_mask)
        logdet_tot += ld
        for f in self.flows:
            z, ld = f(z, x_mask, g=x, deterministic=deterministic)
            logdet_tot += ld
            z = flip(z)
        nll = jnp.sum(0.5 * (_LOG_2PI + z**2) * mask, axis=(1, 2)) - logdet_tot
        return nll + logq

    def reverse(self, x, x_mask, g=None, noise_scale=1.0, deterministic=True,
                z_in=None):
        """Sample log-durations [b, t, 1]. Ref: models.py:241-256.

        The reversed chain drops the first ConvFlow ('useless vflow'):
        flip, CF3^-1, flip, CF2^-1, flip, CF1^-1, flip, EA^-1.

        z_in: optional pre-scaled noise [b, t, 2] supplied by the caller
        (the ONNX export convention, onnx_modules/V230/models_onnx.py:1003:
        `zin` is an explicit graph input so the exported stage is a pure
        function). When given, noise_scale is ignored.
        """
        mask = x_mask[..., None]
        x = self._condition(x, x_mask, g, deterministic)
        if z_in is not None:
            z = z_in.astype(x.dtype)
        else:
            z = jax.random.normal(
                self.make_rng("noise"), (x.shape[0], x.shape[1], 2), x.dtype
            ) * noise_scale
        for f in reversed(self.flows[1:]):
            z = flip(z)
            z = f(z, x_mask, g=x, reverse=True, deterministic=deterministic)
        z = flip(z)
        z = self.flow_ea(z, x_mask, reverse=True)
        logw = z[..., :1]
        return logw
