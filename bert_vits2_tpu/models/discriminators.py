"""GAN discriminators (reference: models.py:18-79, 567-749).

- MultiPeriodDiscriminator: 1 scale (DiscriminatorS) + 5 period discriminators
  (periods 2,3,5,7,11), each returning logits + per-layer feature maps.
- DurationDiscriminator (vits2): conv stack + biLSTM scoring (x, dur) pairs.
- WavLMDiscriminator: conv head over stacked SLM hidden states.

All weight-normed (use_spectral_norm=False in the shipped config). Waveforms
are [b, t] here; the period discriminators reshape to [b, t/p, p, 1]
channel-last images.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from bert_vits2_tpu.nn.conv import Conv1d, Conv2d, Dense
from bert_vits2_tpu.nn.norm import LayerNorm

LRELU_SLOPE = 0.1


class DiscriminatorP(nn.Module):
    period: int
    kernel_size: int = 5
    stride: int = 3
    channels: Sequence[int] = (32, 128, 512, 1024)
    final_channels: int = 1024

    @nn.compact
    def __call__(self, x):
        """x: [b, t] -> (logits [b, n], fmaps)."""
        b, t = x.shape
        p = self.period
        if t % p != 0:
            n_pad = p - (t % p)
            x = jnp.pad(x, ((0, 0), (0, n_pad)), mode="reflect")
            t = t + n_pad
        x = x.reshape(b, t // p, p, 1)

        fmap = []
        pad = (self.kernel_size - 1) // 2
        for i, ch in enumerate(self.channels):
            x = Conv2d(
                ch,
                (self.kernel_size, 1),
                stride=(self.stride, 1),
                padding=(pad, 0),
                use_weight_norm=True,
                name=f"convs_{i}",
            )(x)
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = Conv2d(
            self.final_channels,
            (self.kernel_size, 1),
            stride=(1, 1),
            padding=(pad, 0),
            use_weight_norm=True,
            name=f"convs_{len(self.channels)}",
        )(x)
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
        x = Conv2d(1, (3, 1), padding=(1, 0), use_weight_norm=True, name="conv_post")(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class DiscriminatorS(nn.Module):
    # (channels, kernel, stride, groups, padding) per layer; ref models.py:645-660
    specs: Sequence[Sequence[int]] = (
        (16, 15, 1, 1, 7),
        (64, 41, 4, 4, 20),
        (256, 41, 4, 16, 20),
        (1024, 41, 4, 64, 20),
        (1024, 41, 4, 256, 20),
        (1024, 5, 1, 1, 2),
    )

    @nn.compact
    def __call__(self, x):
        """x: [b, t] -> (logits, fmaps). Ref: models.py:645-672."""
        b = x.shape[0]
        x = x[..., None]  # [b, t, 1]
        fmap = []
        for i, (ch, k, s, g, pad) in enumerate(self.specs):
            x = Conv1d(
                ch, k, stride=s, groups=g, padding=pad, use_weight_norm=True,
                name=f"convs_{i}",
            )(x)
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = Conv1d(1, 3, padding=1, use_weight_norm=True, name="conv_post")(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    # test-size override: None -> reference widths
    p_channels: Sequence[int] | None = None
    s_specs: Sequence[Sequence[int]] | None = None

    @nn.compact
    def __call__(self, y, y_hat):
        """y, y_hat: [b, t] -> (real logits, fake logits, real fmaps, fake fmaps)."""
        s_kw = {} if self.s_specs is None else {"specs": tuple(self.s_specs)}
        p_kw = (
            {}
            if self.p_channels is None
            else {
                "channels": tuple(self.p_channels),
                "final_channels": self.p_channels[-1],
            }
        )
        discs = [DiscriminatorS(name="disc_s", **s_kw)] + [
            DiscriminatorP(p, name=f"disc_p{p}", **p_kw) for p in self.periods
        ]
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for d in discs:
            r_logit, r_fmap = d(y)
            g_logit, g_fmap = d(y_hat)
            y_d_rs.append(r_logit)
            y_d_gs.append(g_logit)
            fmap_rs.append(r_fmap)
            fmap_gs.append(g_fmap)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


class DurationDiscriminator(nn.Module):
    """Scores (encoder states, duration) pairs. Ref: models.py:18-79."""

    in_channels: int
    filter_channels: int
    kernel_size: int
    p_dropout: float
    gin_channels: int = 0

    def setup(self):
        fc = self.filter_channels
        self.conv_1 = Conv1d(fc, self.kernel_size, padding=self.kernel_size // 2,
                             name="conv_1")
        self.norm_1 = LayerNorm(fc, name="norm_1")
        self.conv_2 = Conv1d(fc, self.kernel_size, padding=self.kernel_size // 2,
                             name="conv_2")
        self.norm_2 = LayerNorm(fc, name="norm_2")
        self.dur_proj = Conv1d(fc, 1, name="dur_proj")
        self.lstm_fwd = nn.RNN(nn.OptimizedLSTMCell(fc), name="lstm_fwd")
        self.lstm_bwd = nn.RNN(nn.OptimizedLSTMCell(fc), reverse=True,
                               keep_order=True, name="lstm_bwd")
        self.output_layer = Dense(1, name="output_layer")
        self.drop = nn.Dropout(self.p_dropout)
        if self.gin_channels != 0:
            self.cond = Conv1d(self.in_channels, 1, name="cond")

    def _probability(self, x, dur):
        dur = self.dur_proj(dur)
        h = jnp.concatenate([x, dur], axis=-1)
        h = jnp.concatenate([self.lstm_fwd(h), self.lstm_bwd(h)], axis=-1)
        return jax.nn.sigmoid(self.output_layer(h))

    def __call__(self, x, x_mask, dur_r, dur_hat, g=None, deterministic=True):
        mask = x_mask[..., None]
        x = jax.lax.stop_gradient(x)
        if g is not None and self.gin_channels != 0:
            g = jax.lax.stop_gradient(g)
            x = x + self.cond(g[:, None, :])
        x = self.conv_1(x * mask)
        x = jax.nn.relu(x)
        x = self.norm_1(x)
        x = self.drop(x, deterministic=deterministic)
        x = self.conv_2(x * mask)
        x = jax.nn.relu(x)
        x = self.norm_2(x)
        x = self.drop(x, deterministic=deterministic)
        return [self._probability(x, d) for d in (dur_r, dur_hat)]


class WavLMDiscriminator(nn.Module):
    """Conv head over stacked SLM hidden states [b, t, slm_hidden*slm_layers].

    Ref: models.py:703-749.
    """

    slm_hidden: int = 768
    slm_layers: int = 13
    initial_channel: int = 64

    @nn.compact
    def __call__(self, x):
        ic = self.initial_channel
        x = Conv1d(ic, 1, use_weight_norm=True, name="pre")(x)
        for i, ch in enumerate([ic * 2, ic * 4, ic * 4]):
            x = Conv1d(ch, 5, padding=2, use_weight_norm=True, name=f"convs_{i}")(x)
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        x = Conv1d(1, 3, padding=1, use_weight_norm=True, name="conv_post")(x)
        return x.reshape(x.shape[0], -1)
