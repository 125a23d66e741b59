"""Posterior spectrogram encoder (reference: models.py:448-487).

1x1 conv over linear-spec channels -> 16-layer WN -> (m_q, logs_q); z sampled
by reparameterization with an explicit rng ('noise' collection).
"""

from __future__ import annotations

import flax.linen as nn
import jax

from bert_vits2_tpu.nn.conv import Conv1d
from bert_vits2_tpu.nn.wavenet import WN
from bert_vits2_tpu.ops.masking import sequence_mask


class PosteriorEncoder(nn.Module):
    in_channels: int
    out_channels: int
    hidden_channels: int
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 16
    gin_channels: int = 0

    @nn.compact
    def __call__(self, y, y_lengths, g=None, deterministic=True):
        y_mask = sequence_mask(y_lengths, y.shape[1]).astype(y.dtype)
        mask = y_mask[..., None]
        h = Conv1d(self.hidden_channels, 1, name="pre")(y) * mask
        h = WN(
            self.hidden_channels,
            self.kernel_size,
            self.dilation_rate,
            self.n_layers,
            gin_channels=self.gin_channels,
            name="enc",
        )(h, y_mask, g=g, deterministic=deterministic)
        stats = Conv1d(self.out_channels * 2, 1, name="proj")(h) * mask
        m = stats[..., : self.out_channels]
        logs = stats[..., self.out_channels :]
        eps = jax.random.normal(self.make_rng("noise"), m.shape, m.dtype)
        z = (m + eps * jax.numpy.exp(logs)) * mask
        return z, m, logs, y_mask
