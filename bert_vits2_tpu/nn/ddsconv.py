"""Dilated depth-separable conv stack (reference: modules.py:84-130).

Used as the condition encoder inside the stochastic duration predictor and the
ConvFlow spline parameterizer.
"""

from __future__ import annotations

import flax.linen as nn
import jax

from bert_vits2_tpu.nn.conv import Conv1d
from bert_vits2_tpu.nn.norm import LayerNorm


class DDSConv(nn.Module):
    channels: int
    kernel_size: int
    n_layers: int
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, x_mask, g=None, deterministic=True):
        mask = x_mask[..., None]
        if g is not None:
            x = x + g
        for i in range(self.n_layers):
            dilation = self.kernel_size**i
            padding = (self.kernel_size * dilation - dilation) // 2
            y = Conv1d(
                self.channels,
                self.kernel_size,
                dilation=dilation,
                padding=padding,
                groups=self.channels,
                name=f"convs_sep_{i}",
            )(x * mask)
            y = LayerNorm(self.channels, name=f"norms_1_{i}")(y)
            y = jax.nn.gelu(y, approximate=False)
            y = Conv1d(self.channels, 1, name=f"convs_1x1_{i}")(y)
            y = LayerNorm(self.channels, name=f"norms_2_{i}")(y)
            y = jax.nn.gelu(y, approximate=False)
            y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
            x = x + y
        return x * mask
