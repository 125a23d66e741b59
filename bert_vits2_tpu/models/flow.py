"""Latent normalizing flows (reference: models.py:82-145, 403-445).

4 x (coupling + channel flip). TransformerCouplingBlock is the vits2 default
(use_transformer_flow=true); ResidualCouplingBlock is the vits1 WN variant.
"""

from __future__ import annotations

import flax.linen as nn

from bert_vits2_tpu.nn.flows import (
    ResidualCouplingLayer,
    TransformerCouplingLayer,
    flip,
)


class TransformerCouplingBlock(nn.Module):
    channels: int
    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float
    n_flows: int = 4
    gin_channels: int = 0

    def setup(self):
        self.flows = [
            TransformerCouplingLayer(
                self.channels,
                self.hidden_channels,
                self.kernel_size,
                self.n_layers,
                self.n_heads,
                self.p_dropout,
                self.filter_channels,
                mean_only=True,
                gin_channels=self.gin_channels,
                name=f"flows_{i}",
            )
            for i in range(self.n_flows)
        ]

    def __call__(self, x, x_mask, g=None, reverse=False, deterministic=True):
        if not reverse:
            for f in self.flows:
                x, _ = f(x, x_mask, g=g, deterministic=deterministic)
                x = flip(x)
        else:
            for f in reversed(self.flows):
                x = flip(x)
                x = f(x, x_mask, g=g, reverse=True, deterministic=deterministic)
        return x


class ResidualCouplingBlock(nn.Module):
    channels: int
    hidden_channels: int
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 4
    n_flows: int = 4
    gin_channels: int = 0

    def setup(self):
        self.flows = [
            ResidualCouplingLayer(
                self.channels,
                self.hidden_channels,
                self.kernel_size,
                self.dilation_rate,
                self.n_layers,
                gin_channels=self.gin_channels,
                mean_only=True,
                name=f"flows_{i}",
            )
            for i in range(self.n_flows)
        ]

    def __call__(self, x, x_mask, g=None, reverse=False, deterministic=True):
        if not reverse:
            for f in self.flows:
                x, _ = f(x, x_mask, g=g, deterministic=deterministic)
                x = flip(x)
        else:
            for f in reversed(self.flows):
                x = flip(x)
                x = f(x, x_mask, g=g, reverse=True, deterministic=deterministic)
        return x
