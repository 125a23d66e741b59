"""Non-causal WaveNet stack with gated tanh/sigmoid units (reference: modules.py:133-218).

Channel-last. All convs weight-normed, as in the reference. The per-layer
speaker conditioning comes from one 1x1 conv over g producing 2*hidden*n_layers
channels, sliced per layer (modules.py:157-161, 190-196). The gate itself
(tanh(a) * sigmoid(b) on split halves) is left to XLA fusion — the reference
needed a torch.jit.script kernel for this (commons.py:98-105); XLA fuses it
into the surrounding convs automatically.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from bert_vits2_tpu.nn.conv import Conv1d


def gated_unit(x_in: jax.Array, g_l: jax.Array, channels: int) -> jax.Array:
    a = x_in + g_l
    return jnp.tanh(a[..., :channels]) * jax.nn.sigmoid(a[..., channels:])


class WN(nn.Module):
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, x_mask, g=None, deterministic=True):
        assert self.kernel_size % 2 == 1
        mask = x_mask[..., None]
        output = jnp.zeros_like(x)

        if g is not None and self.gin_channels > 0:
            # g: [b, gin] -> [b, 1, 2*h*n_layers]
            g_all = Conv1d(
                2 * self.hidden_channels * self.n_layers,
                1,
                use_weight_norm=True,
                name="cond_layer",
            )(g[:, None, :] if g.ndim == 2 else g)
        else:
            g_all = None

        for i in range(self.n_layers):
            dilation = self.dilation_rate**i
            padding = (self.kernel_size * dilation - dilation) // 2
            x_in = Conv1d(
                2 * self.hidden_channels,
                self.kernel_size,
                dilation=dilation,
                padding=padding,
                use_weight_norm=True,
                name=f"in_layers_{i}",
            )(x)
            if g_all is not None:
                off = i * 2 * self.hidden_channels
                g_l = g_all[..., off : off + 2 * self.hidden_channels]
            else:
                g_l = jnp.zeros_like(x_in)
            acts = gated_unit(x_in, g_l, self.hidden_channels)
            acts = nn.Dropout(self.p_dropout)(acts, deterministic=deterministic)

            res_skip_ch = (
                2 * self.hidden_channels if i < self.n_layers - 1 else self.hidden_channels
            )
            res_skip = Conv1d(
                res_skip_ch, 1, use_weight_norm=True, name=f"res_skip_layers_{i}"
            )(acts)
            if i < self.n_layers - 1:
                x = (x + res_skip[..., : self.hidden_channels]) * mask
                output = output + res_skip[..., self.hidden_channels :]
            else:
                output = output + res_skip
        return output * mask
