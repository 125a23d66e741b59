"""GST-style reference encoder, used when n_speakers == 0 (reference: models.py:752-808).

6 stride-2 Conv2d over the linear spectrogram + GRU; final GRU state projects
to the speaker embedding space.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from bert_vits2_tpu.nn.conv import Conv2d, Dense


class ReferenceEncoder(nn.Module):
    spec_channels: int
    gin_channels: int = 0

    @nn.compact
    def __call__(self, spec):
        """spec: [b, t, spec_channels] -> [b, gin_channels]."""
        filters = [32, 32, 64, 64, 128, 128]
        x = spec[..., None]  # [b, t, f, 1]
        for i, ch in enumerate(filters):
            x = Conv2d(
                ch, (3, 3), stride=(2, 2), padding=(1, 1), use_weight_norm=True,
                name=f"convs_{i}",
            )(x)
            x = jax.nn.relu(x)
        b, t, f, c = x.shape
        # torch flattens (channel, freq) channel-major (models.py:793-796)
        x = jnp.transpose(x, (0, 1, 3, 2)).reshape(b, t, c * f)
        carry, _ = nn.RNN(nn.GRUCell(128), return_carry=True, name="gru")(x)
        return Dense(self.gin_channels, name="proj")(carry)
