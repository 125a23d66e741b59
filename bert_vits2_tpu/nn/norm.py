"""LayerNorm over the channel axis (reference: modules.py:17-29).

The reference transposes [b, c, t] -> normalizes -> transposes back; with the
channel-last layout this is just a normalization over the trailing axis.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class LayerNorm(nn.Module):
    channels: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones, (self.channels,))
        beta = self.param("beta", nn.initializers.zeros, (self.channels,))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * gamma + beta).astype(x.dtype)
