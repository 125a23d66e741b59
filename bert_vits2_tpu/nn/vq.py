"""Inference-mode vector quantization for old-version emotion conditioning.

The reference's V2.1/V2.2 text encoders embed an utterance-level emotion
vector through a `vector_quantize_pytorch.VectorQuantize` codebook
(oldVersion/V210/models.py:347-356: dim=1024, 10 codes, 1 head;
oldVersion/V220/models.py:380-402: dim=512 -> project_in 1024, 32 heads x
64 codes x 32 dims, separate codebook per head -> project_out 512).

Serving old checkpoints only needs the deterministic inference behavior:
nearest-code lookup (or direct index lookup), with the codebook and the
in/out projections read from the checkpoint. EMA/cluster buffers in the
torch state dict are training state and are dropped at import.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["VectorQuantizer"]


class VectorQuantizer(nn.Module):
    """L2 nearest-code quantizer matching vector_quantize_pytorch layouts.

    dim: model-facing feature size. heads * codebook_dim may differ from dim,
    in which case Dense project_in/project_out are used (as the torch lib
    does when `codebook_dim` is set).
    """

    dim: int
    codebook_size: int
    codebook_dim: int | None = None
    heads: int = 1

    @property
    def _cdim(self) -> int:
        return self.codebook_dim if self.codebook_dim is not None else self.dim

    @property
    def _inner(self) -> int:
        return self._cdim * self.heads

    def setup(self):
        # vector_quantize_pytorch `_codebook.embed`: [heads, size, codebook_dim]
        self.codebook = self.param(
            "codebook",
            nn.initializers.normal(1.0),
            (self.heads, self.codebook_size, self._cdim),
        )
        if self._inner != self.dim:
            self.project_in = nn.Dense(self._inner, name="project_in")
            self.project_out = nn.Dense(self.dim, name="project_out")

    def __call__(self, x):
        """Quantize x [..., dim] -> nearest-code reconstruction [..., dim]."""
        y = self.project_in(x) if self._inner != self.dim else x
        shape = y.shape
        y = y.reshape(shape[:-1] + (self.heads, self._cdim))
        # squared L2 to every code: [..., heads, size]
        d = (
            jnp.sum(y**2, -1, keepdims=True)
            - 2.0 * jnp.einsum("...hd,hnd->...hn", y, self.codebook)
            + jnp.sum(self.codebook**2, -1)
        )
        idx = jnp.argmin(d, axis=-1)  # [..., heads]
        q = self.codebook[jnp.arange(self.heads), idx]  # [..., heads, cdim]
        q = q.reshape(shape)
        return self.project_out(q) if self._inner != self.dim else q

    def lookup(self, idx):
        """Direct index lookup (V210 `get_output_from_indices`): idx [...]
        int -> [..., dim]. Only meaningful for heads == 1."""
        q = self.codebook[0][idx]  # [..., codebook_dim]
        return self.project_out(q) if self._inner != self.dim else q
