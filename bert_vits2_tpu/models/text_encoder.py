"""Prior text encoder (reference: models.py:333-400).

Sums six embeddings — phoneme, tone, language, and three 1024-d BERT
projections — scales by sqrt(hidden), runs the 6-layer relative-attention
transformer (speaker-conditioned at layer 2), and projects to the prior
(m_p, logs_p). Channel-last; BERT features enter as [b, t, 1024].
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

from bert_vits2_tpu.nn.attention import Encoder
from bert_vits2_tpu.nn.conv import Conv1d
from bert_vits2_tpu.ops.masking import sequence_mask


class TextEncoder(nn.Module):
    n_vocab: int
    out_channels: int
    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float
    num_tones: int = 12
    num_languages: int = 3
    bert_dim: int = 1024
    gin_channels: int = 0

    @nn.compact
    def __call__(
        self,
        x,
        x_lengths,
        tone,
        language,
        bert,
        ja_bert,
        en_bert,
        g=None,
        deterministic=True,
    ):
        h = self.hidden_channels
        emb_init = nn.initializers.normal(h**-0.5)
        emb = nn.Embed(self.n_vocab, h, embedding_init=emb_init, name="emb")(x)
        tone_e = nn.Embed(self.num_tones, h, embedding_init=emb_init, name="tone_emb")(tone)
        lang_e = nn.Embed(
            self.num_languages, h, embedding_init=emb_init, name="language_emb"
        )(language)
        bert_e = Conv1d(h, 1, name="bert_proj")(bert)
        ja_bert_e = Conv1d(h, 1, name="ja_bert_proj")(ja_bert)
        en_bert_e = Conv1d(h, 1, name="en_bert_proj")(en_bert)

        xe = (emb + tone_e + lang_e + bert_e + ja_bert_e + en_bert_e) * math.sqrt(h)
        x_mask = sequence_mask(x_lengths, xe.shape[1]).astype(xe.dtype)

        xe = Encoder(
            h,
            self.filter_channels,
            self.n_heads,
            self.n_layers,
            kernel_size=self.kernel_size,
            p_dropout=self.p_dropout,
            gin_channels=self.gin_channels,
            name="encoder",
        )(xe * x_mask[..., None], x_mask, g=g, deterministic=deterministic)

        stats = Conv1d(self.out_channels * 2, 1, name="proj")(xe) * x_mask[..., None]
        m, logs = stats[..., : self.out_channels], stats[..., self.out_channels :]
        return xe, m, logs, x_mask
