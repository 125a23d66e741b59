"""Prior text encoder (reference: models.py:333-400).

Sums six embeddings — phoneme, tone, language, and three 1024-d BERT
projections — scales by sqrt(hidden), runs the 6-layer relative-attention
transformer (speaker-conditioned at layer 2), and projects to the prior
(m_p, logs_p). Channel-last; BERT features enter as [b, t, 1024].

Version families (compat.versions): V1.0.x uses only `bert`
(oldVersion/V101/models.py:342), V1.1.x adds a 768-d `ja_bert`
(oldVersion/V110/models.py:343), V2.1 adds a 10-code VQ over a 1024-d
emotion vector (oldVersion/V210/models.py:347-356), V2.2 a 32-head VQ over
a 512-d CLAP feature behind a residual-MLP in/out net
(oldVersion/V220/models.py:380-402). All variants share this module, gated
by the config flags so imported old checkpoints get an identical graph.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

from bert_vits2_tpu.nn.attention import Encoder
from bert_vits2_tpu.nn.conv import Conv1d
from bert_vits2_tpu.nn.vq import VectorQuantizer
from bert_vits2_tpu.ops.masking import sequence_mask


class _ResidualMLPBlock(nn.Module):
    """V220's pre-VQ Block: x + c_proj(silu(c_fc1(ln x)) * c_fc2(ln x))
    (oldVersion/V220/models.py:322-343)."""

    hidden_dim: int

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(name="norm")(x)
        a = nn.Dense(self.hidden_dim, use_bias=False, name="mlp_c_fc1")(y)
        b = nn.Dense(self.hidden_dim, use_bias=False, name="mlp_c_fc2")(y)
        return x + nn.Dense(x.shape[-1], use_bias=False, name="mlp_c_proj")(
            nn.silu(a) * b
        )


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
    use_ja_bert: bool = True
    use_en_bert: bool = True
    ja_bert_dim: int = 1024
    emotion: str = "none"

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
        emo=None,
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
        xe = emb + tone_e + lang_e + Conv1d(h, 1, name="bert_proj")(bert)
        if self.use_ja_bert:
            xe = xe + Conv1d(h, 1, name="ja_bert_proj")(ja_bert)
        if self.use_en_bert:
            xe = xe + Conv1d(h, 1, name="en_bert_proj")(en_bert)

        if self.emotion == "vq210":
            # emo: [b, 1024] wav2vec2 vector -> proj+quantize, or [b] int
            # codebook index -> direct lookup (oldVersion/V210/models.py:369-393)
            vq = VectorQuantizer(1024, 10, name="emo_quantizer")
            if emo.ndim == 1:
                emo_e = vq.lookup(emo.astype(jnp.int32))
            else:
                emo_e = vq(nn.Dense(1024, name="emo_proj")(emo))
            xe = xe + nn.Dense(h, name="emo_q_proj")(emo_e)[:, None, :]
        elif self.emotion == "clap220":
            # emo: [b, 512] CLAP audio/text feature (oldVersion/V220/models.py:417-424)
            y = nn.Dense(1028, use_bias=False, name="in_feature_net_0")(emo)
            y = nn.LayerNorm(name="in_feature_net_2")(nn.gelu(y, approximate=False))
            y = _ResidualMLPBlock(512, name="in_feature_net_3")(y)
            y = nn.Dense(512, use_bias=False, name="in_feature_net_4")(y)
            y = VectorQuantizer(
                512, 64, codebook_dim=32, heads=32, name="emo_vq"
            )(y)
            xe = xe + nn.Dense(h, name="out_feature_net")(y)[:, None, :]

        xe = xe * math.sqrt(h)
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
