"""Top-level VITS2 synthesizer (reference: SynthesizerTrn, models.py:811-1074).

Training forward runs MAS fully on-device (no host round-trip, unlike
monotonic_align/__init__.py:10-16) inside a stop-gradient region, then the
duration losses, prior expansion and a random 32-frame decoder slice.

Inference is statically shaped: the caller fixes `max_frames` (length bucket);
predicted durations are masked into it and `y_lengths` is returned for
trimming. RNG collections: 'noise' (posterior sample, MAS noise, SDP noise,
prior sample at inference, random slice), 'dropout' (training only).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from bert_vits2_tpu.models.config import ModelConfig
from bert_vits2_tpu.models.duration import DurationPredictor, StochasticDurationPredictor
from bert_vits2_tpu.models.flow import ResidualCouplingBlock, TransformerCouplingBlock
from bert_vits2_tpu.models.generator import Generator
from bert_vits2_tpu.models.posterior import PosteriorEncoder
from bert_vits2_tpu.models.reference_encoder import ReferenceEncoder
from bert_vits2_tpu.models.text_encoder import TextEncoder
from bert_vits2_tpu.ops.align import maximum_path_auto, maximum_path_scan
from bert_vits2_tpu.ops.masking import generate_path, rand_slice_segments, sequence_mask


class Synthesizer(nn.Module):
    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        gin = c.gin_channels if c.use_spk_conditioned_encoder and c.gin_channels > 0 else 0
        self.enc_p = TextEncoder(
            c.n_vocab,
            c.inter_channels,
            c.hidden_channels,
            c.filter_channels,
            c.n_heads,
            c.n_layers,
            c.kernel_size,
            c.p_dropout,
            num_tones=c.num_tones,
            num_languages=c.num_languages,
            bert_dim=c.bert_dim,
            gin_channels=gin,
            use_ja_bert=c.use_ja_bert,
            use_en_bert=c.use_en_bert,
            ja_bert_dim=c.ja_bert_dim,
            emotion=c.emotion,
            name="enc_p",
        )
        self.dec = Generator(
            c.inter_channels,
            resblock=c.resblock,
            resblock_kernel_sizes=tuple(c.resblock_kernel_sizes),
            resblock_dilation_sizes=tuple(tuple(d) for d in c.resblock_dilation_sizes),
            upsample_rates=tuple(c.upsample_rates),
            upsample_initial_channel=c.upsample_initial_channel,
            upsample_kernel_sizes=tuple(c.upsample_kernel_sizes),
            gin_channels=c.gin_channels,
            name="dec",
        )
        self.enc_q = PosteriorEncoder(
            c.spec_channels,
            c.inter_channels,
            c.hidden_channels,
            kernel_size=5,
            dilation_rate=1,
            n_layers=16,
            gin_channels=c.gin_channels,
            name="enc_q",
        )
        if c.use_transformer_flow:
            self.flow = TransformerCouplingBlock(
                c.inter_channels,
                c.hidden_channels,
                c.filter_channels,
                c.n_heads,
                c.n_layers_trans_flow,
                5,
                c.p_dropout,
                n_flows=c.n_flow_layer,
                gin_channels=c.gin_channels,
                name="flow",
            )
        else:
            self.flow = ResidualCouplingBlock(
                c.inter_channels,
                c.hidden_channels,
                kernel_size=5,
                dilation_rate=1,
                n_layers=4,
                n_flows=c.n_flow_layer,
                gin_channels=c.gin_channels,
                name="flow",
            )
        self.sdp = StochasticDurationPredictor(
            c.hidden_channels, 192, 3, 0.5, 4, gin_channels=c.gin_channels, name="sdp"
        )
        self.dp = DurationPredictor(
            c.hidden_channels, 256, 3, 0.5, gin_channels=c.gin_channels, name="dp"
        )
        if c.n_speakers >= 1:
            self.emb_g = nn.Embed(c.n_speakers, c.gin_channels, name="emb_g")
        else:
            self.ref_enc = ReferenceEncoder(
                c.spec_channels, c.gin_channels, name="ref_enc"
            )

    def _speaker(self, sid, y):
        if self.cfg.n_speakers >= 1:
            return self.emb_g(sid)  # [b, gin]
        return self.ref_enc(y)

    def __call__(
        self,
        x,
        x_lengths,
        y,
        y_lengths,
        sid,
        tone,
        language,
        bert,
        ja_bert,
        en_bert,
        emo=None,
        mas_noise_scale=0.01,
        deterministic=False,
    ):
        """Training forward. y: linear spec [b, t_y, spec_ch]. Ref: models.py:937-1024.

        With cfg.train_compute_dtype == "bfloat16" the posterior WN stack,
        latent flow, and vocoder run in bf16 (params fp32, cast per-module);
        MAS inputs, duration predictors, and all returned statistics are
        fp32 so the alignment and losses match the fp32 path's numerics.
        """
        cdtype = jnp.dtype(self.cfg.train_compute_dtype)
        g = self._speaker(sid, y)
        x_h, m_p, logs_p, x_mask = self.enc_p(
            x, x_lengths, tone, language, bert, ja_bert, en_bert, emo=emo, g=g,
            deterministic=deterministic,
        )
        g_c = g.astype(cdtype)
        z, m_q, logs_q, y_mask = self.enc_q(
            y.astype(cdtype), y_lengths, g=g_c, deterministic=deterministic
        )
        z_p = self.flow(z, y_mask, g=g_c, deterministic=deterministic)
        z_p = z_p.astype(jnp.float32)
        y_mask = y_mask.astype(jnp.float32)

        # --- monotonic alignment search (no gradients; models.py:960-989) ---
        def neg_cent_fn(z_p, m_p, logs_p):
            s_p_sq_r = jnp.exp(-2.0 * logs_p)  # [b, t_x, d]
            nc1 = jnp.sum(-0.5 * math.log(2 * math.pi) - logs_p, axis=-1)  # [b, t_x]
            nc2 = jnp.einsum("byd,bxd->byx", -0.5 * z_p**2, s_p_sq_r)
            nc3 = jnp.einsum("byd,bxd->byx", z_p, m_p * s_p_sq_r)
            nc4 = jnp.sum(-0.5 * m_p**2 * s_p_sq_r, axis=-1)  # [b, t_x]
            return nc1[:, None, :] + nc2 + nc3 + nc4[:, None, :]

        neg_cent = jax.lax.stop_gradient(
            neg_cent_fn(
                jax.lax.stop_gradient(z_p),
                jax.lax.stop_gradient(m_p),
                jax.lax.stop_gradient(logs_p),
            )
        )
        if self.cfg.use_noise_scaled_mas:
            eps = (
                jnp.std(neg_cent)
                * jax.random.normal(self.make_rng("noise"), neg_cent.shape)
                * mas_noise_scale
            )
            neg_cent = neg_cent + eps

        # flax init runs eagerly; use the scan formulation there so module
        # init never pays a per-op Mosaic kernel compile (shapes only).
        mas = maximum_path_scan if self.is_initializing() else maximum_path_auto
        attn = jax.lax.stop_gradient(
            mas(neg_cent, y_lengths.astype(jnp.int32), x_lengths.astype(jnp.int32))
        )  # [b, t_y, t_x]

        w = jnp.sum(attn, axis=1, keepdims=False)[..., None]  # [b, t_x, 1]

        # --- duration losses (models.py:993-1004) ---
        l_length_sdp = self.sdp(
            x_h, x_mask, w=w, g=g, deterministic=deterministic
        ) / jnp.sum(x_mask)
        logw_ = jnp.log(w + 1e-6) * x_mask[..., None]
        logw = self.dp(x_h, x_mask, g=g, deterministic=deterministic)
        logw_sdp = self.sdp(
            x_h, x_mask, g=g, reverse=True, noise_scale=1.0, deterministic=deterministic
        )
        denom = jnp.sum(x_mask)
        l_length_dp = jnp.sum((logw - logw_) ** 2, axis=(1, 2)) / denom
        l_length_sdp = l_length_sdp + jnp.sum((logw_sdp - logw_) ** 2, axis=(1, 2)) / denom
        l_length = l_length_dp + l_length_sdp

        # --- expand prior (models.py:1007-1008) ---
        m_p_y = jnp.einsum("byx,bxd->byd", attn, m_p)
        logs_p_y = jnp.einsum("byx,bxd->byd", attn, logs_p)

        z_slice, ids_slice = rand_slice_segments(
            z, y_lengths, self.cfg.segment_size, self.make_rng("noise")
        )
        o = self.dec(z_slice, g=g)  # [b, segment_samples]
        return {
            "wave_slice": o,
            "l_length": l_length,
            "attn": attn,
            "ids_slice": ids_slice,
            "x_mask": x_mask,
            "y_mask": y_mask,
            "z": z,
            "z_p": z_p,
            "m_p": m_p_y,
            "logs_p": logs_p_y,
            "m_q": m_q.astype(jnp.float32),
            "logs_q": logs_q.astype(jnp.float32),
            "x_hidden": x_h,
            "logw": logw,
            "logw_": logw_,
            "logw_sdp": logw_sdp,
            "g": g,
        }

    def predict_durations(
        self,
        x,
        x_lengths,
        sid,
        tone,
        language,
        bert,
        ja_bert,
        en_bert,
        emo=None,
        length_scale=1.0,
        noise_scale_w=0.8,
        sdp_ratio=0.0,
        y=None,
        deterministic=True,
    ):
        """Predicted output frame counts [b] WITHOUT synthesizing.

        Exact literal prefix of `infer` up to y_lengths (same module-call
        order, so the flax "noise" rng stream matches): given the same rng
        and knobs, `infer`'s y_lengths equals min(this, max_frames). The
        serving layer uses it to pick per-batch frame caps from the ACTUAL
        predicted lengths instead of a worst-case tokens*frames_per_token
        bound — the cost is one cheap extra pass over enc_p+sdp+dp (<2% of
        synthesis FLOPs; the vocoder dominates)."""

        def knob(v, rank):
            v = jnp.asarray(v, jnp.float32)
            return v.reshape(v.shape + (1,) * (rank - v.ndim))

        g = self._speaker(sid, y)
        x_h, m_p, logs_p, x_mask = self.enc_p(
            x, x_lengths, tone, language, bert, ja_bert, en_bert, emo=emo, g=g,
            deterministic=deterministic,
        )
        logw_sdp = self.sdp(
            x_h, x_mask, g=g, reverse=True, noise_scale=knob(noise_scale_w, 3),
            deterministic=deterministic,
        )
        logw_dp = self.dp(x_h, x_mask, g=g, deterministic=deterministic)
        sdp_ratio = knob(sdp_ratio, 3)
        logw = logw_sdp * sdp_ratio + logw_dp * (1.0 - sdp_ratio)
        w = jnp.exp(logw[..., 0]) * x_mask * knob(length_scale, 2)
        y_lengths = jnp.clip(jnp.sum(jnp.ceil(w), axis=-1), min=1.0)
        return y_lengths.astype(jnp.int32)

    def infer(
        self,
        x,
        x_lengths,
        sid,
        tone,
        language,
        bert,
        ja_bert,
        en_bert,
        max_frames: int,
        emo=None,
        noise_scale=0.667,
        length_scale=1.0,
        noise_scale_w=0.8,
        sdp_ratio=0.0,
        y=None,
        deterministic=True,
        mrf_packed=None,
    ):
        """Statically-shaped synthesis. Ref: models.py:1026-1074.

        mrf_packed: optional per-stage packed decoder MRF weights
        (ops.mrf_pallas.pack_generator_mrf) enabling the fused Pallas MRF
        kernel in the vocoder tail — inference-only fast path, numerically
        equivalent (same parameters, resolved weight norm).

        Returns (wave [b, max_frames*hop], attn, y_mask, y_lengths).

        The four knobs (noise_scale, length_scale, noise_scale_w, sdp_ratio)
        accept either scalars or per-item [b] arrays, so heterogeneous
        requests can share one batched device call (the serving micro-batch
        path).
        """

        def knob(v, rank):  # () or [b] -> broadcastable vs a rank-`rank` array
            v = jnp.asarray(v, jnp.float32)
            return v.reshape(v.shape + (1,) * (rank - v.ndim))

        g = self._speaker(sid, y)
        x_h, m_p, logs_p, x_mask = self.enc_p(
            x, x_lengths, tone, language, bert, ja_bert, en_bert, emo=emo, g=g,
            deterministic=deterministic,
        )
        logw_sdp = self.sdp(
            x_h, x_mask, g=g, reverse=True, noise_scale=knob(noise_scale_w, 3),
            deterministic=deterministic,
        )
        logw_dp = self.dp(x_h, x_mask, g=g, deterministic=deterministic)
        sdp_ratio = knob(sdp_ratio, 3)
        logw = logw_sdp * sdp_ratio + logw_dp * (1.0 - sdp_ratio)
        w = jnp.exp(logw[..., 0]) * x_mask * knob(length_scale, 2)  # [b, t_x]
        w_ceil = jnp.ceil(w)
        y_lengths = jnp.clip(jnp.sum(w_ceil, axis=-1), min=1.0)
        y_lengths = jnp.minimum(y_lengths, max_frames).astype(jnp.int32)
        y_mask = sequence_mask(y_lengths, max_frames).astype(x_mask.dtype)

        attn = generate_path(w_ceil, x_mask, y_mask)  # [b, t_y, t_x]
        m_p_y = jnp.einsum("byx,bxd->byd", attn, m_p)
        logs_p_y = jnp.einsum("byx,bxd->byd", attn, logs_p)
        eps = jax.random.normal(self.make_rng("noise"), m_p_y.shape, m_p_y.dtype)
        z_p = m_p_y + eps * jnp.exp(logs_p_y) * knob(noise_scale, 3)
        dtype = jnp.dtype(self.cfg.infer_compute_dtype)
        if dtype != z_p.dtype:
            z_p, y_mask_c, g_c = z_p.astype(dtype), y_mask.astype(dtype), g.astype(dtype)
        else:
            y_mask_c, g_c = y_mask, g
        z = self.flow(z_p, y_mask_c, g=g_c, reverse=True, deterministic=deterministic)
        o = self.dec(z * y_mask_c[..., None], g=g_c, y_mask=y_mask_c,
                     mrf_packed=mrf_packed)
        return o.astype(jnp.float32), attn, y_mask, y_lengths
