"""TPU-native WavLM encoder + resampler for the SLM (speech language model)
adversarial losses (reference: losses.py:63-153 WavLMLoss runs a frozen torch
`microsoft/wavlm-base-plus` + torchaudio.Resample on GPU).

WavLMJax mirrors transformers' modeling_wavlm.py WavLMModel (group-norm conv
feature encoder, weight-normed positional conv, post-LN transformer with
T5-style bucketed relative position bias computed once and GATED per layer
from the layer's own hidden states, modeling_wavlm.py:147-272). Returns the
13 hidden states the reference stacks for the discriminator and feature loss.

`make_resampler` is torchaudio's sinc_interp_hann kernel (width-6 lowpass,
rolloff 0.99) expressed as one strided conv — 44.1 kHz -> 16 kHz on-device.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class WavLMConfig:
    """microsoft/wavlm-base-plus geometry."""

    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Sequence[int] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Sequence[int] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Sequence[int] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    feat_extract_norm: str = "group"
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    num_buckets: int = 320
    max_bucket_distance: int = 800
    layer_norm_eps: float = 1e-5

    @classmethod
    def from_hf(cls, hf) -> "WavLMConfig":
        g = (lambda k, d=None: getattr(hf, k, d)) if not isinstance(hf, dict) else (
            lambda k, d=None: hf.get(k, d)
        )
        return cls(
            hidden_size=g("hidden_size", 768),
            num_layers=g("num_hidden_layers", 12),
            num_heads=g("num_attention_heads", 12),
            intermediate_size=g("intermediate_size", 3072),
            conv_dim=tuple(g("conv_dim")),
            conv_kernel=tuple(g("conv_kernel")),
            conv_stride=tuple(g("conv_stride")),
            conv_bias=bool(g("conv_bias", False)),
            feat_extract_norm=g("feat_extract_norm", "group"),
            num_conv_pos_embeddings=g("num_conv_pos_embeddings", 128),
            num_conv_pos_embedding_groups=g("num_conv_pos_embedding_groups", 16),
            num_buckets=g("num_buckets", 320),
            max_bucket_distance=g("max_bucket_distance", 800),
            layer_norm_eps=g("layer_norm_eps", 1e-5),
        )


def _rel_pos_bucket(rel: jnp.ndarray, num_buckets: int, max_distance: int):
    """T5-style log bucket (modeling_wavlm.py:253-271)."""
    nb = num_buckets // 2
    buckets = (rel > 0).astype(jnp.int32) * nb
    rel = jnp.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = (
        max_exact
        + (
            jnp.log(rel.astype(jnp.float32) / max_exact)
            / math.log(max_distance / max_exact)
            * (nb - max_exact)
        ).astype(jnp.int32)
    )
    large = jnp.minimum(large, nb - 1)
    return buckets + jnp.where(is_small, rel, large)


class WavLMAttention(nn.Module):
    cfg: WavLMConfig
    has_relative_position_bias: bool

    @nn.compact
    def __call__(self, x, position_bias):
        cfg = self.cfg
        h, nh = cfg.hidden_size, cfg.num_heads
        hd = h // nh
        b, t, _ = x.shape

        if position_bias is None:
            rel = jnp.arange(t)[None, :] - jnp.arange(t)[:, None]  # k - q
            bucket = _rel_pos_bucket(rel, cfg.num_buckets, cfg.max_bucket_distance)
            emb = nn.Embed(cfg.num_buckets, nh, name="rel_attn_embed")(bucket)
            position_bias = jnp.moveaxis(emb, -1, 0)  # [nh, t, t]

        # per-layer gate from this layer's hidden states (wavlm "gru" gating)
        gated = jnp.moveaxis(x.reshape(b, t, nh, hd), 2, 1)  # [b, nh, t, hd]
        proj = nn.Dense(8, name="gru_rel_pos_linear")(gated)
        proj = proj.reshape(b, nh, t, 2, 4).sum(-1)
        gate_a, gate_b = jnp.split(jax.nn.sigmoid(proj), 2, axis=-1)
        const = self.param(
            "gru_rel_pos_const", nn.initializers.ones, (1, nh, 1, 1)
        )
        gate = gate_a * (gate_b * const - 1.0) + 2.0  # [b, nh, t, 1]
        gated_bias = gate * position_bias[None]  # [b, nh, t, t]

        q = nn.Dense(h, name="q_proj")(x)
        k = nn.Dense(h, name="k_proj")(x)
        v = nn.Dense(h, name="v_proj")(x)

        def heads(y):
            return jnp.moveaxis(y.reshape(b, t, nh, hd), 2, 1)

        scores = (
            jnp.einsum("bhqd,bhkd->bhqk", heads(q), heads(k)) / math.sqrt(hd)
            + gated_bias
        )
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, heads(v))
        ctx = jnp.moveaxis(ctx, 1, 2).reshape(b, t, h)
        return nn.Dense(h, name="out_proj")(ctx), position_bias


class _EncoderLayer(nn.Module):
    """One post-LN WavLM encoder layer (layers 1..N-1; no bias embed).

    Scan-compatible: (carry=x, broadcast position_bias) -> (x, x)."""

    cfg: WavLMConfig

    @nn.compact
    def __call__(self, x, position_bias):
        cfg = self.cfg
        attn, _ = WavLMAttention(
            cfg, has_relative_position_bias=False, name="attention"
        )(x, position_bias)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="norm")(x + attn)
        ff = nn.Dense(cfg.intermediate_size, name="intermediate")(x)
        ff = jax.nn.gelu(ff, approximate=False)
        ff = nn.Dense(cfg.hidden_size, name="output")(ff)
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, name="final_norm"
        )(x + ff)
        return x, x


class WavLMJax(nn.Module):
    """Frozen WavLM feature model. wave [b, t]@16k -> list of 13 hidden
    states [b, t', 768] (HF layout: index 0 = pre-layer-0 states)."""

    cfg: WavLMConfig

    @nn.compact
    def __call__(self, wave):
        cfg = self.cfg
        x = wave[..., None]  # [b, t, 1]
        # conv feature encoder (modeling_wavlm.py:682-790)
        for i, (ch, ker, st) in enumerate(
            zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)
        ):
            x = nn.Conv(
                ch, (ker,), strides=(st,), padding="VALID",
                use_bias=cfg.conv_bias, name=f"conv_{i}",
            )(x)
            if i == 0 and cfg.feat_extract_norm == "group":
                x = nn.GroupNorm(
                    num_groups=ch, epsilon=cfg.layer_norm_eps, name="conv_norm_0"
                )(x)
            elif cfg.feat_extract_norm == "layer":
                x = nn.LayerNorm(
                    epsilon=cfg.layer_norm_eps, name=f"conv_norm_{i}"
                )(x)
            x = jax.nn.gelu(x, approximate=False)

        # feature projection
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="proj_norm")(x)
        x = nn.Dense(cfg.hidden_size, name="projection")(x)

        # weight-normed grouped positional conv (modeling_wavlm.py:48-91)
        k = cfg.num_conv_pos_embeddings
        pos = nn.Conv(
            cfg.hidden_size,
            (k,),
            padding=k // 2,
            feature_group_count=cfg.num_conv_pos_embedding_groups,
            name="pos_conv",
        )(x)
        if k % 2 == 0:
            pos = pos[:, :-1]
        x = x + jax.nn.gelu(pos, approximate=False)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="encoder_norm")(x)

        # layer 0 owns the relative-position bias embed; layers 1..N-1 share
        # one structure and run under lax.scan with stacked params — this
        # shrinks the (fwd+bwd) HLO by ~(num_layers-1)x, which matters
        # because the whole frozen WavLM rides inside the fused train step
        hidden_states = [x]
        attn, position_bias = WavLMAttention(
            cfg, has_relative_position_bias=True, name="layer_0_attention"
        )(x, None)
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, name="layer_0_norm"
        )(x + attn)
        ff = nn.Dense(cfg.intermediate_size, name="layer_0_intermediate")(x)
        ff = jax.nn.gelu(ff, approximate=False)
        ff = nn.Dense(cfg.hidden_size, name="layer_0_output")(ff)
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, name="layer_0_final_norm"
        )(x + ff)
        hidden_states.append(x)

        if cfg.num_layers > 1:
            ScanLayers = nn.scan(
                _EncoderLayer,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=nn.broadcast,
                length=cfg.num_layers - 1,
            )
            x, ys = ScanLayers(cfg, name="layers")(x, position_bias)
            hidden_states.extend(ys[i] for i in range(cfg.num_layers - 1))
        return hidden_states


# ---------------------------------------------------------------------------
# torch -> flax import
# ---------------------------------------------------------------------------


def _np(v):
    return np.asarray(
        v.detach().cpu().numpy() if hasattr(v, "detach") else v, np.float32
    )


def import_torch_wavlm(state_dict: dict, cfg: WavLMConfig) -> dict:
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("wavlm."):
            k = k[len("wavlm."):]
        sd[k] = _np(v)

    p: dict = {}
    for i in range(len(cfg.conv_dim)):
        w = sd[f"feature_extractor.conv_layers.{i}.conv.weight"]
        conv = {"kernel": w.transpose(2, 1, 0)}
        if cfg.conv_bias:
            conv["bias"] = sd[f"feature_extractor.conv_layers.{i}.conv.bias"]
        p[f"conv_{i}"] = conv
        ln_key = f"feature_extractor.conv_layers.{i}.layer_norm.weight"
        if ln_key in sd:
            name = "conv_norm_0" if cfg.feat_extract_norm == "group" else f"conv_norm_{i}"
            p[name] = {
                "scale": sd[ln_key],
                "bias": sd[f"feature_extractor.conv_layers.{i}.layer_norm.bias"],
            }
    p["proj_norm"] = {
        "scale": sd["feature_projection.layer_norm.weight"],
        "bias": sd["feature_projection.layer_norm.bias"],
    }
    p["projection"] = {
        "kernel": sd["feature_projection.projection.weight"].T,
        "bias": sd["feature_projection.projection.bias"],
    }
    # weight-normed pos conv: w = g * v / ||v||_(dims 0,1), torch dim=2
    pre = "encoder.pos_conv_embed.conv."
    if pre + "parametrizations.weight.original0" in sd:
        g = sd[pre + "parametrizations.weight.original0"]
        v = sd[pre + "parametrizations.weight.original1"]
    else:
        g = sd[pre + "weight_g"]
        v = sd[pre + "weight_v"]
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
    w = g * v / norm  # [out, in/groups, k]
    p["pos_conv"] = {
        "kernel": w.transpose(2, 1, 0),
        "bias": sd[pre + "bias"],
    }
    p["encoder_norm"] = {
        "scale": sd["encoder.layer_norm.weight"],
        "bias": sd["encoder.layer_norm.bias"],
    }
    def layer_params(i: int) -> dict:
        L = f"encoder.layers.{i}."
        att = {
            name: {
                "kernel": sd[L + f"attention.{name}.weight"].T,
                "bias": sd[L + f"attention.{name}.bias"],
            }
            for name in ("q_proj", "k_proj", "v_proj", "out_proj")
        }
        att["gru_rel_pos_linear"] = {
            "kernel": sd[L + "attention.gru_rel_pos_linear.weight"].T,
            "bias": sd[L + "attention.gru_rel_pos_linear.bias"],
        }
        att["gru_rel_pos_const"] = sd[L + "attention.gru_rel_pos_const"]
        if L + "attention.rel_attn_embed.weight" in sd:
            att["rel_attn_embed"] = {
                "embedding": sd[L + "attention.rel_attn_embed.weight"]
            }
        return {
            "attention": att,
            "norm": {
                "scale": sd[L + "layer_norm.weight"],
                "bias": sd[L + "layer_norm.bias"],
            },
            "intermediate": {
                "kernel": sd[L + "feed_forward.intermediate_dense.weight"].T,
                "bias": sd[L + "feed_forward.intermediate_dense.bias"],
            },
            "output": {
                "kernel": sd[L + "feed_forward.output_dense.weight"].T,
                "bias": sd[L + "feed_forward.output_dense.bias"],
            },
            "final_norm": {
                "scale": sd[L + "final_layer_norm.weight"],
                "bias": sd[L + "final_layer_norm.bias"],
            },
        }

    l0 = layer_params(0)
    for sub, tree in l0.items():
        p[f"layer_0_{sub}"] = tree
    # layers 1..N-1 run under nn.scan: params stacked on a leading axis
    if cfg.num_layers > 1:
        rest = [layer_params(i) for i in range(1, cfg.num_layers)]
        p["layers"] = jax.tree.map(lambda *xs: np.stack(xs), *rest)
    return p


# ---------------------------------------------------------------------------
# sinc resampler (torchaudio sinc_interp_hann semantics)
# ---------------------------------------------------------------------------


def sinc_resample_kernel(
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
):
    """Polyphase windowed-sinc kernel [new, 1, 2*width + orig] and width."""
    g = math.gcd(orig_freq, new_freq)
    orig, new = orig_freq // g, new_freq // g
    base_freq = min(orig, new) * rolloff
    width = int(math.ceil(lowpass_filter_width * orig / base_freq))
    idx = np.arange(-width, width + orig, dtype=np.float64)[None, :] / orig
    t = np.arange(0, -new, -1, dtype=np.float64)[:, None] / new + idx
    t = np.clip(t * base_freq, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * math.pi / lowpass_filter_width / 2) ** 2
    t = t * math.pi
    kernel = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernel = kernel * window * base_freq / orig
    return kernel.astype(np.float32)[:, None, :], width, orig, new


def make_resampler(
    orig_freq: int = 44100,
    new_freq: int = 16000,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
):
    """-> fn(wave [b, t]) -> [b, ceil(t*new/orig)] as one strided conv."""
    kernel, width, orig, new = sinc_resample_kernel(
        orig_freq, new_freq, lowpass_filter_width, rolloff
    )
    kernel_j = jnp.asarray(kernel)  # [new, 1, taps]

    def resample(wave: jax.Array) -> jax.Array:
        b, length = wave.shape
        x = jnp.pad(wave, ((0, 0), (width, width + orig)))[:, None, :]
        y = jax.lax.conv_general_dilated(
            x, kernel_j, window_strides=(orig,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
        )  # [b, new, frames]
        y = jnp.swapaxes(y, 1, 2).reshape(b, -1)
        target = int(math.ceil(new * length / orig))
        return y[:, :target]

    return resample


# ---------------------------------------------------------------------------
# train-step plumbing (losses.py:63-153 WavLMLoss)
# ---------------------------------------------------------------------------


def make_slm_fns(params: dict, cfg: WavLMConfig, input_sr: int = 44100,
                 model_sr: int = 16000):
    """-> (slm_embed, slm_feature_fn) for train.step.make_train_step.

    slm_embed(params, wave [b,t]@input_sr) -> [b, t', layers*hidden] stacked
    states (layer-major blocks, matching torch.stack(...).flatten(1,2) in
    losses.py:93-112); slm_feature_fn returns the per-layer list for the L1
    feature loss (losses.py:73-90).

    The returned fns take the WavLM params EXPLICITLY (first argument):
    closing over the 95M-param tree would embed ~380 MB of constants in every
    jitted train-step HLO — far past what a compile service will accept, and
    wasteful even locally. `params` here is only the default used when the
    caller passes None. The resampler kernel rides inside the param tree for
    the same reason (it is ~14 MB at 44.1k->16k).
    """
    model = WavLMJax(cfg)
    kernel, width, orig, new = sinc_resample_kernel(input_sr, model_sr)
    default_params = dict(params, __resample_kernel__=jnp.asarray(kernel))

    def resample(kernel_j, wave):
        b, length = wave.shape
        x = jnp.pad(wave, ((0, 0), (width, width + orig)))[:, None, :]
        y = jax.lax.conv_general_dilated(
            x, kernel_j, window_strides=(orig,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        y = jnp.swapaxes(y, 1, 2).reshape(b, -1)
        target = int(math.ceil(new * length / orig))
        return y[:, :target]

    def hidden_states(p, wave):
        p = p if p is not None else default_params
        kernel_j = p["__resample_kernel__"]
        wl = {k: v for k, v in p.items() if k != "__resample_kernel__"}
        return model.apply({"params": wl}, resample(kernel_j, wave))

    def slm_feature_fn(p, wave):
        return hidden_states(p, wave)

    def slm_embed(p, wave):
        hs = hidden_states(p, wave)
        return jnp.concatenate(hs, axis=-1)

    slm_embed.params = default_params
    slm_feature_fn.params = default_params
    return slm_embed, slm_feature_fn


def load_wavlm(path: str):
    """HF checkpoint dir (config.json + weights) -> (params, WavLMConfig).

    The reference downloads microsoft/wavlm-base-plus to ./slm/wavlm-base-plus
    (default_config.yml train_ms; losses.py:66).
    """
    import json
    import os

    with open(os.path.join(path, "config.json"), encoding="utf-8") as f:
        cfg = WavLMConfig.from_hf(json.load(f))
    st = os.path.join(path, "model.safetensors")
    pt = os.path.join(path, "pytorch_model.bin")
    if os.path.isfile(st):
        from safetensors.numpy import load_file

        sd = load_file(st)
    elif os.path.isfile(pt):
        import torch

        sd = torch.load(pt, map_location="cpu", weights_only=True)
    else:
        raise FileNotFoundError(f"no WavLM weights under {path}")
    return import_torch_wavlm(sd, cfg), cfg
