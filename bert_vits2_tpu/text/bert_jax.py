"""TPU-native BERT-family encoders for the linguistic conditioning features
(SURVEY.md §7 step 5; reference: text/chinese_bert.py:15-60 et al. run HF
torch models on GPU).

One flax module covers the three production encoders:
- ZH `chinese-roberta-wwm-ext-large` — standard BERT architecture;
- JA `deberta-v2-large-japanese-char-wwm`, EN `deberta-v3-large` — DeBERTa-v2
  disentangled attention (shared-projection relative embeddings with log
  bucket positions, c2p + p2c bias terms, optional first-layer conv branch).

Behavior mirrors transformers' modeling_deberta_v2.py (DisentangledSelfAttention
.disentangled_attention_bias, make_log_bucket_position) and modeling_bert.py at
fp32; weights import from HF torch state dicts (`import_torch_bert`). Inference
only (dropout disabled) — these encoders are frozen feature extractors.

Tensor parallelism: `bert_partition_specs` returns Megatron-style
PartitionSpecs (QKV/intermediate column-split, output rows-split over the
"model" mesh axis); XLA inserts the all-reduces (SURVEY.md §2.9 TP row).
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
class EncoderConfig:
    vocab_size: int
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    embedding_size: int | None = None  # != hidden -> embed_proj (deberta-v3)
    position_biased_input: bool = True
    # deberta-v2 disentangled attention; all off -> plain BERT
    relative_attention: bool = False
    position_buckets: int = -1
    max_relative_positions: int = -1
    pos_att_type: Sequence[str] = ()
    share_att_key: bool = False
    norm_rel_ebd: str = "none"
    conv_kernel_size: int = 0
    conv_act: str = "tanh"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def pos_ebd_size(self) -> int:
        m = self.max_relative_positions
        if m < 1:
            m = self.max_position_embeddings
        return self.position_buckets if self.position_buckets > 0 else m

    @classmethod
    def from_hf(cls, hf) -> "EncoderConfig":
        """Build from a transformers Bert/DebertaV2 config object or dict."""
        g = (lambda k, d=None: getattr(hf, k, d)) if not isinstance(hf, dict) else (
            lambda k, d=None: hf.get(k, d)
        )
        emb = g("embedding_size")
        return cls(
            vocab_size=g("vocab_size"),
            hidden_size=g("hidden_size"),
            num_layers=g("num_hidden_layers"),
            num_heads=g("num_attention_heads"),
            intermediate_size=g("intermediate_size"),
            max_position_embeddings=g("max_position_embeddings", 512),
            type_vocab_size=g("type_vocab_size", 0) or 0,
            layer_norm_eps=g("layer_norm_eps", 1e-12),
            embedding_size=emb if emb and emb != g("hidden_size") else None,
            position_biased_input=g("position_biased_input", True),
            relative_attention=bool(g("relative_attention", False)),
            position_buckets=g("position_buckets", -1) or -1,
            max_relative_positions=g("max_relative_positions", -1) or -1,
            pos_att_type=tuple(g("pos_att_type") or ()),
            share_att_key=bool(g("share_att_key", False)),
            norm_rel_ebd=g("norm_rel_ebd", "none") or "none",
            conv_kernel_size=g("conv_kernel_size", 0) or 0,
            conv_act=g("conv_act", "tanh") or "tanh",
        )


def make_log_bucket_position(rel_pos, bucket_size: int, max_position: int):
    """Log-bucketed relative positions (modeling_deberta_v2.py:58-71)."""
    sign = jnp.sign(rel_pos)
    mid = bucket_size // 2
    abs_pos = jnp.where(
        (rel_pos < mid) & (rel_pos > -mid), mid - 1, jnp.abs(rel_pos)
    ).astype(jnp.float32)
    log_pos = (
        jnp.ceil(
            jnp.log(abs_pos / mid)
            / math.log((max_position - 1) / mid)
            * (mid - 1)
        )
        + mid
    )
    return jnp.where(
        abs_pos <= mid, rel_pos.astype(jnp.float32), log_pos * sign
    ).astype(jnp.int32)


def build_relative_position(t: int, cfg: EncoderConfig):
    """[t, t] bucketed q-k relative position ids."""
    ids = jnp.arange(t)
    rel = ids[:, None] - ids[None, :]
    m = cfg.max_relative_positions
    if m < 1:
        m = cfg.max_position_embeddings
    if cfg.position_buckets > 0 and m > 0:
        rel = make_log_bucket_position(rel, cfg.position_buckets, m)
    return rel


class SelfAttention(nn.Module):
    """BERT scaled-dot attention, optionally with DeBERTa-v2 disentangled
    c2p/p2c relative bias (modeling_deberta_v2.py:195-351)."""

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x, attn_bias, rel_embeddings, rel_pos):
        cfg = self.cfg
        h, nh, hd = cfg.hidden_size, cfg.num_heads, cfg.head_dim
        q_proj = nn.Dense(h, name="query")
        k_proj = nn.Dense(h, name="key")
        v_proj = nn.Dense(h, name="value")

        def heads(t):  # [b, t, h] -> [b, nh, t, hd]
            return jnp.moveaxis(
                t.reshape(t.shape[0], t.shape[1], nh, hd), 2, 1
            )

        q, k, v = heads(q_proj(x)), heads(k_proj(x)), heads(v_proj(x))

        scale_factor = 1
        if cfg.relative_attention:
            scale_factor += ("c2p" in cfg.pos_att_type) + (
                "p2c" in cfg.pos_att_type
            )
        scale = math.sqrt(hd * scale_factor)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / scale

        if cfg.relative_attention and rel_embeddings is not None:
            span = cfg.pos_ebd_size
            rel_emb = rel_embeddings[: span * 2][None]  # [1, 2s, h]
            if cfg.share_att_key:
                pos_k = heads(k_proj(rel_emb))  # [1, nh, 2s, hd]
                pos_q = heads(q_proj(rel_emb))
            else:
                pos_k = (
                    heads(nn.Dense(h, name="pos_key_proj")(rel_emb))
                    if "c2p" in cfg.pos_att_type
                    else None
                )
                pos_q = (
                    heads(nn.Dense(h, name="pos_query_proj")(rel_emb))
                    if "p2c" in cfg.pos_att_type
                    else None
                )
            if "c2p" in cfg.pos_att_type:
                c2p = jnp.einsum("bhqd,xhkd->bhqk", q, pos_k)  # [b,nh,q,2s]
                c2p_pos = jnp.clip(rel_pos + span, 0, span * 2 - 1)
                c2p = jnp.take_along_axis(
                    c2p,
                    jnp.broadcast_to(
                        c2p_pos[None, None], c2p.shape[:2] + c2p_pos.shape
                    ),
                    axis=-1,
                )
                scores = scores + c2p / scale
            if "p2c" in cfg.pos_att_type:
                p2c = jnp.einsum("bhkd,xhqd->bhkq", k, pos_q)  # [b,nh,k,2s]
                p2c_pos = jnp.clip(-rel_pos + span, 0, span * 2 - 1)
                p2c = jnp.take_along_axis(
                    p2c,
                    jnp.broadcast_to(
                        p2c_pos[None, None], p2c.shape[:2] + p2c_pos.shape
                    ),
                    axis=-1,
                )
                scores = scores + jnp.swapaxes(p2c, -1, -2) / scale

        scores = scores + attn_bias  # [b, 1, 1|q, k] additive mask
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        return jnp.moveaxis(ctx, 1, 2).reshape(x.shape[0], x.shape[1], h)


class TransformerLayer(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x, attn_bias, rel_embeddings, rel_pos):
        cfg = self.cfg
        attn = SelfAttention(cfg, name="attention")(
            x, attn_bias, rel_embeddings, rel_pos
        )
        attn = nn.Dense(cfg.hidden_size, name="attention_output")(attn)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="attention_norm")(
            attn + x
        )
        inter = nn.Dense(cfg.intermediate_size, name="intermediate")(x)
        inter = jax.nn.gelu(inter, approximate=False)
        out = nn.Dense(cfg.hidden_size, name="output")(inter)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="output_norm")(
            out + x
        )


class BertEncoder(nn.Module):
    """Returns all hidden states [(b, t, h)] * (num_layers + 1), HF layout
    (index 0 = embedding output), so hidden_states[-3] matches the reference's
    feature tap (text/chinese_bert.py:45)."""

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None):
        cfg = self.cfg
        b, t = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, t), jnp.int32)

        emb_size = cfg.embedding_size or cfg.hidden_size
        x = nn.Embed(cfg.vocab_size, emb_size, name="word_embeddings")(
            input_ids
        )
        if cfg.position_biased_input:
            pos = jnp.arange(t)[None]
            x = x + nn.Embed(
                cfg.max_position_embeddings, emb_size, name="position_embeddings"
            )(pos)
        if cfg.type_vocab_size > 0:
            if token_type_ids is None:
                token_type_ids = jnp.zeros((b, t), jnp.int32)
            x = x + nn.Embed(
                cfg.type_vocab_size, emb_size, name="token_type_embeddings"
            )(token_type_ids)
        if cfg.embedding_size and cfg.embedding_size != cfg.hidden_size:
            x = nn.Dense(cfg.hidden_size, use_bias=False, name="embed_proj")(x)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="embeddings_norm")(x)
        if cfg.relative_attention:  # deberta masks embeddings by input mask
            x = x * attention_mask[..., None].astype(x.dtype)

        attn_bias = (1.0 - attention_mask[:, None, None, :].astype(x.dtype)) * (
            jnp.finfo(x.dtype).min
        )

        rel_embeddings, rel_pos = None, None
        if cfg.relative_attention:
            rel_emb = self.param(
                "rel_embeddings",
                nn.initializers.normal(0.02),
                (cfg.pos_ebd_size * 2, cfg.hidden_size),
            )
            if "layer_norm" in cfg.norm_rel_ebd:
                rel_emb = nn.LayerNorm(
                    epsilon=cfg.layer_norm_eps, name="rel_embeddings_norm"
                )(rel_emb)
            rel_embeddings = rel_emb
            rel_pos = build_relative_position(t, cfg)

        hidden_states = [x]
        first_out = None
        for i in range(cfg.num_layers):
            y = TransformerLayer(cfg, name=f"layer_{i}")(
                x, attn_bias, rel_embeddings, rel_pos
            )
            if i == 0 and cfg.conv_kernel_size > 0:
                # conv branch over the EMBEDDING output, added to layer-0 out
                # (modeling_deberta_v2.py:453-487)
                conv = nn.Conv(
                    cfg.hidden_size,
                    (cfg.conv_kernel_size,),
                    padding=(cfg.conv_kernel_size - 1) // 2,
                    name="conv",
                )(x)
                conv = conv * attention_mask[..., None].astype(conv.dtype)
                conv = getattr(jnp, cfg.conv_act, jnp.tanh)(conv)
                y = nn.LayerNorm(
                    epsilon=cfg.layer_norm_eps, name="conv_norm"
                )(y + conv)
                y = y * attention_mask[..., None].astype(y.dtype)
            hidden_states.append(y)
            x = y
        return hidden_states


# ---------------------------------------------------------------------------
# torch -> flax weight import
# ---------------------------------------------------------------------------


def _t(w) -> np.ndarray:
    return np.asarray(w, np.float32).T


def import_torch_bert(state_dict: dict, cfg: EncoderConfig) -> dict:
    """HF Bert/DebertaV2 state dict (torch tensors or numpy) -> flax params.

    Accepts the `bert.`/`deberta.` prefixes of *ForMaskedLM checkpoints or
    bare base-model dicts.
    """
    sd = {}
    for k, v in state_dict.items():
        for pre in ("bert.", "deberta.", "roberta."):
            if k.startswith(pre):
                k = k[len(pre):]
                break
        sd[k] = np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v, np.float32
        )

    p: dict = {}
    emb = "embeddings."
    p["word_embeddings"] = {"embedding": sd[emb + "word_embeddings.weight"]}
    if cfg.position_biased_input and emb + "position_embeddings.weight" in sd:
        p["position_embeddings"] = {
            "embedding": sd[emb + "position_embeddings.weight"]
        }
    if cfg.type_vocab_size > 0 and emb + "token_type_embeddings.weight" in sd:
        p["token_type_embeddings"] = {
            "embedding": sd[emb + "token_type_embeddings.weight"]
        }
    if cfg.embedding_size and cfg.embedding_size != cfg.hidden_size:
        p["embed_proj"] = {"kernel": _t(sd[emb + "embed_proj.weight"])}
    p["embeddings_norm"] = {
        "scale": sd[emb + "LayerNorm.weight"],
        "bias": sd[emb + "LayerNorm.bias"],
    }
    if cfg.relative_attention:
        p["rel_embeddings"] = sd["encoder.rel_embeddings.weight"]
        if "layer_norm" in cfg.norm_rel_ebd:
            p["rel_embeddings_norm"] = {
                "scale": sd["encoder.LayerNorm.weight"],
                "bias": sd["encoder.LayerNorm.bias"],
            }
    if cfg.conv_kernel_size > 0:
        # torch Conv1d [out, in, k] -> flax [k, in, out]
        p["conv"] = {
            "kernel": sd["encoder.conv.conv.weight"].transpose(2, 1, 0),
            "bias": sd["encoder.conv.conv.bias"],
        }
        p["conv_norm"] = {
            "scale": sd["encoder.conv.LayerNorm.weight"],
            "bias": sd["encoder.conv.LayerNorm.bias"],
        }

    deberta = "encoder.layer.0.attention.self.query_proj.weight" in sd
    for i in range(cfg.num_layers):
        L = f"encoder.layer.{i}."
        att = L + ("attention.self." if True else "")
        names = (
            {"query": "query_proj", "key": "key_proj", "value": "value_proj"}
            if deberta
            else {"query": "query", "key": "key", "value": "value"}
        )
        layer: dict = {"attention": {}}
        for ours, theirs in names.items():
            layer["attention"][ours] = {
                "kernel": _t(sd[att + theirs + ".weight"]),
                "bias": sd[att + theirs + ".bias"],
            }
        for ours, theirs in (
            ("pos_key_proj", "pos_key_proj"),
            ("pos_query_proj", "pos_query_proj"),
        ):
            if att + theirs + ".weight" in sd:
                layer["attention"][ours] = {
                    "kernel": _t(sd[att + theirs + ".weight"]),
                    "bias": sd.get(
                        att + theirs + ".bias",
                        np.zeros(cfg.hidden_size, np.float32),
                    ),
                }
        layer["attention_output"] = {
            "kernel": _t(sd[L + "attention.output.dense.weight"]),
            "bias": sd[L + "attention.output.dense.bias"],
        }
        layer["attention_norm"] = {
            "scale": sd[L + "attention.output.LayerNorm.weight"],
            "bias": sd[L + "attention.output.LayerNorm.bias"],
        }
        layer["intermediate"] = {
            "kernel": _t(sd[L + "intermediate.dense.weight"]),
            "bias": sd[L + "intermediate.dense.bias"],
        }
        layer["output"] = {
            "kernel": _t(sd[L + "output.dense.weight"]),
            "bias": sd[L + "output.dense.bias"],
        }
        layer["output_norm"] = {
            "scale": sd[L + "output.LayerNorm.weight"],
            "bias": sd[L + "output.LayerNorm.bias"],
        }
        p[f"layer_{i}"] = layer
    return p


# ---------------------------------------------------------------------------
# tensor-parallel partition specs
# ---------------------------------------------------------------------------


def bert_partition_specs(params: dict, model_axis: str = "model"):
    """Megatron-style TP specs: QKV + intermediate column-parallel, attention
    output + FFN output row-parallel, everything else replicated. Apply with
    jax.device_put(params, NamedSharding(mesh, spec)) leaf-wise."""
    from jax.sharding import PartitionSpec as P

    col = {"kernel": P(None, model_axis), "bias": P(model_axis)}
    row = {"kernel": P(model_axis, None), "bias": P()}

    def spec(path, leaf):
        keys = [str(k.key) if hasattr(k, "key") else str(k) for k in path]
        joined = "/".join(keys)
        if any(
            s in joined
            for s in ("attention/query", "attention/key", "attention/value",
                      "pos_key_proj", "pos_query_proj")
        ):
            return col["kernel"] if keys[-1] == "kernel" else col["bias"]
        if "intermediate" in joined:
            return col["kernel"] if keys[-1] == "kernel" else col["bias"]
        if "attention_output" in joined or (
            keys[-2:-1] == ["output"] if len(keys) > 1 else False
        ):
            return row["kernel"] if keys[-1] == "kernel" else row["bias"]
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


# ---------------------------------------------------------------------------
# production extractor (drop-in for text/bert.py's BertExtractor protocol)
# ---------------------------------------------------------------------------


class JaxBertExtractor:
    """Phone-level BERT features computed BY THE TPU (reference runs torch on
    GPU, text/chinese_bert.py:15-60). Loads HF-format local checkpoints
    (config.json + pytorch_model.bin / model.safetensors), imports weights
    into the JAX encoder once, and serves jitted per length bucket.

    mesh: optional jax.sharding.Mesh with a "model" axis — parameters are
    laid out with Megatron-style TP specs and XLA inserts the collectives.
    """

    def __init__(self, paths: dict | None = None, mesh=None,
                 length_buckets=(32, 64, 128, 256, 512)):
        from bert_vits2_tpu.text.bert import DEFAULT_BERT_PATHS

        self.paths = dict(DEFAULT_BERT_PATHS)
        if paths:
            self.paths.update(paths)
        self.mesh = mesh
        self.length_buckets = tuple(sorted(length_buckets))
        self._loaded: dict = {}
        self._jitted: dict = {}

    def _load(self, language: str):
        if language in self._loaded:
            return self._loaded[language]
        import json
        import os

        path = self.paths[language]
        if not os.path.isdir(path):
            raise FileNotFoundError(
                f"no local BERT weights for {language} at {path}"
            )
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(path)
        with open(os.path.join(path, "config.json"), encoding="utf-8") as f:
            cfg = EncoderConfig.from_hf(json.load(f))
        sd = None
        st = os.path.join(path, "model.safetensors")
        pt = os.path.join(path, "pytorch_model.bin")
        if os.path.isfile(st):
            from safetensors.numpy import load_file

            sd = load_file(st)
        elif os.path.isfile(pt):
            import torch

            sd = torch.load(pt, map_location="cpu", weights_only=True)
        else:
            raise FileNotFoundError(f"no weights file under {path}")
        params = import_torch_bert(sd, cfg)
        if self.mesh is not None:
            from jax.sharding import NamedSharding

            specs = bert_partition_specs(params)
            params = jax.tree.map(
                lambda x, s: jax.device_put(x, NamedSharding(self.mesh, s)),
                params,
                specs,
            )
        model = BertEncoder(cfg)
        self._loaded[language] = (tok, model, params)
        return self._loaded[language]

    def _bucket(self, t: int) -> int:
        for b in self.length_buckets:
            if t <= b:
                return b
        return ((t + 127) // 128) * 128

    def _run(self, language: str, ids: np.ndarray, mask: np.ndarray):
        tok, model, params = self._loaded[language]
        t = ids.shape[1]
        t_pad = self._bucket(t)
        key = (language, t_pad)
        if key not in self._jitted:
            self._jitted[key] = jax.jit(
                lambda p, i, m: model.apply({"params": p}, i, m)[-3]
            )
        ids_p = np.zeros((1, t_pad), np.int32)
        mask_p = np.zeros((1, t_pad), np.int32)
        ids_p[:, :t] = ids
        mask_p[:, :t] = mask
        out = self._jitted[key](params, ids_p, mask_p)
        return np.asarray(out)[0, :t]

    def _word_features(self, text: str, language: str) -> np.ndarray:
        tok, _model, _params = self._load(language)
        enc = tok(text, return_tensors="np")
        ids = np.asarray(enc["input_ids"], np.int32)
        mask = np.asarray(enc.get("attention_mask", np.ones_like(ids)), np.int32)
        return self._run(language, ids, mask)

    def __call__(self, norm_text, word2ph, language, style_text=None,
                 style_weight: float = 0.7):
        from bert_vits2_tpu.text.bert import expand_word2ph

        feats = self._word_features(norm_text, language)
        assert feats.shape[0] == len(word2ph), (feats.shape, len(word2ph))
        if style_text:
            style = self._word_features(style_text, language).mean(
                0, keepdims=True
            )
            feats = feats * (1.0 - style_weight) + style * style_weight
        return expand_word2ph(feats, word2ph).astype(np.float32)
