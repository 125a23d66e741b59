"""Inference stage decomposition + export (reference: onnx_modules/V230/
models_onnx.py:896-1080 splits SynthesizerTrn into 6 ONNX graphs — _emb,
_enc_p, _sdp, _dp, _flow, _dec — consumed by MoeVS-style runtimes).

The TPU equivalent: the same 6 stages as independently jittable functions
over static shapes, plus `export_stages` which serializes each one to a
portable StableHLO artifact (jax.export) with a MoeVSProject-style manifest.
Useful for pipelined serving (each stage can live on a different core) and
for embedding the model in non-Python runtimes via the StableHLO loader.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from bert_vits2_tpu.ops.masking import generate_path, sequence_mask


def make_stages(model, params: dict) -> dict:
    """-> dict of jitted stage fns mirroring the ONNX export split.

    emb(sid [b]) -> g [b, gin]
    enc_p(x, x_lengths, tone, language, bert, ja_bert, en_bert, g)
        -> (x_hidden, m_p, logs_p, x_mask)
    sdp(x_hidden, x_mask, g, noise_scale_w, rng) -> logw [b, t, 1]
    dp(x_hidden, x_mask, g) -> logw [b, t, 1]
    flow(z_p, y_mask, g) -> z               (reverse direction)
    dec(z, g, y_mask) -> wave [b, t*hop]
    """
    variables = {"params": params}

    @jax.jit
    def emb(sid):
        return model.apply(variables, sid, method=lambda m, s: m.emb_g(s))

    @jax.jit
    def enc_p(x, x_lengths, tone, language, bert, ja_bert, en_bert, g):
        return model.apply(
            variables, x, x_lengths, tone, language, bert, ja_bert, en_bert,
            method=lambda m, *a: m.enc_p(*a, g=g, deterministic=True),
        )

    @jax.jit
    def sdp(x_hidden, x_mask, g, noise_scale_w, rng):
        return model.apply(
            variables,
            method=lambda m: m.sdp(
                x_hidden, x_mask, g=g, reverse=True,
                noise_scale=noise_scale_w, deterministic=True,
            ),
            rngs={"noise": rng},
        )

    @jax.jit
    def dp(x_hidden, x_mask, g):
        return model.apply(
            variables,
            method=lambda m: m.dp(x_hidden, x_mask, g=g, deterministic=True),
        )

    @jax.jit
    def flow(z_p, y_mask, g):
        return model.apply(
            variables,
            method=lambda m: m.flow(
                z_p, y_mask, g=g, reverse=True, deterministic=True
            ),
        )

    @jax.jit
    def dec(z, g, y_mask):
        return model.apply(
            variables, method=lambda m: m.dec(z, g=g, y_mask=y_mask)
        )

    return {"emb": emb, "enc_p": enc_p, "sdp": sdp, "dp": dp,
            "flow": flow, "dec": dec}


def run_stages(
    stages: dict,
    x, x_lengths, sid, tone, language, bert, ja_bert, en_bert,
    max_frames: int,
    noise_scale: float = 0.667,
    length_scale: float = 1.0,
    noise_scale_w: float = 0.8,
    sdp_ratio: float = 0.0,
    seed: int = 0,
):
    """Glue the 6 stages like the ONNX runner's numpy glue
    (onnx_modules/V230_OnnxInference/__init__.py). Returns (wave, y_lengths).
    """
    rng = jax.random.key(seed)
    g = stages["emb"](sid)
    x_h, m_p, logs_p, x_mask = stages["enc_p"](
        x, x_lengths, tone, language, bert, ja_bert, en_bert, g
    )
    logw_sdp = stages["sdp"](x_h, x_mask, g, jnp.float32(noise_scale_w), rng)
    logw_dp = stages["dp"](x_h, x_mask, g)
    logw = logw_sdp * sdp_ratio + logw_dp * (1.0 - sdp_ratio)
    w = jnp.exp(logw[..., 0]) * x_mask * length_scale
    w_ceil = jnp.ceil(w)
    y_lengths = jnp.minimum(
        jnp.clip(jnp.sum(w_ceil, axis=-1), min=1.0), max_frames
    ).astype(jnp.int32)
    y_mask = sequence_mask(y_lengths, max_frames).astype(x_mask.dtype)
    attn = generate_path(w_ceil, x_mask, y_mask)
    m_p_y = jnp.einsum("byx,bxd->byd", attn, m_p)
    logs_p_y = jnp.einsum("byx,bxd->byd", attn, logs_p)
    eps = jax.random.normal(jax.random.fold_in(rng, 1), m_p_y.shape)
    z_p = m_p_y + eps * jnp.exp(logs_p_y) * noise_scale
    z = stages["flow"](z_p, y_mask, g)
    wave = stages["dec"](z * y_mask[..., None], g, y_mask)
    return wave, y_lengths


def export_stages(
    model,
    params: dict,
    out_dir: str,
    t_x: int = 128,
    max_frames: int = 1024,
    batch: int = 1,
    project_name: str = "bert_vits2_tpu",
) -> dict:
    """Serialize all 6 stages as StableHLO artifacts (<stage>.stablehlo) +
    a manifest.json (the MoeVSProject-config analogue,
    onnx_modules/V230/models_onnx.py:896-1080). Returns {stage: path}."""
    from jax import export as jexport

    cfg = model.cfg
    os.makedirs(out_dir, exist_ok=True)
    stages = make_stages(model, params)
    f32, i32 = jnp.float32, jnp.int32
    S = jax.ShapeDtypeStruct
    b = batch
    gin = cfg.gin_channels
    h = cfg.hidden_channels
    d = cfg.inter_channels
    bert = S((b, t_x, cfg.bert_dim), f32)
    shapes = {
        "emb": (S((b,), i32),),
        "enc_p": (
            S((b, t_x), i32), S((b,), i32), S((b, t_x), i32),
            S((b, t_x), i32), bert, bert, bert, S((b, gin), f32),
        ),
        "sdp": (
            S((b, t_x, h), f32), S((b, t_x), f32), S((b, gin), f32),
            S((), f32), jax.ShapeDtypeStruct((2,), jnp.uint32),
        ),
        "dp": (S((b, t_x, h), f32), S((b, t_x), f32), S((b, gin), f32)),
        "flow": (
            S((b, max_frames, d), f32), S((b, max_frames), f32),
            S((b, gin), f32),
        ),
        "dec": (
            S((b, max_frames, d), f32), S((b, gin), f32),
            S((b, max_frames), f32),
        ),
    }
    paths = {}
    for name, fn in stages.items():
        args = shapes[name]
        if name == "sdp":
            # rng keys aren't serializable args; wrap with a seed input
            def sdp_seed(x_h, x_mask, g, nsw, seed32):
                return fn(x_h, x_mask, g, nsw, jax.random.wrap_key_data(seed32))

            exp = jexport.export(jax.jit(sdp_seed))(
                *args[:4], S((2,), jnp.uint32)
            )
        else:
            exp = jexport.export(fn)(*args)
        path = os.path.join(out_dir, f"{name}.stablehlo")
        with open(path, "wb") as f:
            f.write(exp.serialize())
        paths[name] = path

    manifest = {
        "Folder": project_name,
        "Name": project_name,
        "Type": "BertVits",
        "Symbol": None,
        "Cleaner": {},
        "Rate": getattr(cfg, "sampling_rate", 44100),
        "Stages": {k: os.path.basename(v) for k, v in paths.items()},
        "Shapes": {"t_x": t_x, "max_frames": max_frames, "batch": batch},
    }
    with open(os.path.join(out_dir, "manifest.json"), "w", encoding="utf-8") as f:
        json.dump(manifest, f, indent=2, ensure_ascii=False)
    return paths
