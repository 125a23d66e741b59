"""ONNX artifact export for the MoeVS deployment ecosystem.

Mirrors the reference's 6-graph split and I/O contract exactly
(onnx_modules/V230/models_onnx.py:896-1080):

  {name}_emb.onnx    sid:int64[b]                        -> g[b, gin]
  {name}_enc_p.onnx  x, x_lengths, t, language (int64),
                     bert_0/1/2 [t_x, 1024], g [b,gin,1] -> xout[b,h,t],
                                                            m_p[b,d,t],
                                                            logs_p[b,d,t],
                                                            x_mask[b,1,t]
  {name}_sdp.onnx    x[b,h,t], x_mask[b,1,t],
                     zin[b,2,t], g[b,gin,1]              -> logw[b,1,t]
  {name}_dp.onnx     x[b,h,t], x_mask[b,1,t], g[b,gin,1] -> logw[b,1,t]
  {name}_flow.onnx   z_p[b,d,t'], y_mask[b,1,t'],
                     g[b,gin,1]                          -> z[b,d,t']
  {name}_dec.onnx    z_in[b,d,t'], g[b,gin,1]            -> o[b,1,samples]

All boundary tensors are channel-first (the torch/MoeVS convention); the
wrappers transpose to this framework's native [b, t, c] layout internally.
Graphs are static-shape at the exported (t_x, max_frames) bucket —
re-export per bucket if a runtime needs several.

Since neither `onnx` nor `onnxruntime` ship in the TPU image, graphs are
serialized by compat/onnx_pb.py and verified by the numpy evaluator
(compat/onnx_eval.py) against the JAX ground truth.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from bert_vits2_tpu.compat.jax2onnx import export_model
from bert_vits2_tpu.ops.attention_pallas import force_lax_attention

_BERT_DIM = 1024


def _cf(x):  # [b, t, c] -> [b, c, t]
    return jnp.transpose(x, (0, 2, 1))


def make_onnx_stage_fns(model, params: dict) -> dict:
    """Channel-first stage functions with the reference ONNX I/O contract."""
    variables = {"params": params}

    def emb(sid):
        return model.apply(
            variables, sid.astype(jnp.int32), method=lambda m, s: m.emb_g(s)
        )

    emotion = getattr(model.cfg, "emotion", "none")

    def _run_enc(x, x_lengths, tone, language, bert0, bert1, bert2, g,
                 emo=None):
        xh, m_p, logs_p, x_mask = model.apply(
            variables,
            x.astype(jnp.int32),
            x_lengths.astype(jnp.int32),
            tone.astype(jnp.int32),
            language.astype(jnp.int32),
            bert0[None].astype(jnp.float32),
            bert1[None].astype(jnp.float32),
            bert2[None].astype(jnp.float32),
            method=lambda m, *a: m.enc_p(
                *a, emo=emo, g=g[..., 0], deterministic=True
            ),
        )
        return _cf(xh), _cf(m_p), _cf(logs_p), x_mask[:, None, :]

    if emotion == "vq210":
        # reference V210 contract (onnx_modules/V210/models_onnx.py:947):
        # extra vqidx + sid inputs; sid is accepted for drop-in parity but
        # speaker conditioning enters via g (our quantizer indexes vqidx)
        def enc_p(x, x_lengths, tone, language, bert0, bert1, bert2, g,
                  vqidx, sid):
            del sid
            return _run_enc(x, x_lengths, tone, language, bert0, bert1,
                            bert2, g, emo=vqidx.astype(jnp.int32))
    elif emotion == "clap220":
        def enc_p(x, x_lengths, tone, language, bert0, bert1, bert2, g,
                  emo):
            return _run_enc(x, x_lengths, tone, language, bert0, bert1,
                            bert2, g, emo=emo.astype(jnp.float32))
    else:
        def enc_p(x, x_lengths, tone, language, bert0, bert1, bert2, g):
            return _run_enc(x, x_lengths, tone, language, bert0, bert1,
                            bert2, g)

    def sdp(x, x_mask, zin, g):
        logw = model.apply(
            variables,
            method=lambda m: m.sdp(
                _cf(x), x_mask[:, 0, :], g=g[..., 0], reverse=True,
                z_in=_cf(zin), deterministic=True,
            ),
        )
        return _cf(logw)

    def dp(x, x_mask, g):
        logw = model.apply(
            variables,
            method=lambda m: m.dp(
                _cf(x), x_mask[:, 0, :], g=g[..., 0], deterministic=True
            ),
        )
        return _cf(logw)

    def flow(z_p, y_mask, g):
        z = model.apply(
            variables,
            method=lambda m: m.flow(
                _cf(z_p), y_mask[:, 0, :], g=g[..., 0], reverse=True,
                deterministic=True,
            ),
        )
        return _cf(z)

    def dec(z_in, g):
        wave = model.apply(
            variables,
            method=lambda m: m.dec(_cf(z_in), g=g[..., 0]),
        )
        return wave[:, None, :]

    return {"emb": emb, "enc_p": enc_p, "sdp": sdp, "dp": dp,
            "flow": flow, "dec": dec}


def stage_signatures(cfg, t_x: int, max_frames: int, batch: int = 1):
    """-> {stage: (example_args, input_names, output_names)}."""
    S = jax.ShapeDtypeStruct
    f32, i64 = jnp.float32, jnp.int64
    b = batch
    gin, h, d = cfg.gin_channels, cfg.hidden_channels, cfg.inter_channels
    g = S((b, gin, 1), f32)
    bert = S((t_x, _BERT_DIM), f32)
    return {
        "emb": (
            (S((b,), i64),),
            ["sid"],
            ["g"],
        ),
        "enc_p": (
            (
                S((b, t_x), i64), S((b,), i64), S((b, t_x), i64),
                S((b, t_x), i64), bert, bert, bert, g,
            )
            + {
                "vq210": (S((b,), i64), S((b,), i64)),
                "clap220": (S((b, 512), f32),),
            }.get(getattr(cfg, "emotion", "none"), ()),
            ["x", "x_lengths", "t", "language", "bert_0", "bert_1",
             "bert_2", "g"]
            + {
                "vq210": ["vqidx", "sid"],
                "clap220": ["emo"],
            }.get(getattr(cfg, "emotion", "none"), []),
            ["xout", "m_p", "logs_p", "x_mask"],
        ),
        "sdp": (
            (
                S((b, h, t_x), f32), S((b, 1, t_x), f32),
                S((b, 2, t_x), f32), g,
            ),
            ["x", "x_mask", "zin", "g"],
            ["logw"],
        ),
        "dp": (
            (S((b, h, t_x), f32), S((b, 1, t_x), f32), g),
            ["x", "x_mask", "g"],
            ["logw"],
        ),
        "flow": (
            (
                S((b, d, max_frames), f32), S((b, 1, max_frames), f32), g,
            ),
            ["z_p", "y_mask", "g"],
            ["z"],
        ),
        "dec": (
            (S((b, d, max_frames), f32), g),
            ["z_in", "g"],
            ["o"],
        ),
    }


def export_onnx(
    model,
    params: dict,
    out_dir: str,
    name: str = "BertVits2",
    t_x: int = 128,
    max_frames: int = 1024,
    stages: tuple[str, ...] = ("emb", "enc_p", "sdp", "dp", "flow", "dec"),
) -> dict[str, str]:
    """Export the 6 inference stages as .onnx files. -> {stage: path}.

    Writes `{out_dir}/{name}_{stage}.onnx` plus a MoeVS-style project
    config `{out_dir}/config.json` (reference export naming:
    onnx_modules/V230/models_onnx.py:953-1060, export_onnx.py:4-15).
    """
    cfg = model.cfg
    os.makedirs(out_dir, exist_ok=True)
    fns = make_onnx_stage_fns(model, params)
    sigs = stage_signatures(cfg, t_x, max_frames)
    paths: dict[str, str] = {}
    for stage in stages:
        fn = fns[stage]
        args, in_names, out_names = sigs[stage]
        with force_lax_attention():
            mb = export_model(
                fn, args, in_names, out_names,
                graph_name=f"{name}_{stage}",
                doc_string=(
                    f"Bert-VITS2 {stage} stage (TPU-native export; "
                    f"t_x={t_x}, max_frames={max_frames})"
                ),
            )
        path = os.path.join(out_dir, f"{name}_{stage}.onnx")
        with open(path, "wb") as f:
            f.write(mb)
        paths[stage] = path

    config = {
        "Folder": name,
        "Name": name,
        "Type": "BertVits",
        "Rate": getattr(model.cfg, "sampling_rate", 44100),
        "NSFF0": False,
        "Symbol": None,
        "AddBlank": True,
        "Hop": cfg.hop_length,
        "Characters": [],
        "LanguageMap": {"ZH": 0, "JP": 1, "EN": 2},
        "Dict": "BasicDict",
        "BertPath": [
            "chinese-roberta-wwm-ext-large",
            "deberta-v2-large-japanese",
            "bert-base-japanese-v3",
        ],
        "Clean": True,
        "Stages": {k: os.path.basename(v) for k, v in paths.items()},
        "Shapes": {"t_x": t_x, "max_frames": max_frames, "batch": 1},
    }
    with open(os.path.join(out_dir, "config.json"), "w", encoding="utf-8") as f:
        json.dump(config, f, indent=2, ensure_ascii=False)
    return paths


def verify_onnx(
    model,
    params: dict,
    paths: dict[str, str],
    t_x: int,
    max_frames: int,
    seed: int = 0,
) -> dict[str, float]:
    """Run each exported graph on the numpy evaluator against the JAX stage
    fn with random inputs. -> {stage: max_abs_err}."""
    from bert_vits2_tpu.compat.onnx_eval import OnnxEvaluator

    cfg = model.cfg
    fns = make_onnx_stage_fns(model, params)
    sigs = stage_signatures(cfg, t_x, max_frames)
    rng = np.random.default_rng(seed)
    errs: dict[str, float] = {}
    for stage, path in paths.items():
        args_spec, in_names, _ = sigs[stage]
        args = []
        for s, nm in zip(args_spec, in_names):
            if np.issubdtype(np.dtype(s.dtype), np.integer):
                hi = {
                    "sid": cfg.n_speakers,
                    "x": cfg.n_vocab,
                    "t": cfg.num_tones,
                    "language": cfg.num_languages,
                }.get(nm, 2)
                if nm == "x_lengths":
                    args.append(np.full(s.shape, t_x, np.int64))
                else:
                    args.append(
                        rng.integers(0, hi, s.shape).astype(np.int64)
                    )
            elif nm in ("x_mask", "y_mask"):
                args.append(np.ones(s.shape, np.float32))
            else:
                args.append(
                    (rng.normal(size=s.shape) * 0.3).astype(np.float32)
                )
        with force_lax_attention():
            want = fns[stage](*[jnp.asarray(a) for a in args])
        want = want if isinstance(want, (tuple, list)) else (want,)
        with open(path, "rb") as f:
            ev = OnnxEvaluator(f.read())
        got = ev(*args)
        err = max(
            float(np.abs(np.asarray(w) - g).max()) for w, g in zip(want, got)
        )
        errs[stage] = err
    return errs


def main():
    p = argparse.ArgumentParser(
        description="Export Bert-VITS2 inference stages to ONNX "
        "(reference: export_onnx.py)"
    )
    p.add_argument("-c", "--config", required=True)
    p.add_argument("-m", "--model", required=True, help=".pth or orbax dir")
    p.add_argument("-o", "--out", default="onnx")
    p.add_argument("--name", default="BertVits2.3PT")
    p.add_argument("--t-x", type=int, default=128)
    p.add_argument("--max-frames", type=int, default=1024)
    p.add_argument("--verify", action="store_true")
    args = p.parse_args()

    from bert_vits2_tpu.compat.hparams import (
        get_hparams_from_file,
        model_config_from_hparams,
    )
    from bert_vits2_tpu.compat.versions import spec_for
    from bert_vits2_tpu.infer.loader import load_generator_params
    from bert_vits2_tpu.models import Synthesizer

    hps = get_hparams_from_file(args.config)
    spec = spec_for(str(hps.get("version", "2.3")))
    mcfg = model_config_from_hparams(hps, **spec.model_overrides())
    model = Synthesizer(mcfg)
    params = load_generator_params(args.model, model, mcfg)
    out_dir = os.path.join(args.out, args.name)
    paths = export_onnx(
        model, params, out_dir, args.name, args.t_x, args.max_frames
    )
    print(json.dumps({k: v for k, v in paths.items()}, indent=2))
    if args.verify:
        errs = verify_onnx(
            model, params, paths, args.t_x, args.max_frames
        )
        print(json.dumps({"max_abs_err": errs}, indent=2))


if __name__ == "__main__":
    main()
