"""One-command real-checkpoint demo: audio files + delivered throughput.

Finds a trained V2.x generator checkpoint (G_*.pth), imports it into the
JAX Synthesizer, synthesizes sample sentences to .wav, and measures
DELIVERED audio-s/s with the checkpoint's own trained durations — replacing
bench.py's length_scale-calibration caveat (random-init duration predictors
say ~1 frame/token; a trained model speaks at its real rate).

    python tools/demo_real_ckpt.py                  # search default paths
    python tools/demo_real_ckpt.py --ckpt my/G_8000.pth --speaker 0
    python tools/demo_real_ckpt.py --fetch          # try the community base
                                                    # model when online

Skips cleanly (exit 0, one JSON line with "skipped") when no checkpoint is
available — this image is offline by default.

Reference flow: infer.py:151-332 (single-utterance inference) on a
webui-compatible checkpoint (utils.py:90-109 load_checkpoint).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_SEARCH = (
    "pretrained/G_*.pth",
    "pretrained/Bert-VITS2_2.3/G_*.pth",
    "G_*.pth",
    "logs/*/G_*.pth",
)

SAMPLES = [
    ("ZH", "这个银行的行长说，重庆的天气重新变好了。"),
    ("EN", "The quick brown fox jumps over the lazy dog."),
    ("JP", "今日はいい天気ですね。"),
]


def find_ckpt(explicit: str | None) -> str | None:
    if explicit:
        return explicit if os.path.isfile(explicit) else None
    env = os.environ.get("BVT_CKPT")
    if env and os.path.isfile(env):
        return env
    for pat in DEFAULT_SEARCH:
        hits = sorted(glob.glob(os.path.join(REPO, pat)))
        if hits:
            return hits[-1]
    return None


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--ckpt", default=None, help="G_*.pth path")
    p.add_argument("--config", default=None,
                   help="config.json for the checkpoint (default: the "
                        "built-in v2.3 geometry; also forwarded to the "
                        "parity run)")
    p.add_argument("--fetch", action="store_true",
                   help="attempt to download the community V2.3 base model "
                        "first (needs network)")
    p.add_argument("--out-dir", default="demo_out")
    p.add_argument("--speaker", default=0)
    p.add_argument("--bench-batch", type=int, default=8,
                   help="batch size for the delivered-throughput measurement")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--no-parity", action="store_true",
                   help="skip the torch-reference mel-parity run")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the axon TPU plugin "
                        "overrides JAX_PLATFORMS at import time)")
    args = p.parse_args(argv)

    if args.fetch and not find_ckpt(args.ckpt):
        from bert_vits2_tpu.tools.fetch_assets import fetch_base_checkpoint

        ok, status = fetch_base_checkpoint(REPO)
        print(f"fetch base checkpoint: {status}", file=sys.stderr)

    path = find_ckpt(args.ckpt)
    if path is None:
        print(json.dumps({
            "skipped": "no G_*.pth checkpoint found (offline image); "
                       "searched " + ", ".join(DEFAULT_SEARCH),
        }))
        return 0

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        from tools._timing import cache_dir

        jax.config.update("jax_compilation_cache_dir", cache_dir())
    except Exception:  # noqa: BLE001
        pass

    from bert_vits2_tpu.compat.torch_import import (
        import_generator_checkpoint,
    )
    from bert_vits2_tpu.infer.api import TTSEngine
    from bert_vits2_tpu.models import ModelConfig, Synthesizer
    from bert_vits2_tpu.utils.audio import write_wav

    print(f"checkpoint: {path}", file=sys.stderr)
    if args.config:
        from bert_vits2_tpu.compat.hparams import (
            get_hparams_from_file,
            model_config_from_hparams,
        )

        cfg = model_config_from_hparams(get_hparams_from_file(args.config))
    else:
        cfg = ModelConfig()
    cfg = dataclasses.replace(cfg, infer_compute_dtype="bfloat16")
    model = Synthesizer(cfg)
    # init a params skeleton (shapes only), then overwrite from the .pth
    b0, t_x0 = 1, 8
    rng0 = np.random.default_rng(0)
    init_params = model.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1),
         "dropout": jax.random.key(2)},
        jnp.asarray(rng0.integers(1, cfg.n_vocab, (b0, t_x0))),
        jnp.asarray([t_x0]),
        jnp.zeros((b0, 16, cfg.spec_channels), jnp.float32),
        jnp.asarray([16]),
        jnp.asarray([0]),
        jnp.zeros((b0, t_x0), jnp.int32),
        jnp.zeros((b0, t_x0), jnp.int32),
        jnp.zeros((b0, t_x0, cfg.bert_dim), jnp.float32),
        jnp.zeros((b0, t_x0, cfg.bert_dim), jnp.float32),
        jnp.zeros((b0, t_x0, cfg.bert_dim), jnp.float32),
        deterministic=True,
    )
    params, iteration, report = import_generator_checkpoint(
        path, init_params, strict=False)
    print(f"imported iteration {iteration}; "
          f"{len(report.get('loaded', report))} tensors, "
          f"missing={len(report.get('missing_torch', []))}",
          file=sys.stderr)

    engine = TTSEngine(model, params)
    os.makedirs(args.out_dir, exist_ok=True)

    out: dict = {"checkpoint": os.path.basename(path),
                 "iteration": int(iteration), "wavs": []}
    total_audio_s = 0.0
    for lang, text in SAMPLES:
        try:
            wave = engine.infer(text, args.speaker, language=lang)
        except Exception as e:  # noqa: BLE001 - e.g. missing BERT assets
            print(f"  {lang}: failed ({e})", file=sys.stderr)
            continue
        f = os.path.join(args.out_dir, f"demo_{lang.lower()}.wav")
        write_wav(f, wave, engine.sampling_rate)
        secs = len(wave) / engine.sampling_rate
        total_audio_s += secs
        out["wavs"].append({"path": f, "lang": lang,
                            "audio_s": round(secs, 2)})
        print(f"  {lang}: {f} ({secs:.2f}s)", file=sys.stderr)

    # delivered-throughput with TRAINED durations: replicate one prepared
    # request into a batch, time the warm loop, count predicted lengths
    if out["wavs"]:
        req = engine.prepare(SAMPLES[0][1], args.speaker,
                             language=SAMPLES[0][0])
        reqs = [req] * args.bench_batch
        waves = engine.run_prepared(reqs)  # compile + warm
        t0 = time.perf_counter()
        for _ in range(args.iters):
            waves = engine.run_prepared(reqs)
        dt = (time.perf_counter() - t0) / args.iters
        delivered = sum(len(w) for w in waves) / engine.sampling_rate
        out["delivered_audio_s_per_s_trained"] = round(delivered / dt, 1)
        out["bench_batch"] = args.bench_batch

    # (b) mel-parity vs the reference torch model on the SAME weights
    # (BASELINE.md north-star row 2; reference deps are stubbed so this
    # runs offline — tools/parity_reference.py)
    if not args.no_parity:
        import subprocess

        cmd = [sys.executable,
               os.path.join(REPO, "tools/parity_reference.py"),
               "--ckpt", os.path.abspath(path), "--json"]
        if args.config:
            cmd += ["--config", os.path.abspath(args.config)]
        p = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
        print(p.stderr[-2000:], file=sys.stderr)
        parity = None
        for line in reversed(p.stdout.strip().splitlines()):
            if line.startswith("{"):
                try:
                    parity = json.loads(line)
                    break
                except json.JSONDecodeError:
                    continue
        if parity:
            out["mel_err"] = parity["mel_max_abs_err"]
            out["mel_parity_ok"] = parity["mel_parity_ok"]
        else:
            out["mel_err"] = None
            out["parity_error"] = f"rc={p.returncode}"

    # (c) onnxruntime over the exported graphs, when installable
    try:
        import onnxruntime  # noqa: F401

        from bert_vits2_tpu.compat.onnx_export import export_onnx
        from bert_vits2_tpu.compat.onnx_infer import OnnxTTSPipeline

        onnx_dir = os.path.join(args.out_dir, "onnx")
        export_onnx(model, params, onnx_dir, name="demo", t_x=32,
                    max_frames=256)
        tts = OnnxTTSPipeline(onnx_dir, name="demo")
        t = 9
        rng0 = np.random.default_rng(0)
        ones = np.ones((1, t), np.int64)
        w, _ = tts(
            rng0.integers(1, cfg.n_vocab, (1, t)), ones, ones,
            rng0.normal(size=(1, t, cfg.bert_dim)).astype(np.float32),
            rng0.normal(size=(1, t, cfg.bert_dim)).astype(np.float32),
            rng0.normal(size=(1, t, cfg.bert_dim)).astype(np.float32),
            np.asarray([0]),
        )
        out["onnx_ok"] = bool(np.isfinite(np.asarray(w)).all())
    except ImportError:
        out["onnx_ok"] = "skipped (onnxruntime not installed in image)"
    except Exception as e:  # noqa: BLE001 - report, don't crash the demo
        out["onnx_ok"] = f"failed: {e}"

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
