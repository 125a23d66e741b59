"""Tiny-corpus convergence proof: overfit a handful of synthetic utterances
and record the loss trajectory (reference analog: `evaluate()` during training,
train_ms.py:742-835 — the only end-to-end check that the training math works,
not just the shapes).

Synthesizes a deterministic procedural "speech": each phone id maps to a fixed
fundamental + formant mix, so audio is a learnable function of the phone
sequence. Runs the full fused GAN step (dur-disc on; SLM off — no WavLM
weights ship in this image, and the convergence signal is the mel/dur/kl
trajectory) at REAL model geometry on whatever backend `jax.devices()[0]` is.

Usage:
    python tools/overfit_tiny.py --steps 300 --out docs/CONVERGENCE.md
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def build_corpus(root: str, n_utts: int = 32, sr: int = 44100, seed: int = 0):
    """-> filelist path. Deterministic phone->audio mapping."""
    import numpy as np
    from scipy.io import wavfile

    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    rows = []
    phones_pool = ["a", "i", "u", "e", "o", "k", "s", "t", "n", "m"]
    for idx in range(n_utts):
        n_ph = int(rng.integers(6, 14))
        phones = [phones_pool[int(p)] for p in rng.integers(0, 10, n_ph)]
        tones = [int(t) for t in rng.integers(0, 2, n_ph)]
        # 0.12 s per phone: f0 + two formant-ish partials per phone id
        seg = int(0.12 * sr)
        audio = np.zeros(n_ph * seg, np.float32)
        t = np.arange(seg) / sr
        for j, ph in enumerate(phones):
            pid = phones_pool.index(ph)
            f0 = 110.0 * (1 + 0.25 * pid) * (1.15 if tones[j] else 1.0)
            w = (
                0.4 * np.sin(2 * np.pi * f0 * t)
                + 0.2 * np.sin(2 * np.pi * 2.7 * f0 * t)
                + 0.1 * np.sin(2 * np.pi * 5.3 * f0 * t)
            )
            env = np.hanning(seg)
            audio[j * seg : (j + 1) * seg] = (w * env).astype(np.float32)
        path = os.path.join(root, f"utt{idx}.wav")
        wavfile.write(path, sr, (audio * 32767 * 0.6).astype(np.int16))
        # fixed (deterministic) stand-in BERT features keyed by utterance
        t_ph = len(phones) * 2 + 1  # add_blank doubles + 1
        bert = np.random.default_rng(1000 + idx).normal(
            size=(t_ph, 1024)
        ).astype(np.float32)
        np.save(path.replace(".wav", ".bert.npy"), bert)
        w2p = " ".join(["1"] * n_ph)  # sum(word2ph) == len(phones)
        rows.append(
            f"{path}|spk0|ZH|synthetic|{' '.join(phones)}|"
            f"{' '.join(map(str, tones))}|{w2p}"
        )
    filelist = os.path.join(root, "train.list")
    with open(filelist, "w", encoding="utf-8") as f:
        f.write("\n".join(rows))
    return filelist


def write_config(root: str, filelist: str, batch_size: int = 8) -> str:
    config = dict(
        version="2.3",
        train=dict(
            log_interval=10, eval_interval=10_000, seed=7, epochs=10_000,
            learning_rate=2e-4, betas=[0.8, 0.99], eps=1e-9,
            batch_size=batch_size, bf16_run=True, lr_decay=0.99995,
            segment_size=16384, c_mel=45, c_kl=1.0,
        ),
        data=dict(
            training_files=filelist, validation_files=filelist,
            sampling_rate=44100, filter_length=2048, hop_length=512,
            win_length=2048, n_mel_channels=128, mel_fmin=0.0, mel_fmax=None,
            add_blank=True, n_speakers=4, spk2id=dict(spk0=0),
        ),
        # full v2.3 geometry (configs/config.json:895-947)
        model=dict(
            hidden_channels=192, filter_channels=768, n_heads=2, n_layers=6,
            kernel_size=3, p_dropout=0.1, resblock="1",
            resblock_kernel_sizes=[3, 7, 11],
            resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
            upsample_rates=[8, 8, 2, 2, 2], upsample_initial_channel=512,
            upsample_kernel_sizes=[16, 16, 8, 2, 2], n_layers_q=3,
            use_spectral_norm=False, gin_channels=512,
            use_spk_conditioned_encoder=True, use_noise_scaled_mas=True,
            use_transformer_flow=True, n_layers_trans_flow=4,
            inter_channels=192,
        ),
    )
    cfg_path = os.path.join(root, "config.json")
    with open(cfg_path, "w", encoding="utf-8") as f:
        json.dump(config, f)
    return cfg_path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--root", default="/tmp/bvt_overfit")
    p.add_argument("--out", default=None, help="write a markdown report here")
    p.add_argument("--no-slm", action="store_true", default=True)
    args = p.parse_args()

    import numpy as np

    filelist = build_corpus(args.root, seed=0)
    cfg_path = write_config(args.root, filelist, args.batch_size)

    from bert_vits2_tpu.train.trainer import Trainer

    model_dir = os.path.join(args.root, "run")
    trainer = Trainer(cfg_path, model_dir, slm_path=None)

    # instrument: capture metrics every step by wrapping step_fn
    history: list[dict] = []
    inner = trainer.step_fn

    def wrapped(state, batch, rng, lr):
        new_state, metrics = inner(state, batch, rng, lr)
        history.append(metrics)
        return new_state, metrics

    trainer.step_fn = wrapped
    t0 = time.time()
    trainer.run(max_steps=args.steps, log_interval=50, eval_interval=10**9)
    dt = time.time() - t0

    # pull the floats off-device at the end (keeps the hot loop async)
    hist = [
        {k: float(np.asarray(v)) for k, v in m.items()} for m in history
    ]
    keys = ["loss/g/mel", "loss/g/dur", "loss/g/kl", "loss/g/total",
            "loss/d/total"]

    def window(h, lo, hi):
        sel = h[lo:hi]
        return {k: sum(m[k] for m in sel) / max(len(sel), 1) for k in keys}

    first = window(hist, 0, 10)
    last = window(hist, -10, None)
    report = {
        "steps": len(hist),
        "wall_s": round(dt, 1),
        "steps_per_s": round(len(hist) / dt, 3),
        "first10_avg": {k: round(v, 3) for k, v in first.items()},
        "last10_avg": {k: round(v, 3) for k, v in last.items()},
        "mel_improvement": round(first["loss/g/mel"] - last["loss/g/mel"], 3),
        "converged": bool(
            last["loss/g/mel"] < first["loss/g/mel"] * 0.7
            and last["loss/g/dur"] < first["loss/g/dur"]
        ),
    }
    print(json.dumps(report))

    if args.out:
        lines = [
            "# Tiny-corpus convergence proof",
            "",
            f"32 synthetic utterances (deterministic phone->audio mapping), "
            f"full v2.3 geometry, fused GAN step (bf16, dur-disc on, SLM off "
            f"— no WavLM weights in this image), {len(hist)} steps on "
            f"`{__import__('jax').devices()[0].device_kind}`.",
            "",
            "| metric | first-10 avg | last-10 avg |",
            "|---|---|---|",
        ]
        for k in keys:
            lines.append(f"| {k} | {first[k]:.3f} | {last[k]:.3f} |")
        lines += [
            "",
            f"steps/s: {report['steps_per_s']}, wall: {report['wall_s']} s, "
            f"converged: **{report['converged']}**",
            "",
            "Loss trajectory (every 10th step, loss/g/mel):",
            "```",
            " ".join(f"{hist[i]['loss/g/mel']:.2f}"
                     for i in range(0, len(hist), 10)),
            "```",
        ]
        with open(args.out, "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")
        print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
