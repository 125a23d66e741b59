"""Numerical parity check vs the reference PyTorch implementation.

Builds the reference SynthesizerTrn (random init, fixed seed), converts its
state_dict through compat.torch_import, and compares deterministic inference
(noise_scale=0, noise_scale_w=0, sdp_ratio=0) between torch and JAX. Target:
waveform max-abs-err <= 1e-2, mel-domain err <= 1e-2 (BASELINE.md).

Run manually (needs /root/reference mounted):
    python tools/parity_reference.py
Not part of tests/ because it imports the reference repo.
"""

from __future__ import annotations

import os
import sys
import types

os.environ.setdefault("JAX_PLATFORMS", "cpu")

REF = "/root/reference"


def _stub_reference_deps():
    """Stub numba + HF downloads so the reference imports in this image."""
    fake = types.ModuleType("numba")

    class _T:
        def __getitem__(self, item):
            return None

        def __call__(self, *a, **k):
            return None

    for t in ["void", "boolean", "float32", "int32", "int64", "float64", "uint8"]:
        setattr(fake, t, _T())
    fake.jit = lambda *a, **k: (a[0] if a and callable(a[0]) else (lambda f: f))
    fake.njit = fake.jit
    fake.prange = range
    sys.modules["numba"] = fake
    import huggingface_hub

    huggingface_hub.hf_hub_download = lambda *a, **k: None


def _ref_workdir() -> str:
    """The reference's config.py singleton wants ./config.yml + ./bert/ at cwd."""
    import shutil

    work = "/tmp/bvt_parity_ref"
    os.makedirs(os.path.join(work, "bert"), exist_ok=True)
    if not os.path.exists(os.path.join(work, "config.yml")):
        shutil.copy(os.path.join(REF, "default_config.yml"),
                    os.path.join(work, "config.yml"))
    dst = os.path.join(work, "bert", "bert_models.json")
    if not os.path.exists(dst):
        shutil.copy(os.path.join(REF, "bert", "bert_models.json"), dst)
    return work


def main(argv=None):
    import argparse

    import numpy as np
    import torch

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", default=None,
                    help="load this G_*.pth into BOTH models (trained-"
                         "checkpoint parity, BASELINE.md north-star row 2); "
                         "default: random-init reference weights")
    ap.add_argument("--config", default=None,
                    help="config.json for the checkpoint (default: the "
                         "reference repo's configs/config.json)")
    ap.add_argument("--json", action="store_true",
                    help="print one machine-readable JSON line at the end")
    args = ap.parse_args(argv)

    _stub_reference_deps()
    os.chdir(_ref_workdir())
    sys.path.insert(0, REF)

    import utils as ref_utils

    config_path = args.config or os.path.join(REF, "configs/config.json")
    hps = ref_utils.get_hparams_from_file(config_path)
    from models import SynthesizerTrn as RefSynth
    from text.symbols import symbols as ref_symbols

    torch.manual_seed(0)
    net_g = RefSynth(
        len(ref_symbols),
        hps.data.filter_length // 2 + 1,
        hps.train.segment_size // hps.data.hop_length,
        n_speakers=hps.data.n_speakers,
        **hps.model,
    ).eval()
    if args.ckpt:
        # the reference's own loader (handles its key quirks, utils.py:90-109)
        ref_utils.load_checkpoint(args.ckpt, net_g, None, skip_optimizer=True)
        net_g.eval()

    # ---- inputs (batch=1, deterministic) ----
    rng = np.random.default_rng(7)
    t_x = 37
    phones = rng.integers(1, len(ref_symbols), t_x)
    tones = rng.integers(0, 12, t_x)
    langs = rng.integers(0, 3, t_x)
    bert = rng.normal(size=(1024, t_x)).astype(np.float32)
    ja_bert = rng.normal(size=(1024, t_x)).astype(np.float32)
    en_bert = rng.normal(size=(1024, t_x)).astype(np.float32)
    sid = 3

    with torch.no_grad():
        wave_t, attn_t, y_mask_t, _ = net_g.infer(
            torch.from_numpy(phones[None]).long(),
            torch.tensor([t_x]),
            torch.tensor([sid]),
            torch.from_numpy(tones[None]).long(),
            torch.from_numpy(langs[None]).long(),
            torch.from_numpy(bert[None]),
            torch.from_numpy(ja_bert[None]),
            torch.from_numpy(en_bert[None]),
            noise_scale=0.0,
            length_scale=1.0,
            noise_scale_w=0.0,
            sdp_ratio=0.0,
        )
    wave_t = wave_t[0, 0].numpy()
    y_len_t = int(attn_t.sum())

    if args.ckpt:
        sd_path = args.ckpt
    else:
        sd_path = "/tmp/bvt_parity_ref/G_0.pth"
        torch.save({"model": net_g.state_dict(), "iteration": 0,
                    "learning_rate": 2e-4, "optimizer": None}, sd_path)

    # ---- JAX side ----
    sys.path.insert(0, "/root/repo")
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from bert_vits2_tpu.compat import import_generator_checkpoint
    from bert_vits2_tpu.compat.hparams import (
        get_hparams_from_file,
        model_config_from_hparams,
    )
    from bert_vits2_tpu.models import Synthesizer

    jhps = get_hparams_from_file(os.path.join(REF, "configs/config.json"))
    cfg = model_config_from_hparams(jhps)
    model = Synthesizer(cfg)

    x = jnp.asarray(phones[None])
    init_rngs = {"params": jax.random.key(0), "noise": jax.random.key(1),
                 "dropout": jax.random.key(2)}
    spec = jnp.zeros((1, 16, cfg.spec_channels), jnp.float32)
    params0 = model.init(
        init_rngs, x, jnp.asarray([t_x]), spec, jnp.asarray([16]),
        jnp.asarray([sid]), jnp.asarray(tones[None]), jnp.asarray(langs[None]),
        jnp.asarray(bert.T[None]), jnp.asarray(ja_bert.T[None]),
        jnp.asarray(en_bert.T[None]), deterministic=True,
    )
    params, it, report = import_generator_checkpoint(sd_path, params0)
    print("imported iteration", it, "| unmatched:", len(report["unmatched"]))

    max_frames = ((y_len_t + 63) // 64) * 64
    wave_j, attn_j, y_mask_j, y_len_j = model.apply(
        params, x, jnp.asarray([t_x]), jnp.asarray([sid]),
        jnp.asarray(tones[None]), jnp.asarray(langs[None]),
        jnp.asarray(bert.T[None]), jnp.asarray(ja_bert.T[None]),
        jnp.asarray(en_bert.T[None]), max_frames,
        noise_scale=0.0, noise_scale_w=0.0, sdp_ratio=0.0,
        method=Synthesizer.infer, rngs={"noise": jax.random.key(3)},
    )
    wave_j = np.asarray(wave_j)[0]
    y_len_j = int(np.asarray(y_len_j)[0])

    print(f"y_len torch={y_len_t} jax={y_len_j}")
    n = min(len(wave_t), y_len_j * cfg.hop_length)
    err = np.abs(wave_t[:n] - wave_j[:n]).max()
    denom = np.abs(wave_t[:n]).max()
    print(f"wave max-abs-err={err:.3e} (signal max {denom:.3e}) over {n} samples")

    # mel-spectrogram parity — the BASELINE.md north-star metric (allclose
    # atol 1e-2 vs the reference on the same weights). Same mel transform on
    # both waveforms (ops/stft.py bit-matches mel_processing.py).
    from bert_vits2_tpu.ops.stft import mel_spectrogram

    def mel(w):
        return np.asarray(mel_spectrogram(
            jnp.asarray(w[None], jnp.float32), 2048, 128, 44100, 512, 2048,
            0.0, None))

    mel_err = float(np.abs(mel(wave_t[:n]) - mel(wave_j[:n])).max())
    print(f"log-mel max-abs-err={mel_err:.3e}")
    if args.json:
        import json

        print(json.dumps({
            "checkpoint": os.path.basename(sd_path),
            "wave_max_abs_err": float(err),
            "mel_max_abs_err": mel_err,
            "y_len_torch": y_len_t, "y_len_jax": y_len_j,
            "mel_parity_ok": bool(mel_err <= 1e-2 and y_len_t == y_len_j),
        }))
    assert y_len_t == y_len_j, "predicted lengths differ"
    assert err <= 1e-2, f"waveform parity failed: {err}"
    print("PARITY OK")


if __name__ == "__main__":
    main()
