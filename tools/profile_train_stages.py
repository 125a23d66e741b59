"""Per-stage roofline of the fused GAN train step (VERDICT r3 item 4).

Times each stage of the training step (reference hot loop
train_ms.py:422-607) in isolation on the real chip with the device-loop
difference method (tools/_timing.py — host/relay dispatch cancels), reads
XLA cost-analysis FLOPs per stage, and prints a markdown table of
(FLOPs, device ms, TFLOP/s, % of chip peak) plus the full-step number.

Stage boundaries follow train/step.py: generator forward pieces (enc_p,
enc_q/WN, flow, MAS, duration predictors, 32-frame decoder slice), loss
inputs (mel spectrograms), the three discriminators (MPD, DurD,
WavLM embed + WavLM disc), and the full fused step for the total. Forward
times are measured directly; the backward+optimizer share is the fused
step minus the forwards (reported as the residual row).

Usage: python tools/profile_train_stages.py [--no-slm]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools._timing import device_timeit, setup_cache  # noqa: E402

PEAK_TFLOPS = {"v5 lite": 197.0, "v5litepod": 197.0, "v5e": 197.0,
               "v5p": 459.0, "v4": 275.0, "v6": 918.0}


def peak_for(kind: str) -> float | None:
    k = kind.lower()
    for sub, v in PEAK_TFLOPS.items():
        if sub in k:
            return v
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-slm", action="store_true")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=512)
    args = ap.parse_args()

    setup_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _full_config
    from bert_vits2_tpu.models import WavLMDiscriminator
    from bert_vits2_tpu.models.slm import WavLMConfig, WavLMJax, make_slm_fns
    from bert_vits2_tpu.models.synthesizer import Synthesizer
    from bert_vits2_tpu.ops.align import maximum_path_auto
    from bert_vits2_tpu.ops.stft import mel_spectrogram, spec_to_mel
    from bert_vits2_tpu.train import (
        DataConfig, Models, TrainConfig, init_train_state, make_train_step,
    )
    from bert_vits2_tpu.train.trainer import build_models, init_params

    dev = jax.devices()[0]
    peak = peak_for(dev.device_kind) or 197.0
    cfg = dataclasses.replace(_full_config(), train_compute_dtype="bfloat16")
    data_cfg = DataConfig()
    train_cfg = TrainConfig(bf16_run=True)
    b, t_x, t_y = args.batch, 128, args.frames
    hop = data_cfg.hop_length
    seg = cfg.segment_size
    rng = np.random.default_rng(0)

    models = build_models(cfg, use_dur_disc=True, use_wavlm_disc=True)
    slm_embed = slm_feature_fn = None
    wl_params = None
    if not args.no_slm:
        wl_cfg = WavLMConfig()
        with jax.default_device(jax.devices("cpu")[0]):
            wl_params = WavLMJax(wl_cfg).init(
                jax.random.key(5), jnp.zeros((1, 6400)))["params"]
            models = Models(
                models.synthesizer, models.mpd, models.dur_disc,
                WavLMDiscriminator(
                    slm_hidden=wl_cfg.hidden_size,
                    slm_layers=wl_cfg.num_layers + 1,
                    initial_channel=cfg.slm_initial_channel))
            slm_embed, slm_feature_fn = make_slm_fns(wl_params, wl_cfg)
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_params(models, cfg, slm_embed=slm_embed)
    params = jax.device_put(params, dev)
    synth, mpd, dur_disc, wavlm_disc = models
    p_g, p_d, p_dd, p_wd = params

    batch = {
        "x": jnp.asarray(rng.integers(1, cfg.n_vocab, (b, t_x))),
        "x_lengths": jnp.asarray([t_x] * b),
        "spec": jnp.asarray(
            rng.normal(size=(b, t_y, cfg.spec_channels)) * 0.1, jnp.float32),
        "spec_lengths": jnp.asarray([t_y] * b),
        "wave": jnp.asarray(
            rng.uniform(-0.5, 0.5, (b, t_y * hop)), jnp.float32),
        "sid": jnp.asarray(rng.integers(0, cfg.n_speakers, (b,))),
        "tone": jnp.asarray(rng.integers(0, cfg.num_tones, (b, t_x))),
        "language": jnp.asarray(
            rng.integers(0, cfg.num_languages, (b, t_x))),
        "bert": jnp.asarray(
            rng.normal(size=(b, t_x, cfg.bert_dim)), jnp.float32),
        "ja_bert": jnp.asarray(
            rng.normal(size=(b, t_x, cfg.bert_dim)), jnp.float32),
        "en_bert": jnp.asarray(
            rng.normal(size=(b, t_x, cfg.bert_dim)), jnp.float32),
    }
    batch = jax.device_put(batch, dev)

    inter, hid = cfg.inter_channels, cfg.hidden_channels
    key = jax.random.key(0)
    g_vec = jnp.zeros((b, cfg.gin_channels), jnp.float32)
    x_h = jnp.asarray(rng.normal(size=(b, t_x, hid)), jnp.float32)
    x_mask = jnp.ones((b, t_x), jnp.float32)
    z = jnp.asarray(rng.normal(size=(b, t_y, inter)), jnp.float32)
    y_mask = jnp.ones((b, t_y), jnp.float32)
    m_p = jnp.asarray(rng.normal(size=(b, t_x, inter)), jnp.float32)
    logs_p = jnp.asarray(rng.normal(size=(b, t_x, inter)) * 0.1, jnp.float32)
    z_slice = jnp.asarray(rng.normal(size=(b, seg, inter)), jnp.float32)
    y_wave = batch["wave"][:, : seg * hop][:, None, :]

    stages: dict[str, tuple] = {}

    def add(name, fn, *a):
        jfn = jax.jit(fn)
        out = jfn(*a)
        jax.block_until_ready(out)
        # long loops: sub-5ms stages need hundreds of iterations for the
        # difference method to rise above relay-jitter on the fixed cost
        t = device_timeit(jfn, *a, n1=8, n2=64)
        try:
            fl = jfn.lower(*a).compile().cost_analysis()["flops"]
        except Exception:  # noqa: BLE001
            fl = float("nan")
        stages[name] = (t, fl)
        print(f"  {name}: {t*1e3:.2f} ms, {fl/1e9:.1f} GF, "
              f"{fl/t/1e12:.1f} TF/s ({100*fl/t/1e12/peak:.1f}%)",
              flush=True)

    print(f"device {dev.device_kind}, peak {peak} TF/s; "
          f"b={b}, t_x={t_x}, t_y={t_y}, bf16", flush=True)

    add("enc_p (text encoder)",
        lambda bert: synth.apply(
            {"params": p_g}, batch["x"], batch["x_lengths"], batch["tone"],
            batch["language"], bert, batch["ja_bert"], batch["en_bert"],
            g=g_vec, deterministic=True,
            method=lambda m, *a, **k: m.enc_p(*a, **k)),
        batch["bert"])
    add("enc_q (posterior WN)",
        lambda spec: synth.apply(
            {"params": p_g}, spec, batch["spec_lengths"], g=g_vec,
            deterministic=True, rngs={"noise": key},
            method=lambda m, *a, **k: m.enc_q(*a, **k)),
        batch["spec"])
    add("flow (4 transformer couplings)",
        lambda zz: synth.apply(
            {"params": p_g}, zz, y_mask, g=g_vec, deterministic=True,
            method=lambda m, *a, **k: m.flow(*a, **k)),
        z)

    def mas_fn(z_p):
        o_scale = jnp.exp(-2.0 * logs_p)
        neg4 = -0.5 * jnp.einsum("btd,bsd->bts", z_p**2, o_scale)
        neg3 = jnp.einsum("btd,bsd->bts", z_p, m_p * o_scale)
        neg2 = (-0.5 * jnp.sum(m_p**2 * o_scale, -1) -
                jnp.sum(logs_p, -1))[:, None, :]
        neg_cent = neg4 + neg3 + neg2
        return maximum_path_auto(
            neg_cent, jnp.asarray([t_y] * b), jnp.asarray([t_x] * b))

    add("MAS (neg_cent + Pallas DP)", mas_fn, z)
    w_dur = jnp.abs(
        jnp.asarray(rng.standard_normal((b, t_x, 1)), jnp.float32))
    add("sdp+dp (duration losses)",
        lambda xh: synth.apply(
            {"params": p_g}, xh, w_dur,
            deterministic=False,
            rngs={"noise": key, "dropout": jax.random.key(9)},
            method=lambda m, xh_, w, **k: (
                m.sdp(xh_, x_mask, w=w, g=g_vec, **k),
                m.dp(xh_, x_mask, g=g_vec, **k),
                m.sdp(xh_, x_mask, reverse=True, noise_scale=1.0,
                      g=g_vec, **k))),
        x_h)
    add("dec (HiFi-GAN, 32-frame slice)",
        lambda zs: synth.apply(
            {"params": p_g}, zs, g=g_vec,
            method=lambda m, zz, **k: m.dec(zz, **k)),
        z_slice)
    mel_kw = (data_cfg.n_mel_channels, data_cfg.sampling_rate,
              data_cfg.mel_fmin, data_cfg.mel_fmax)
    add("mel losses (2x STFT+mel)",
        lambda w: (spec_to_mel(batch["spec"][:, :seg],
                               data_cfg.filter_length, *mel_kw),
                   mel_spectrogram(w[:, 0], data_cfg.filter_length,
                                   mel_kw[0], mel_kw[1], hop,
                                   data_cfg.win_length, mel_kw[2],
                                   mel_kw[3])),
        y_wave)
    add("MPD+MSD fwd (real+fake)",
        lambda yh: mpd.apply({"params": p_d}, y_wave[:, 0], yh[:, 0]),
        y_wave)
    add("DurD fwd (2 scorings)",
        lambda xh: dur_disc.apply(
            {"params": p_dd}, xh, x_mask, w_dur, w_dur, g=g_vec),
        x_h)
    if slm_embed is not None:
        # WavLM params ride as ARGUMENTS: closing over the 95M-param tree
        # embeds ~380MB of constants in the HLO and the remote compile
        # service rejects the request (HTTP 413)
        wl_dev = jax.device_put(slm_embed.params, dev)
        add("WavLM embed (resample+WavLM)",
            lambda p, w: slm_embed(p, w[:, 0]), wl_dev, y_wave)
        emb_shape = jax.eval_shape(
            lambda p, w: slm_embed(p, w[:, 0]), wl_dev, y_wave)
        emb = jnp.zeros(emb_shape.shape, jnp.float32)
        add("WavLM disc fwd",
            lambda pw, e: wavlm_disc.apply({"params": pw}, e), p_wd, emb)

    # full fused step (all four updates; the real thing)
    state = init_train_state(
        models, train_cfg, *params,
        params_slm=(jax.device_put(slm_embed.params, dev)
                    if slm_embed is not None else None))
    state = jax.device_put(state, dev)
    step_raw = make_train_step(
        models, train_cfg, data_cfg, cfg.segment_size, slm_embed=slm_embed,
        slm_feature_fn=slm_feature_fn, donate=False, jit=False)
    import functools

    @jax.jit
    def loop(state, batch, k, lr, n):
        # traced trip count: ONE compile serves both loop lengths
        def body(i, carry):
            st, _ = carry
            st2, m = step_raw(st, batch, jax.random.fold_in(k, i), lr)
            return (st2, m["loss/g/total"])
        return jax.lax.fori_loop(0, n, body, (state, jnp.float32(0.0)))

    import time as _time
    lr = jnp.float32(2e-4)
    print("compiling fused step loop ...", flush=True)
    np.asarray(loop(state, batch, key, lr, jnp.int32(2))[1])
    np.asarray(loop(state, batch, key, lr, jnp.int32(6))[1])

    def t_loop(n):
        t0 = _time.perf_counter()
        np.asarray(loop(state, batch, key, lr, jnp.int32(n))[1])
        return _time.perf_counter() - t0

    t1 = min(t_loop(2) for _ in range(2))
    t2 = min(t_loop(6) for _ in range(2))
    step_t = (t2 - t1) / 4
    try:
        # per-step FLOPs from a single-step AOT compile of the raw step
        step_fl = jax.jit(step_raw).lower(
            state, batch, key, lr).compile().cost_analysis()["flops"]
    except Exception:  # noqa: BLE001
        step_fl = float("nan")
    stages["FULL fused GAN step (fwd+bwd+4 opt)"] = (step_t, step_fl)

    fwd_t = sum(t for name, (t, _) in stages.items() if "FULL" not in name)
    fwd_fl = sum(f for name, (_, f) in stages.items()
                 if "FULL" not in name and f == f)
    stages["residual (backward + optimizer + fusion deltas)"] = (
        step_t - fwd_t, step_fl - fwd_fl if step_fl == step_fl else
        float("nan"))

    print("\n| stage | device ms | GFLOP | TFLOP/s | % peak |")
    print("|---|---|---|---|---|")
    for name, (t, fl) in stages.items():
        tf = fl / t / 1e12 if fl == fl and t > 0 else float("nan")
        print(f"| {name} | {t*1e3:.2f} | {fl/1e9:.1f} | {tf:.1f} | "
              f"{100*tf/peak:.1f} |")
    print(f"\nfull step: {1.0/step_t:.2f} steps/s device-time, "
          f"{step_fl/step_t/1e12:.1f} TF/s = "
          f"{100*step_fl/step_t/1e12/peak:.1f}% of {peak} TF/s peak")
    return 0


if __name__ == "__main__":
    sys.exit(main())
