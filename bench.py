"""Benchmark: synthesis + training throughput on one chip.

Prints ONE JSON line (stdout); progress goes to stderr. Primary metric is
PEAK batched synthesis throughput in audio-seconds per wall-second per chip,
accounted at bucket capacity — every padded frame is genuinely synthesized
(static shapes), so this is the chip's work rate. Alongside it the same JSON
reports the honest serving numbers:

  delivered_audio_s_per_s  sum(y_lengths)-based throughput at a realistic
                           ~3.5 frames/token speech rate (no trained
                           checkpoint ships in this image, so durations are
                           length_scale-calibrated to match real speech;
                           see notes field)
  padding_efficiency       delivered / capacity for the headline shape
  mfu_pct                  XLA cost-analysis FLOPs / wall / peak(chip)
  sweep                    batch x frame-cap capacity grid
  train                    full-geometry fused GAN step (bf16, SLM branch on
                           with geometry-identical random WavLM): steps/s and
                           utterance audio-s/s consumed (reference hot loop
                           train_ms.py:422-607)

North-star baseline is 10x realtime per chip (BASELINE.md):
vs_baseline = peak / 10.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1500"))
T0 = time.monotonic()

# bf16 peak TFLOP/s per chip by device_kind substring
PEAK_TFLOPS = [
    ("v6", 918.0), ("trillium", 918.0),
    ("v5p", 459.0), ("v5 p", 459.0),
    ("v5e", 197.0), ("v5 lite", 197.0), ("v5litepod", 197.0),
    ("v4", 275.0),
]


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def budget_left() -> float:
    return BUDGET_S - (time.monotonic() - T0)


def peak_tflops(device_kind: str) -> float | None:
    k = device_kind.lower()
    for sub, v in PEAK_TFLOPS:
        if sub in k:
            return v
    return None


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _full_config, _text_batch
    from bert_vits2_tpu.models import Synthesizer

    # persistent compilation cache: repeat bench runs (and the driver's
    # end-of-round run) skip the multi-minute XLA compiles
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get(
                "JAX_COMPILATION_CACHE_DIR",
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache"),
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception as e:  # noqa: BLE001 - cache is an optimization only
        log(f"compilation cache unavailable: {e}")

    dev = jax.devices()[0]
    out: dict = {}

    # production serving config: bf16 flow+vocoder (params fp32, durations
    # fp32; ModelConfig.infer_compute_dtype). Parity tests use fp32.
    cfg = dataclasses.replace(_full_config(), infer_compute_dtype="bfloat16")
    model = Synthesizer(cfg)
    sr, hop = 44100, cfg.hop_length

    b0, t_x, frames0 = 16, 128, 1024
    batch = _text_batch(cfg, b0, t_x)
    spec = jnp.zeros((b0, 32, cfg.spec_channels), jnp.float32)
    init_rngs = {
        "params": jax.random.key(0),
        "noise": jax.random.key(1),
        "dropout": jax.random.key(2),
    }
    # init on host CPU: eager init over the axon relay dispatches thousands
    # of tiny ops with a network round trip each; one device_put is cheap
    with jax.default_device(jax.devices("cpu")[0]):
        params = model.init(
            init_rngs,
            batch["x"], batch["x_lengths"], spec, jnp.asarray([32] * b0),
            batch["sid"], batch["tone"], batch["language"],
            batch["bert"], batch["ja_bert"], batch["en_bert"],
            deterministic=True,
        )
    params = jax.device_put(params, dev)
    # fused Pallas MRF weights (vocoder tail fast path; +28% e2e on v5e —
    # tools/profile_mrf.py): same parameters, weight-norm resolved
    from bert_vits2_tpu.ops.mrf_pallas import pack_generator_mrf

    mrf_packed = jax.device_put(
        pack_generator_mrf(
            params["params"]["dec"], cfg.resblock_kernel_sizes,
            cfg.resblock_dilation_sizes, cfg.upsample_rates,
            cfg.upsample_initial_channel, cfg.infer_compute_dtype,
        ),
        dev,
    )

    def make_synth(max_frames: int, length_scale: float):
        @jax.jit
        def synth(params, batch, rng, mrf_packed):
            wave, _, _, y_lengths = model.apply(
                params,
                batch["x"], batch["x_lengths"], batch["sid"], batch["tone"],
                batch["language"], batch["bert"], batch["ja_bert"],
                batch["en_bert"], max_frames,
                length_scale=length_scale,
                mrf_packed=mrf_packed,
                method=Synthesizer.infer,
                rngs={"noise": rng},
            )
            return wave, y_lengths

        return synth

    def run_shape(b: int, max_frames: int, length_scale: float, iters: int):
        """-> (capacity audio-s/s, delivered audio-s/s, compiled_or_None)."""
        bt = _text_batch(cfg, b, t_x) if b != b0 else batch
        fn = make_synth(max_frames, length_scale)
        rng = jax.random.key(3)
        wave, y_len = fn(params, bt, rng, mrf_packed)  # compile + warmup
        y_len_h = np.minimum(np.asarray(y_len), max_frames)
        t0 = time.perf_counter()
        for i in range(iters):
            wave, y_len = fn(params, bt, jax.random.fold_in(rng, i),
                             mrf_packed)
        # drain with a SCALAR transfer: the waveform itself is tens of MB,
        # which over the axon dev tunnel takes seconds and swamps device
        # time (PCIe on a real deployment makes it negligible)
        np.asarray(jnp.sum(wave.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / iters
        capacity = b * max_frames * hop / sr / dt
        delivered = float(y_len_h.sum()) * hop / sr / dt
        compiled = None
        try:
            compiled = fn.lower(params, bt, rng, mrf_packed).compile()
        except Exception:  # noqa: BLE001 - cost analysis is best-effort
            pass
        return capacity, delivered, dt, compiled

    # ---- headline: b=16 x 1024-frame cap, realistic ~3.5 frames/token ----
    # (random-init dp predicts ~1 frame/token; length_scale=3.5 calibrates
    # durations to real speech: ~86 frames/s at ~25 phones+blanks/s)
    log("headline shape (16 x 128 tokens x 1024 frames) ...")
    capacity, delivered, dt, compiled = run_shape(b0, frames0, 3.5, 30)
    out["value"] = round(capacity, 3)
    out["delivered_audio_s_per_s"] = round(delivered, 3)
    out["padding_efficiency"] = round(delivered / capacity, 4)

    # MFU two ways:
    #  - mfu_model_pct: ANALYTIC model FLOPs (true useful work; counts the
    #    Pallas MRF kernels, excludes structural zeros) / wall / peak
    #  - hw_flops_pct:  XLA cost-analysis FLOPs of the compiled graph
    #    (hardware work XLA scheduled; excludes Pallas kernel FLOPs,
    #    includes time-fold zero padding) — kept for trend continuity
    peak = peak_tflops(dev.device_kind)
    out["device_kind"] = dev.device_kind
    model_fl = analytic_infer_flops(cfg, b0, t_x, frames0)
    out["model_tflop_per_call"] = round(model_fl / 1e12, 3)
    if peak:
        out["mfu_model_pct"] = round(100.0 * model_fl / dt / 1e12 / peak, 2)
    try:
        flops = compiled.cost_analysis()["flops"]
        tflops_s = flops / dt / 1e12
        out["infer_tflops_per_s"] = round(tflops_s, 2)
        if peak:
            out["hw_flops_pct"] = round(100.0 * tflops_s / peak, 2)
    except Exception as e:  # noqa: BLE001
        log(f"cost_analysis unavailable: {e}")

    # ---- training step first (higher value than the sweep): full geometry,
    # bf16, SLM branch ON ----
    try:
        if budget_left() < 200:
            raise TimeoutError("bench budget exhausted before train bench")
        out["train"] = train_bench(dev)
    except Exception as e:  # noqa: BLE001 - inference numbers still count
        log(f"train bench failed: {e}")
        out["train"] = {"error": str(e)[:200]}

    # ---- batch x frame-cap capacity sweep ----
    sweep = {}
    for b in (4, 8, 16, 32):
        for mf in (256, 512, 1024):
            if (b, mf) == (b0, frames0):
                sweep[f"{b}x{mf}"] = round(capacity, 1)
                continue
            if budget_left() < 240:
                sweep[f"{b}x{mf}"] = None  # skipped: bench budget
                continue
            cap, _, _, _ = run_shape(b, mf, 3.5, 8)
            sweep[f"{b}x{mf}"] = round(cap, 1)
            log(f"sweep {b}x{mf}: {cap:.1f} audio-s/s")
    out["sweep"] = sweep

    print(json.dumps({
        "metric": "audio_seconds_per_sec_per_chip",
        "unit": "audio-s/s/chip (peak, bucket capacity)",
        "vs_baseline": round(out["value"] / 10.0, 3),
        "notes": (
            "peak counts every synthesized bucket frame (static shapes); "
            "delivered uses predicted y_lengths at length_scale-calibrated "
            "~3.5 frames/token (no trained ckpt in image). D2H waveform "
            "transfer excluded: axon dev tunnel, not PCIe."
        ),
        **out,
    }))


def analytic_infer_flops(cfg, b: int, t_x: int, frames: int) -> float:
    """Analytic (useful) FLOPs of one batched infer call. Decoder convs
    dominate; encoder/flow/duration terms are included at matmul order.
    2 FLOPs per MAC."""
    h = cfg.hidden_channels
    f = cfg.filter_channels
    d = cfg.inter_channels
    fl = 0.0
    # text encoder: n_layers x (qkvo + conv-ffn k=3) + proj
    fl += cfg.n_layers * (4 * t_x * h * h + 2 * 3 * t_x * h * f
                          + 2 * t_x * t_x * h)
    fl += t_x * h * 2 * d
    # duration predictors (DDSConv stacks, kernel 3, filter 256): coarse
    fl += 10 * 3 * t_x * 256 * 256
    # transformer flow (reverse): n_layers_trans_flow couplings
    tf_layers = getattr(cfg, "n_layers_trans_flow", 4)
    fl += tf_layers * (4 * frames * h * h + 2 * 3 * frames * h * f
                       + 2 * frames * frames * h / 8  # banded attn window
                       + 2 * frames * h * d)
    # decoder
    ch0 = cfg.upsample_initial_channel
    fl += 7 * frames * d * ch0  # conv_pre
    t = frames
    c_in = ch0
    for i, (u, k) in enumerate(
        zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)
    ):
        ch = ch0 // (2 ** (i + 1))
        fl += k * t * c_in * ch  # ConvTranspose MACs (t_in taps)
        t *= u
        taps = sum(
            2 * len(ds) * kk
            for kk, ds in zip(
                cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes
            )
        )
        fl += taps * t * ch * ch  # MRF convs
        c_in = ch
    fl += 7 * t * c_in * 1  # conv_post
    return 2.0 * b * fl


def train_bench(dev) -> dict:
    """Full-geometry fused GAN step (reference train_ms.py:422-607): batch 16
    x 512 spec frames, bf16, dur-disc + SLM losses on (WavLM geometry equals
    wavlm-base-plus; random weights are FLOP-identical to the frozen
    original)."""
    import jax
    import jax.numpy as jnp

    from bert_vits2_tpu.models import WavLMDiscriminator
    from bert_vits2_tpu.models.slm import WavLMConfig, WavLMJax, make_slm_fns
    from bert_vits2_tpu.train import (
        DataConfig,
        Models,
        TrainConfig,
        init_train_state,
        make_train_step,
    )
    from bert_vits2_tpu.train.trainer import build_models, init_params
    from bert_vits2_tpu.compat.hparams import HParams  # noqa: F401  (docs)
    from __graft_entry__ import _full_config

    cfg = dataclasses.replace(_full_config(), train_compute_dtype="bfloat16")
    data_cfg = DataConfig()
    train_cfg = TrainConfig(bf16_run=True)
    models = build_models(cfg, use_dur_disc=True, use_wavlm_disc=True)

    wl_cfg = WavLMConfig()  # wavlm-base-plus geometry
    with jax.default_device(jax.devices("cpu")[0]):
        wl_params = WavLMJax(wl_cfg).init(
            jax.random.key(5), jnp.zeros((1, 6400))
        )["params"]
        models = Models(
            models.synthesizer, models.mpd, models.dur_disc,
            WavLMDiscriminator(
                slm_hidden=wl_cfg.hidden_size,
                slm_layers=wl_cfg.num_layers + 1,
                initial_channel=cfg.slm_initial_channel,
            ),
        )
        slm_embed, slm_feature_fn = make_slm_fns(wl_params, wl_cfg)
        params = init_params(models, cfg, slm_embed=slm_embed)
    params = jax.device_put(params, dev)
    # WavLM weights + resampler kernel ride in state.params_slm (runtime
    # inputs, not HLO constants — see TrainState.params_slm)
    slm_params_dev = jax.device_put(slm_embed.params, dev)

    b, t_x, t_y = 16, 128, 512
    hop, sr = data_cfg.hop_length, data_cfg.sampling_rate
    rng = np.random.default_rng(0)
    batch = dict(
        x=jnp.asarray(rng.integers(1, cfg.n_vocab, (b, t_x))),
        x_lengths=jnp.asarray([t_x] * b),
        spec=jnp.asarray(rng.normal(size=(b, t_y, cfg.spec_channels)) * 0.1,
                         jnp.float32),
        spec_lengths=jnp.asarray([t_y] * b),
        wave=jnp.asarray(rng.uniform(-0.5, 0.5, (b, t_y * hop)), jnp.float32),
        sid=jnp.asarray(rng.integers(0, cfg.n_speakers, (b,))),
        tone=jnp.asarray(rng.integers(0, cfg.num_tones, (b, t_x))),
        language=jnp.asarray(rng.integers(0, cfg.num_languages, (b, t_x))),
        bert=jnp.asarray(rng.normal(size=(b, t_x, cfg.bert_dim)), jnp.float32),
        ja_bert=jnp.asarray(rng.normal(size=(b, t_x, cfg.bert_dim)),
                            jnp.float32),
        en_bert=jnp.asarray(rng.normal(size=(b, t_x, cfg.bert_dim)),
                            jnp.float32),
    )
    batch = jax.device_put(batch, dev)

    state = init_train_state(models, train_cfg, *params,
                             params_slm=slm_params_dev)
    # commit EVERY leaf (incl. scalar counters) to the chip: a state with
    # mixed committed/uncommitted leaves gives the first call a different
    # jit signature than the stepped state -> a silent second multi-minute
    # XLA compile that poisons the timing loop
    state = jax.device_put(state, dev)
    step_fn = make_train_step(
        models, train_cfg, data_cfg, cfg.segment_size,
        slm_embed=slm_embed, slm_feature_fn=slm_feature_fn, donate=False,
    )
    key = jax.random.key(11)
    lr = jnp.float32(2e-4)
    log("compiling train step ...")
    state, metrics = step_fn(state, batch, key, lr)
    jax.block_until_ready(metrics)
    n = 8
    t0 = time.perf_counter()
    for i in range(n):
        state, metrics = step_fn(state, batch, jax.random.fold_in(key, i), lr)
    jax.block_until_ready(metrics)
    dt = (time.perf_counter() - t0) / n
    return {
        "steps_per_s": round(1.0 / dt, 3),
        "utt_audio_s_per_s": round(b * t_y * hop / sr / dt, 1),
        "batch": b, "spec_frames": t_y, "bf16": True, "slm": True,
        "loss_g_total": round(float(np.asarray(metrics["loss/g/total"])), 3),
    }


if __name__ == "__main__":
    main()
