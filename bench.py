"""Benchmark: batched synthesis throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric: audio-seconds synthesized per wall-second per chip (inverse RTF x
batch). The north-star baseline is 10x realtime per chip (BASELINE.md), so
vs_baseline = value / 10.

Full-size V2.3 model (h=192, 6 layers, HiFi-GAN 512, 44.1 kHz), batch x
length-bucket static shapes; audio accounting uses the bucket capacity
actually synthesized (batch * max_frames * hop / sr per call).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import dataclasses

    from __graft_entry__ import _full_config, _text_batch
    from bert_vits2_tpu.models import Synthesizer

    # production serving config: bf16 flow+vocoder (params fp32, durations
    # fp32; see ModelConfig.infer_compute_dtype). Parity tests use fp32.
    cfg = dataclasses.replace(_full_config(), infer_compute_dtype="bfloat16")
    model = Synthesizer(cfg)

    # batch 16 saturates the chip: throughput/chip is ~1.4x batch 8's and
    # flat from 16 -> 32 (see docs; serving batches requests to 16)
    b, t_x, max_frames = 16, 128, 1024
    sr, hop = 44100, cfg.hop_length
    batch = _text_batch(cfg, b, t_x)
    spec = jnp.zeros((b, 32, cfg.spec_channels), jnp.float32)
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
            batch["x"], batch["x_lengths"], spec, jnp.asarray([32] * b),
            batch["sid"], batch["tone"], batch["language"],
            batch["bert"], batch["ja_bert"], batch["en_bert"],
            deterministic=True,
        )
    params = jax.device_put(params, jax.devices()[0])

    @jax.jit
    def synth(params, batch, rng):
        wave, _, _, y_lengths = model.apply(
            params,
            batch["x"], batch["x_lengths"], batch["sid"], batch["tone"],
            batch["language"], batch["bert"], batch["ja_bert"], batch["en_bert"],
            max_frames,
            method=Synthesizer.infer,
            rngs={"noise": rng},
        )
        return wave, y_lengths

    # warmup / compile (np.asarray forces a full device->host round trip;
    # block_until_ready alone is unreliable over the axon relay)
    rng = jax.random.key(3)
    wave, y_len = synth(params, batch, rng)
    np.asarray(wave)

    # Drain the dispatch queue with a SCALAR transfer: the full waveform is
    # b*max_frames*hop*4 bytes (~33 MB), which over the axon tunnel takes
    # seconds and varies run to run — it would swamp the device time being
    # measured. On real deployments the host link is PCIe and this transfer
    # is negligible; the metric is chip synthesis throughput.
    n_iters = 30
    t0 = time.perf_counter()
    for i in range(n_iters):
        wave, y_len = synth(params, batch, jax.random.fold_in(rng, i))
    np.asarray(jnp.sum(wave.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / n_iters

    audio_seconds = b * max_frames * hop / sr  # per call (bucket capacity)
    value = audio_seconds / dt
    print(
        json.dumps(
            {
                "metric": "audio_seconds_per_sec_per_chip",
                "value": round(value, 3),
                "unit": "audio-s/s/chip",
                "vs_baseline": round(value / 10.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
