"""Training-step throughput on the real chip: fp32 vs bf16 compute.

Times the full fused GAN step (generator + MPD + duration discriminator, all
four optimizer updates in one jit — train/step.py) at production shapes
(configs/config.json: batch 16, specs in the 300..700-frame buckets,
segment_size 32 frames) and reports steps/s and utterance-seconds/s for
train_compute_dtype float32 vs bfloat16 (the reference's autocast(bf16),
train_ms.py:458-480). Not part of the test suite — a perf tool.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _run(fn, args, iters):
    out = None
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out[1])[0])  # drain the dispatch queue
    return out


def timeit(fn, args, n1=3, n2=10):
    """Difference method: cancels constant dispatch/relay overhead."""
    t0 = time.perf_counter()
    _run(fn, args, n1)
    t1 = time.perf_counter()
    _run(fn, args, n2)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1)


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _full_config
    from bert_vits2_tpu.models import (
        DurationDiscriminator,
        MultiPeriodDiscriminator,
        Synthesizer,
    )
    from bert_vits2_tpu.train import (
        DataConfig,
        Models,
        TrainConfig,
        init_train_state,
        make_train_step,
    )

    b, t_x, t_y = 16, 192, 512
    data_cfg = DataConfig()
    hop = data_cfg.hop_length

    rng = np.random.default_rng(0)
    base = _full_config()
    batch = dict(
        x=jnp.asarray(rng.integers(1, base.n_vocab, (b, t_x))),
        x_lengths=jnp.asarray([t_x] * b),
        spec=jnp.asarray(rng.normal(size=(b, t_y, base.spec_channels)), jnp.float32),
        spec_lengths=jnp.asarray([t_y] * b),
        wave=jnp.asarray(rng.uniform(-0.5, 0.5, (b, t_y * hop)), jnp.float32),
        sid=jnp.asarray(rng.integers(0, base.n_speakers, (b,))),
        tone=jnp.asarray(rng.integers(0, base.num_tones, (b, t_x))),
        language=jnp.asarray(rng.integers(0, base.num_languages, (b, t_x))),
        bert=jnp.asarray(rng.normal(size=(b, t_x, base.bert_dim)), jnp.float32),
        ja_bert=jnp.asarray(rng.normal(size=(b, t_x, base.bert_dim)), jnp.float32),
        en_bert=jnp.asarray(rng.normal(size=(b, t_x, base.bert_dim)), jnp.float32),
    )

    dtypes = sys.argv[1:] or ["float32", "bfloat16"]
    results = {}
    for dtype in dtypes:
        cfg = dataclasses.replace(base, train_compute_dtype=dtype)
        synth = Synthesizer(cfg)
        mpd = MultiPeriodDiscriminator()
        dd = DurationDiscriminator(
            in_channels=cfg.hidden_channels, filter_channels=256,
            kernel_size=3, p_dropout=0.1, gin_channels=cfg.gin_channels,
        )
        models = Models(synth, mpd, dd, None)
        tcfg = TrainConfig(bf16_run=(dtype == "bfloat16"))

        init_rngs = {
            "params": jax.random.key(0),
            "noise": jax.random.key(1),
            "dropout": jax.random.key(2),
        }
        # init eagerly on host CPU: eager init over the axon relay dispatches
        # thousands of tiny ops with a network round trip each
        t0 = time.perf_counter()
        with jax.default_device(jax.devices("cpu")[0]):
            params_g = synth.init(
                init_rngs, batch["x"], batch["x_lengths"], batch["spec"][:, :64],
                jnp.minimum(batch["spec_lengths"], 64), batch["sid"], batch["tone"],
                batch["language"], batch["bert"], batch["ja_bert"],
                batch["en_bert"], deterministic=True,
            )["params"]
            params_d = mpd.init(
                jax.random.key(3), batch["wave"][:, : 8 * hop],
                batch["wave"][:, : 8 * hop],
            )["params"]
            dur = jnp.ones((b, t_x, 1))
            params_dd = dd.init(
                jax.random.key(4),
                jnp.zeros((b, t_x, cfg.hidden_channels)),
                jnp.ones((b, t_x)),
                dur, dur,
                g=jnp.ones((b, cfg.gin_channels)),
            )["params"]
        dev = jax.devices()[0]
        params_g, params_d, params_dd = jax.device_put(
            (params_g, params_d, params_dd), dev
        )
        print(f"{dtype}: init {time.perf_counter() - t0:.0f}s", flush=True)
        state = init_train_state(models, tcfg, params_g, params_d, params_dd, None)
        step_fn = make_train_step(models, tcfg, data_cfg, cfg.segment_size,
                                  donate=False)

        args = (state, batch, jax.random.key(7), jnp.float32(2e-4))
        t_compile0 = time.perf_counter()
        out = step_fn(*args)
        np.asarray(out[1]["loss/g/total"])
        compile_s = time.perf_counter() - t_compile0
        dt = timeit(step_fn, args)
        results[dtype] = dt
        utt_s = b * t_y * hop / data_cfg.sampling_rate
        print(
            f"{dtype:9s}  step {dt * 1e3:8.1f} ms   {1.0 / dt:6.2f} steps/s   "
            f"{utt_s / dt:8.1f} utt-audio-s/s   (compile {compile_s:.0f}s)"
        )

    if "float32" in results and "bfloat16" in results:
        print(f"bf16 speedup: {results['float32'] / results['bfloat16']:.2f}x")
