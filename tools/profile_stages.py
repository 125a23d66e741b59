"""Per-stage timing of the inference pipeline on the real chip.

Times each jitted stage (emb/enc_p/sdp/dp/flow/dec + the alignment glue) at
bench.py shapes so kernel work targets the actual bottleneck. Not part of the
test suite — a perf tool.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n1=4, n2=16):
    """Device-side loop timing: run the stage n times inside ONE jitted
    lax.fori_loop, so per-iteration cost is pure device time — host->relay
    dispatch (~ms per call over the axon tunnel) would otherwise swamp the
    small stages (a host-loop difference method measured `flow` negative).
    The first float input is perturbed by the loop index so XLA cannot
    hoist the loop-invariant body; (t(n2) - t(n1)) / (n2 - n1) cancels the
    fixed call + D2H-sync cost."""
    import jax
    import jax.numpy as jnp

    args = list(args)
    pi = next((i for i, a in enumerate(args)
               if hasattr(a, "dtype") and jnp.issubdtype(a.dtype,
                                                         jnp.floating)),
              None)

    @partial(jax.jit, static_argnames=("n",))
    def loop(args, n):
        def body(i, acc):
            a = list(args)
            if pi is not None:
                a[pi] = a[pi] + (i.astype(a[pi].dtype) * jnp.asarray(
                    1e-30, a[pi].dtype))
            else:
                # int-only stage (emb): i is in [0, 16), so i >> 30 adds
                # zero but is not provably loop-invariant
                a[0] = a[0] + (i >> 30).astype(a[0].dtype)
            out = fn(*a)
            leaf = jax.tree.leaves(out)[0]
            return acc + leaf.reshape(-1)[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def t(n):
        t0 = time.perf_counter()
        np.asarray(loop(tuple(args), n))
        return time.perf_counter() - t0

    np.asarray(loop(tuple(args), n1))  # compile n1
    np.asarray(loop(tuple(args), n2))  # compile n2
    t1 = min(t(n1) for _ in range(2))
    t2 = min(t(n2) for _ in range(2))
    return (t2 - t1) / (n2 - n1)


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    # persistent cache: re-profiling after a code change only recompiles
    # the changed stage (remote compiles are multi-minute and flaky)
    from tools._timing import setup_cache

    setup_cache()

    from __graft_entry__ import _full_config, _text_batch
    from bert_vits2_tpu.models import Synthesizer
    from bert_vits2_tpu.compat.stages import make_stages

    cfg = dataclasses.replace(_full_config(), infer_compute_dtype="bfloat16")
    model = Synthesizer(cfg)

    b, t_x, max_frames = 8, 128, 1024
    batch = _text_batch(cfg, b, t_x)
    spec = jnp.zeros((b, 32, cfg.spec_channels), jnp.float32)
    init_rngs = {
        "params": jax.random.key(0),
        "noise": jax.random.key(1),
        "dropout": jax.random.key(2),
    }
    params = model.init(
        init_rngs,
        batch["x"], batch["x_lengths"], spec, jnp.asarray([32] * b),
        batch["sid"], batch["tone"], batch["language"],
        batch["bert"], batch["ja_bert"], batch["en_bert"],
        deterministic=True,
    )

    stages = make_stages(model, params["params"])
    rng = jax.random.key(3)

    g = stages["emb"](batch["sid"])
    x_h, m_p, logs_p, x_mask = stages["enc_p"](
        batch["x"], batch["x_lengths"], batch["tone"], batch["language"],
        batch["bert"], batch["ja_bert"], batch["en_bert"], g,
    )
    logw_sdp = stages["sdp"](x_h, x_mask, g, jnp.float32(0.8), rng)
    logw_dp = stages["dp"](x_h, x_mask, g)
    logw = logw_dp
    w_ceil = jnp.ceil(jnp.exp(logw[..., 0]) * x_mask)
    y_lengths = jnp.minimum(jnp.clip(jnp.sum(w_ceil, -1), min=1.0), max_frames)

    from bert_vits2_tpu.ops.masking import sequence_mask, generate_path

    y_mask = sequence_mask(y_lengths.astype(jnp.int32), max_frames).astype(
        x_mask.dtype
    )

    @jax.jit
    def align(w_ceil, x_mask, y_mask, m_p, logs_p, rng):
        attn = generate_path(w_ceil, x_mask, y_mask)
        m_p_y = jnp.einsum("byx,bxd->byd", attn, m_p)
        logs_p_y = jnp.einsum("byx,bxd->byd", attn, logs_p)
        eps = jax.random.normal(rng, m_p_y.shape)
        return m_p_y + eps * jnp.exp(logs_p_y) * 0.667

    z_p = align(w_ceil, x_mask, y_mask, m_p, logs_p, rng)
    z = stages["flow"](z_p, y_mask, g)
    zin = z * y_mask[..., None]

    # fused Pallas MRF vocoder tail (the production serve path)
    from bert_vits2_tpu.ops.mrf_pallas import pack_generator_mrf

    mrf_packed = pack_generator_mrf(
        params["params"]["dec"], cfg.resblock_kernel_sizes,
        cfg.resblock_dilation_sizes, cfg.upsample_rates,
        cfg.upsample_initial_channel, cfg.infer_compute_dtype,
    )

    @jax.jit
    def dec_fused(zin, g, y_mask):
        return model.apply(
            params,
            method=lambda m: m.dec(zin, g=g, y_mask=y_mask,
                                   mrf_packed=mrf_packed),
        )

    times = {}
    times["emb"] = timeit(stages["emb"], batch["sid"])
    times["enc_p"] = timeit(
        stages["enc_p"], batch["x"], batch["x_lengths"], batch["tone"],
        batch["language"], batch["bert"], batch["ja_bert"], batch["en_bert"], g,
    )
    times["sdp"] = timeit(stages["sdp"], x_h, x_mask, g, jnp.float32(0.8), rng)
    times["dp"] = timeit(stages["dp"], x_h, x_mask, g)
    times["align"] = timeit(align, w_ceil, x_mask, y_mask, m_p, logs_p, rng)
    times["flow"] = timeit(stages["flow"], z_p, y_mask, g)
    times["dec"] = timeit(stages["dec"], zin, g, y_mask)
    times["dec_fused"] = timeit(dec_fused, zin, g, y_mask)

    # stage x (time, FLOPs, TF/s, % of bf16 roofline) table
    from bert_vits2_tpu.utils.flops import infer_stage_flops
    from bench import peak_tflops

    fl = infer_stage_flops(cfg, b, t_x, max_frames)
    fl["dec_fused"] = fl["dec"]
    peak = peak_tflops(jax.devices()[0].device_kind) or float("nan")
    total = sum(v for k, v in times.items() if k != "dec_fused")
    print(f"{'stage':10s} {'ms':>9s} {'%time':>6s} {'GFLOP':>9s} "
          f"{'TF/s':>7s} {'%roof':>6s}")
    for k, v in sorted(times.items(), key=lambda kv: -kv[1]):
        fk = fl.get(k, 0.0)
        tfs = fk / v / 1e12
        print(f"{k:10s} {v*1e3:9.3f} {100*v/total:5.1f}% {fk/1e9:9.2f} "
              f"{tfs:7.2f} {100*tfs/peak:5.1f}%")
    print(f"{'total':10s} {total*1e3:9.3f} ms (stage sum, XLA dec; "
          "fused e2e is lower)")
    tot_f = total - times["dec"] + times["dec_fused"]
    audio_s = b * max_frames * cfg.hop_length / 44100
    print(f"{'tot_fused':10s} {tot_f*1e3:9.3f} ms -> "
          f"{audio_s/tot_f:7.1f} audio-s/s capacity")
