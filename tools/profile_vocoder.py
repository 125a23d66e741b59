"""Per-stage microbenchmark of the HiFi-GAN decoder at bench.py shapes.

Times each (ConvTranspose upsample + MRF) stage as its own jitted function so
kernel work targets the real bottleneck inside `dec` (82% of e2e inference,
tools/profile_stages.py). Perf tool, not a test.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from tools._timing import device_timeit as timeit, setup_cache  # noqa: E402


if __name__ == "__main__":
    import jax

    setup_cache()
    import jax.numpy as jnp
    import flax.linen as nn

    from bert_vits2_tpu.models.generator import ResBlock1
    from bert_vits2_tpu.nn.conv import Conv1d, ConvTranspose1d, normal_init

    b = 8
    dtype = jnp.bfloat16
    rates = (8, 8, 2, 2, 2)
    kernels = (16, 16, 8, 2, 2)
    t0_frames = 1024
    ch0 = 512

    class Stage(nn.Module):
        ch: int
        k: int
        u: int
        fold: int

        @nn.compact
        def __call__(self, x):
            x = jax.nn.leaky_relu(x, 0.1)
            x = ConvTranspose1d(
                self.ch, self.k, self.u, padding=(self.k - self.u) // 2,
                use_weight_norm=True, kernel_init=normal_init(0.01), name="up",
            )(x)
            xs = None
            for j, rk in enumerate((3, 7, 11)):
                blk = ResBlock1(self.ch, rk, (1, 3, 5), time_fold=self.fold,
                                name=f"rb_{j}")
                xs = blk(x) if xs is None else xs + blk(x)
            return xs / 3.0

    class UpOnly(nn.Module):
        ch: int
        k: int
        u: int

        @nn.compact
        def __call__(self, x):
            return ConvTranspose1d(
                self.ch, self.k, self.u, padding=(self.k - self.u) // 2,
                use_weight_norm=True, kernel_init=normal_init(0.01), name="up",
            )(jax.nn.leaky_relu(x, 0.1))

    rng = jax.random.key(0)
    times = {}
    flops = {}
    t = t0_frames
    in_ch = ch0
    for i, (u, k) in enumerate(zip(rates, kernels)):
        ch = ch0 // (2 ** (i + 1))
        fold = 1
        if 0 < ch < 128 and 128 % ch == 0:
            fold = 128 // ch
        x = jax.random.normal(rng, (b, t, in_ch), dtype)
        stage = Stage(ch=ch, k=k, u=u, fold=fold)
        params = stage.init(jax.random.key(i), x)
        # return a scalar: completion forces the compute but the host
        # transfer is 4 bytes (large-output transfers swamp the timing)
        f = jax.jit(lambda p, x, s=stage: jnp.sum(s.apply(p, x).astype(jnp.float32)))
        times[f"stage{i} ch{ch} T{t * u} f{fold}"] = timeit(f, params, x)
        # fused Pallas MRF path (inference serve path) where supported
        from bert_vits2_tpu.ops.mrf_pallas import (
            fused_mrf, fused_mrf_supported, prepare_mrf_weights,
        )

        if fused_mrf_supported(ch, t * u, (3, 7, 11),
                               ((1, 3, 5),) * 3):
            blocks = [params["params"][f"rb_{j}"] for j in range(3)]
            packed = prepare_mrf_weights(
                blocks, (3, 7, 11), ((1, 3, 5),) * 3, dtype)

            class StageF(nn.Module):
                ch: int
                k: int
                u: int

                @nn.compact
                def __call__(self, x):
                    x = jax.nn.leaky_relu(x, 0.1)
                    x = ConvTranspose1d(
                        self.ch, self.k, self.u,
                        padding=(self.k - self.u) // 2,
                        use_weight_norm=True,
                        kernel_init=normal_init(0.01), name="up",
                    )(x)
                    ones = jnp.ones(x.shape[:2], x.dtype)
                    return fused_mrf(x, ones, packed, (3, 7, 11),
                                     ((1, 3, 5),) * 3)

            stf = StageF(ch=ch, k=k, u=u)

            def ff(p, x, s=stf):
                return jnp.sum(s.apply(p, x).astype(jnp.float32))

            times[f"  fused{i} ch{ch}"] = timeit(
                jax.jit(ff), {"params": {"up": params["params"]["up"]}}, x)
            flops[f"  fused{i} ch{ch}"] = flops_stage_placeholder = None

        up_only = UpOnly(ch=ch, k=k, u=u)
        pu = up_only.init(jax.random.key(i), x)
        fu = jax.jit(lambda p, x, s=up_only: jnp.sum(s.apply(p, x).astype(jnp.float32)))
        times[f"  up{i} k{k} s{u} {in_ch}->{ch}"] = timeit(fu, pu, x)
        # true (unfolded) MACs: up + 18 MRF convs
        mrf = sum(6 * rk for rk in (3, 7, 11)) * ch * ch * (t * u)
        up = t * k * in_ch * ch
        flops[f"stage{i} ch{ch} T{t * u} f{fold}"] = 2 * b * (mrf + up)
        if f"  fused{i} ch{ch}" in times:
            flops[f"  fused{i} ch{ch}"] = 2 * b * (mrf + up)
        flops[f"  up{i} k{k} s{u} {in_ch}->{ch}"] = 2 * b * up
        t *= u
        in_ch = ch

    total = sum(v for k, v in times.items() if not k.startswith("  "))
    for k, v in times.items():
        fl = flops.get(k, 0)
        eff = fl / v / 1e12
        print(f"{k:28s} {v*1e3:8.3f} ms   {eff:6.1f} TFLOP/s")
    print(f"{'sum(stages)':28s} {total*1e3:8.3f} ms")
