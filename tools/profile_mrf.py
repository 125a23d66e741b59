"""Fused Pallas MRF vs the XLA time-folded ResBlock stack, per decoder
stage at bench shapes (b=16, 1024-frame bucket). Perf tool, not a test."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import flax.linen as nn

from bert_vits2_tpu.models.generator import ResBlock1
from bert_vits2_tpu.ops.mrf_pallas import (
    fused_mrf,
    fused_mrf_supported,
    prepare_mrf_weights,
)

KS = (3, 7, 11)
DS = ((1, 3, 5), (1, 3, 5), (1, 3, 5))


def timeit(fn, *args, n1=3, n2=13):
    np.asarray(jnp.sum(fn(*args).astype(jnp.float32)))

    def run(iters):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jnp.sum(out.astype(jnp.float32)))
        return time.perf_counter() - t0

    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1)


class XlaMRF(nn.Module):
    ch: int
    fold: int

    @nn.compact
    def __call__(self, x, m):
        xs = None
        for j, (k, d) in enumerate(zip(KS, DS)):
            blk = ResBlock1(self.ch, k, d, time_fold=self.fold,
                            name=f"rb_{j}")
            xs = blk(x, m) if xs is None else xs + blk(x, m)
        return xs / len(KS)


if __name__ == "__main__":
    b = 16
    dtype = jnp.bfloat16
    t0_frames = 1024
    rates = (8, 8, 2, 2, 2)
    t = t0_frames
    rng = jax.random.key(0)
    for i, u in enumerate(rates):
        t *= u
        ch = 512 // (2 ** (i + 1))
        if not fused_mrf_supported(ch, t, KS, DS):
            print(f"stage{i} ch{ch} T{t}: fused unsupported, skip")
            continue
        x = jax.random.normal(rng, (b, t, ch), dtype)
        mask = jnp.ones((b, t), jnp.float32)
        fold = 1
        if 0 < ch < 128 and 128 % ch == 0:
            fold = 128 // ch
        m = XlaMRF(ch=ch, fold=fold)
        params = m.init(jax.random.key(i), x, mask)["params"]

        xla_fn = jax.jit(lambda p, x, m_, mm=m: mm.apply({"params": p}, x, m_))
        t_xla = timeit(xla_fn, params, x, mask)

        packed = prepare_mrf_weights(
            [params[f"rb_{j}"] for j in range(3)], KS, DS, dtype
        )
        fused_fn = jax.jit(
            lambda x, m_, pk: fused_mrf(x, m_, pk, KS, DS, use_mask=True)
        )
        t_fused = timeit(fused_fn, x, mask, packed)

        flops = 2 * b * t * sum(6 * k for k in KS) * ch * ch
        print(
            f"stage{i} ch{ch:3d} T{t:6d} f{fold}: "
            f"xla {t_xla*1e3:8.3f} ms ({flops/t_xla/1e12:5.1f} TF/s)  "
            f"fused {t_fused*1e3:8.3f} ms ({flops/t_fused/1e12:5.1f} TF/s)  "
            f"speedup {t_xla/t_fused:4.2f}x"
        )
