"""Quantify the decoder's per-conv re-masking overhead at bench shapes.

Times the full jitted Generator (bf16) with and without y_mask. The masked
path is what bench.py/infer run (static-shape padding discipline); the
unmasked path is the upper bound if masking were free. Perf tool, not a test.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _run(fn, args, iters):
    out = None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return time.perf_counter() - t0


def timeit(fn, *args, n1=5, n2=25):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t1 = _run(fn, args, n1)
    t2 = _run(fn, args, n2)
    return (t2 - t1) / (n2 - n1)


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    from bert_vits2_tpu.models.generator import Generator

    b, t = 8, 1024
    model = Generator(initial_channel=192, gin_channels=512)
    x = jnp.zeros((b, t, 192), jnp.bfloat16)
    g = jnp.zeros((b, 512), jnp.bfloat16)
    # realistic ragged lengths (3/4 of the bucket full on average)
    lengths = np.linspace(t // 2, t, b).astype(np.int32)
    y_mask = (np.arange(t)[None, :] < lengths[:, None]).astype(np.float32)
    y_mask = jnp.asarray(y_mask)

    with jax.default_device(jax.devices("cpu")[0]):
        params = model.init(jax.random.key(0), x, g=g)
    params = jax.device_put(params, jax.devices()[0])

    masked = jax.jit(lambda p, x, g, m: model.apply(p, x, g=g, y_mask=m))
    unmasked = jax.jit(lambda p, x, g: model.apply(p, x, g=g))

    t_m = timeit(masked, params, x, g, y_mask)
    t_u = timeit(unmasked, params, x, g)
    print(f"dec masked   {t_m * 1e3:9.3f} ms")
    print(f"dec unmasked {t_u * 1e3:9.3f} ms")
    print(f"mask overhead {100 * (t_m - t_u) / t_m:6.1f}% of masked time")
