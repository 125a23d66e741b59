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


from tools._timing import device_timeit as timeit, setup_cache  # noqa: E402


if __name__ == "__main__":
    import jax

    setup_cache()
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

    # fused Pallas serve path for comparison
    from bert_vits2_tpu.ops.mrf_pallas import pack_generator_mrf

    packed = pack_generator_mrf(
        params["params"], (3, 7, 11), ((1, 3, 5),) * 3,
        (8, 8, 2, 2, 2), 512, jnp.bfloat16)
    fusedm = jax.jit(
        lambda p, x, g, m: model.apply(p, x, g=g, y_mask=m,
                                       mrf_packed=packed))
    fusedu = jax.jit(
        lambda p, x, g: model.apply(p, x, g=g, mrf_packed=packed))

    t_m = timeit(masked, params, x, g, y_mask)
    t_u = timeit(unmasked, params, x, g)
    t_fm = timeit(fusedm, params, x, g, y_mask)
    t_fu = timeit(fusedu, params, x, g)
    print(f"dec masked   (fold ) {t_m * 1e3:9.3f} ms")
    print(f"dec unmasked (fold ) {t_u * 1e3:9.3f} ms")
    print(f"dec masked   (fused) {t_fm * 1e3:9.3f} ms")
    print(f"dec unmasked (fused) {t_fu * 1e3:9.3f} ms")
    print(f"mask overhead {100 * (t_m - t_u) / t_m:6.1f}% of folded masked time")
