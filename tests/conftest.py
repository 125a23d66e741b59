"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set flags before jax is imported anywhere (SURVEY.md §4: multi-host tests
use fake-device CPU meshes; real-TPU checks happen in bench.py / the driver).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin in this image overrides JAX_PLATFORMS at import time;
# force CPU again post-import so tests get the virtual 8-device host mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


import numpy as np
import pytest
from jax import lax  # noqa: F401


@pytest.fixture(scope="session")
def tiny_model():
    import jax.numpy as jnp

    from bert_vits2_tpu.models import ModelConfig, Synthesizer

    cfg = ModelConfig(
        n_vocab=20, bert_dim=1024, spec_channels=33, segment_size=8,
        inter_channels=8, hidden_channels=8, filter_channels=16, n_heads=2,
        n_layers=1, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),), upsample_rates=(4, 4),
        upsample_initial_channel=16, upsample_kernel_sizes=(8, 8),
        n_speakers=4, gin_channels=8, n_layers_trans_flow=2,
    )
    model = Synthesizer(cfg)
    b, t_x = 1, 8
    rng0 = np.random.default_rng(0)
    spec = jnp.zeros((b, 16, cfg.spec_channels), jnp.float32)
    bert = jnp.asarray(rng0.normal(size=(b, t_x, 1024)), jnp.float32)
    params = model.init(
        {
            "params": jax.random.key(0),
            "noise": jax.random.key(1),
            "dropout": jax.random.key(2),
        },
        jnp.asarray(rng0.integers(1, cfg.n_vocab, (b, t_x))),
        jnp.asarray([t_x] * b),
        spec,
        jnp.asarray([16] * b),
        jnp.asarray([0]),
        jnp.asarray(rng0.integers(0, cfg.num_tones, (b, t_x))),
        jnp.asarray(rng0.integers(0, cfg.num_languages, (b, t_x))),
        bert,
        bert,
        bert,
        deterministic=True,
    )["params"]
    return model, params


@pytest.fixture(autouse=True, scope="module")
def _free_xla_caches():
    """Drop compiled-executable caches between test modules.

    The full suite runs ~300 tests in one process on a small host; XLA:CPU
    executables accumulate across modules and the resulting memory pressure
    has produced a late-suite segfault. Each module recompiles what it needs
    anyway, so clearing between modules costs little and caps the footprint.
    """
    yield
    import gc

    jax.clear_caches()
    gc.collect()
