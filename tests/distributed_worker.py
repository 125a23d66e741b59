"""Worker process for tests/test_distributed.py (NOT collected by pytest).

One of two `jax.distributed`-initialized CPU processes (4 virtual devices
each -> one 8-device global mesh). Exercises the real multi-host bring-up
path end to end — the torchrun/env:// equivalent of the reference
(train_ms.py:71-81): rendezvous, rank-strided sampler shards,
`make_array_from_process_local_data` feeding the fused GAN train step, and
a collective orbax checkpoint save. Results are written as JSON for the
parent test to assert on.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    rank = int(sys.argv[1])
    port = sys.argv[2]
    out_dir = sys.argv[3]

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from bert_vits2_tpu.parallel import init_distributed

    init_distributed(
        coordinator_address=f"localhost:{port}", num_processes=2,
        process_id=rank,
    )

    import jax.numpy as jnp
    import numpy as np

    out = {
        "rank": rank,
        "process_count": jax.process_count(),
        "device_count": jax.device_count(),
        "local_device_count": jax.local_device_count(),
    }

    # ---- per-host sampler shard (reference data_utils.py:277-404) ----
    from bert_vits2_tpu.data.sampler import BucketSampler

    lengths = [40 + (i * 37) % 500 for i in range(50)]
    sampler = BucketSampler(
        lengths, batch_size=2, num_replicas=2, rank=rank, seed=5
    )
    sampler.set_epoch(0)
    out["sampler_ids"] = sorted(
        i for _bucket, batch in sampler for i in batch
    )
    out["sampler_batches"] = len(sampler)

    # ---- host-local batch -> global sharded arrays -> fused train step ----
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_train import TINY, TINY_DATA, _make_batch  # tiny geometry

    from bert_vits2_tpu.models import (
        DurationDiscriminator,
        MultiPeriodDiscriminator,
        Synthesizer,
    )
    from bert_vits2_tpu.parallel import batch_sharding, make_mesh, replicate
    from bert_vits2_tpu.train import (
        Models,
        TrainConfig,
        init_train_state,
        make_train_step,
    )
    from bert_vits2_tpu.train import checkpoint as ckpt

    synth = Synthesizer(TINY)
    mpd = MultiPeriodDiscriminator(
        periods=(2, 3),
        p_channels=(8, 16),
        s_specs=((8, 15, 1, 1, 7), (16, 41, 4, 4, 20), (16, 5, 1, 1, 2)),
    )
    dd = DurationDiscriminator(
        in_channels=TINY.hidden_channels, filter_channels=16, kernel_size=3,
        p_dropout=0.1, gin_channels=TINY.gin_channels,
    )
    models = Models(synth, mpd, dd, None)
    init_batch = _make_batch(b=2)  # init shapes are batch-agnostic
    rngs = {"params": jax.random.key(0), "noise": jax.random.key(1),
            "dropout": jax.random.key(2)}
    params_g = synth.init(
        rngs, init_batch["x"], init_batch["x_lengths"], init_batch["spec"],
        init_batch["spec_lengths"], init_batch["sid"], init_batch["tone"],
        init_batch["language"], init_batch["bert"], init_batch["ja_bert"],
        init_batch["en_bert"], deterministic=True,
    )["params"]
    params_d = mpd.init(
        jax.random.key(3), init_batch["wave"][:, :64],
        init_batch["wave"][:, :64],
    )["params"]
    dur = jnp.ones((2, init_batch["x"].shape[1], 1))
    xm = jnp.ones(init_batch["x"].shape, jnp.float32)
    hx = jnp.zeros(init_batch["x"].shape + (TINY.hidden_channels,),
                   jnp.float32)
    params_dd = dd.init(
        jax.random.key(4), hx, xm, dur, dur,
        g=jnp.ones((2, TINY.gin_channels)),
    )["params"]
    cfg = TrainConfig(learning_rate=1e-4)
    state = init_train_state(models, cfg, params_g, params_d, params_dd, None)
    step_fn = make_train_step(models, cfg, TINY_DATA, TINY.segment_size,
                              donate=False)

    mesh = make_mesh(n_data=8, n_model=1)
    sharding = batch_sharding(mesh)
    state = replicate(mesh, state)

    # each host contributes ITS OWN half of the global batch (global b=8,
    # local b=4) — trainer._device_batch's exact conversion
    local = {k: np.asarray(v)
             for k, v in _make_batch(b=4, seed=100 + rank).items()}
    global_batch = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), local
    )
    for leaf in jax.tree.leaves(global_batch):
        assert leaf.shape[0] == 8, leaf.shape  # global batch spans hosts

    state2, metrics = step_fn(state, global_batch, jax.random.key(7),
                              jnp.float32(1e-4))
    out["loss_g_total"] = float(np.asarray(metrics["loss/g/total"]))
    out["loss_d_total"] = float(np.asarray(metrics["loss/d/total"]))
    # a replicated param leaf for the parent's cross-topology restore check
    leaf = np.asarray(
        jax.tree.leaves(state2.params_g)[0], dtype=np.float64
    )
    out["param_leaf_sum"] = float(leaf.sum())

    # ---- collective orbax save (2 processes -> one checkpoint) ----
    ckpt.save_train_state(os.path.join(out_dir, "ckpt"), 1, state2, keep=2)

    with open(os.path.join(out_dir, f"rank{rank}.json"), "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
