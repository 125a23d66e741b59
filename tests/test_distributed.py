"""TWO-PROCESS `jax.distributed` bring-up (VERDICT r4 item 4).

Everything multi-device elsewhere in the suite runs in ONE process on a
virtual mesh; this is the only coverage of the actual multi-host path the
reference drives with torchrun (train_ms.py:71-81): localhost-coordinator
rendezvous, per-host sampler disjointness, host-local data fed through
`jax.make_array_from_process_local_data` into the fused GAN step, a
collective orbax save from both processes, and a cross-topology restore of
that checkpoint back into THIS single-process 8-device test process.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def run_workers(tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("dist"))
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own 4-device flag
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(rank), str(port), out_dir],
            env=env, cwd=REPO,
        )
        for rank in range(2)
    ]
    try:
        for p in procs:
            assert p.wait(timeout=1500) == 0, "distributed worker failed"
    finally:
        for p in procs:
            p.kill()
    results = {}
    for rank in range(2):
        with open(os.path.join(out_dir, f"rank{rank}.json")) as f:
            results[rank] = json.load(f)
    return out_dir, results


class TestTwoProcessDistributed:
    def test_mesh_spans_both_processes(self, run_workers):
        _, res = run_workers
        for rank in (0, 1):
            assert res[rank]["process_count"] == 2
            assert res[rank]["device_count"] == 8
            assert res[rank]["local_device_count"] == 4

    def test_sampler_shards_disjoint_and_complete(self, run_workers):
        _, res = run_workers
        ids0 = res[0]["sampler_ids"]
        ids1 = res[1]["sampler_ids"]
        # same number of batches on every host (lockstep epochs)
        assert res[0]["sampler_batches"] == res[1]["sampler_batches"] > 0
        # disjoint modulo the bucket wrap-padding; union covers the dataset
        assert set(ids0) | set(ids1) == set(range(50))
        # rank-strided split: a sample appearing on both hosts can only be
        # a wrap-pad duplicate, so the MULTISET intersection must be small
        overlap = len([i for i in ids0 if i in set(ids1)])
        assert overlap <= 6, (ids0, ids1)

    def test_step_metrics_agree_across_hosts(self, run_workers):
        _, res = run_workers
        assert np.isfinite(res[0]["loss_g_total"])
        assert res[0]["loss_g_total"] == pytest.approx(
            res[1]["loss_g_total"], rel=1e-6
        )
        assert res[0]["loss_d_total"] == pytest.approx(
            res[1]["loss_d_total"], rel=1e-6
        )

    def test_two_process_checkpoint_restores_single_process(
        self, run_workers
    ):
        """The collective 2-process orbax save restores into this ONE
        process (different topology) — the preemption/elastic-restart
        contract (docs/RELIABILITY.md)."""
        out_dir, res = run_workers
        import jax
        import jax.numpy as jnp

        from bert_vits2_tpu.models import (
            DurationDiscriminator,
            MultiPeriodDiscriminator,
            Synthesizer,
        )
        from bert_vits2_tpu.train import (
            Models,
            TrainConfig,
            init_train_state,
        )
        from bert_vits2_tpu.train import checkpoint as ckpt
        from test_train import TINY, _make_batch

        synth = Synthesizer(TINY)
        mpd = MultiPeriodDiscriminator(
            periods=(2, 3),
            p_channels=(8, 16),
            s_specs=((8, 15, 1, 1, 7), (16, 41, 4, 4, 20), (16, 5, 1, 1, 2)),
        )
        dd = DurationDiscriminator(
            in_channels=TINY.hidden_channels, filter_channels=16,
            kernel_size=3, p_dropout=0.1, gin_channels=TINY.gin_channels,
        )
        b = _make_batch(b=2)
        rngs = {"params": jax.random.key(0), "noise": jax.random.key(1),
                "dropout": jax.random.key(2)}
        params_g = synth.init(
            rngs, b["x"], b["x_lengths"], b["spec"], b["spec_lengths"],
            b["sid"], b["tone"], b["language"], b["bert"], b["ja_bert"],
            b["en_bert"], deterministic=True,
        )["params"]
        params_d = mpd.init(
            jax.random.key(3), b["wave"][:, :64], b["wave"][:, :64]
        )["params"]
        dur = jnp.ones((2, b["x"].shape[1], 1))
        xm = jnp.ones(b["x"].shape, jnp.float32)
        hx = jnp.zeros(b["x"].shape + (TINY.hidden_channels,), jnp.float32)
        params_dd = dd.init(
            jax.random.key(4), hx, xm, dur, dur,
            g=jnp.ones((2, TINY.gin_channels)),
        )["params"]
        template = init_train_state(
            Models(synth, mpd, dd, None), TrainConfig(learning_rate=1e-4),
            params_g, params_d, params_dd, None,
        )
        restored, step = ckpt.restore_train_state(
            os.path.join(out_dir, "ckpt"), template
        )
        assert step == 1
        leaf = np.asarray(jax.tree.leaves(restored.params_g)[0], np.float64)
        assert float(leaf.sum()) == pytest.approx(
            res[0]["param_leaf_sum"], rel=1e-6
        )
