"""Length-aware serving packing (VERDICT r3 item 5): frame caps come from
PREDICTED durations, piles are length-sorted into chunks, and delivered
frames are accounted against chip capacity."""

import numpy as np
import pytest

from bert_vits2_tpu.infer.api import PreparedRequest, TTSEngine


@pytest.fixture(scope="module")
def engine(tiny_model):
    model, params = tiny_model
    return TTSEngine(
        model, {"params": params},
        text_buckets=(8, 16, 32), frames_per_token=6, frame_multiple=8,
    )


def _req(cfg, rng, t, length_scale=1.0, sdp_ratio=0.0, seed=0):
    inputs = (
        rng.integers(1, cfg.n_vocab, t).astype(np.int32),
        rng.integers(0, cfg.num_tones, t).astype(np.int32),
        rng.integers(0, cfg.num_languages, t).astype(np.int32),
        rng.normal(size=(t, cfg.bert_dim)).astype(np.float32),
        rng.normal(size=(t, cfg.bert_dim)).astype(np.float32),
        rng.normal(size=(t, cfg.bert_dim)).astype(np.float32),
    )
    return PreparedRequest(
        inputs=inputs, sid=int(rng.integers(0, cfg.n_speakers)),
        length_scale=length_scale, sdp_ratio=sdp_ratio, seed=seed,
    )


class TestPredictFrames:
    def test_prediction_matches_synthesis_exactly(self, engine):
        """predict_durations is a literal prefix of infer: same rng stream,
        so run_prepared's trimmed lengths == min(prediction, cap)."""
        cfg = engine.model.cfg
        rng = np.random.default_rng(0)
        reqs = [_req(cfg, rng, t, sdp_ratio=0.5) for t in (5, 8, 11)]
        pred = engine.predict_frames(reqs)
        waves = engine.run_prepared(reqs)
        hop = engine.hop_length
        m = engine.frame_multiple
        cap = min(
            -(-int(pred.max()) // m) * m,
            engine._frame_cap(engine._bucket(11), 1.0),
        )
        for p, w in zip(pred, waves):
            assert len(w) == min(int(p), cap) * hop

    def test_cap_follows_prediction_not_worst_case(self, engine):
        """With short predicted durations the chip must synthesize far
        fewer frames than the tokens*frames_per_token worst case."""
        cfg = engine.model.cfg
        rng = np.random.default_rng(1)
        reqs = [_req(cfg, rng, 8) for _ in range(2)]
        engine.stats = {"frames_capacity": 0, "frames_delivered": 0}
        engine.run_prepared(reqs)
        worst = engine._frame_cap(8, 1.0)
        per_item_cap = engine.stats["frames_capacity"] // 2
        pred_max = int(engine.predict_frames(reqs).max())
        if pred_max < worst - engine.frame_multiple:
            assert per_item_cap < worst
        assert per_item_cap >= min(pred_max, worst)

    def test_stats_account_padding(self, engine):
        cfg = engine.model.cfg
        rng = np.random.default_rng(2)
        reqs = [_req(cfg, rng, 6), _req(cfg, rng, 12)]
        engine.stats = {"frames_capacity": 0, "frames_delivered": 0}
        waves = engine.run_prepared(reqs)
        hop = engine.hop_length
        assert engine.stats["frames_delivered"] == sum(
            len(w) // hop for w in waves
        )
        assert engine.stats["frames_capacity"] >= engine.stats[
            "frames_delivered"
        ]


class TestRunPacked:
    def test_order_preserved_and_lengths_match(self, engine):
        """run_packed returns waveforms in request order with the same
        per-request lengths as unpacked synthesis (sdp_ratio=0 so
        durations are deterministic across batch layouts)."""
        cfg = engine.model.cfg
        rng = np.random.default_rng(3)
        reqs = [_req(cfg, rng, t) for t in (4, 12, 6, 10, 5)]
        packed = engine.run_packed(reqs, max_batch=2)
        singles = [engine.run_prepared([r])[0] for r in reqs]
        assert len(packed) == len(reqs)
        for p, s in zip(packed, singles):
            assert len(p) == len(s)

    def test_packed_capacity_below_single_cap_batching(self, engine):
        """Length-sorted chunks must synthesize fewer total frames than one
        batch padded to the global max (mixed lengths)."""
        cfg = engine.model.cfg
        rng = np.random.default_rng(4)
        reqs = [_req(cfg, rng, t) for t in (4, 4, 4, 4, 16, 16, 16, 16)]
        pred = engine.predict_frames(reqs)
        if len(set(int(p) for p in pred)) < 2:
            pytest.skip("degenerate tiny model predicts uniform durations")
        engine.stats = {"frames_capacity": 0, "frames_delivered": 0}
        engine.run_packed(reqs, max_batch=4)
        packed_capacity = engine.stats["frames_capacity"]
        engine.stats = {"frames_capacity": 0, "frames_delivered": 0}
        engine.run_prepared(reqs)
        single_capacity = engine.stats["frames_capacity"]
        assert packed_capacity <= single_capacity

    def test_infer_batch_chunks_large_piles(self, engine):
        cfg = engine.model.cfg
        rng = np.random.default_rng(5)
        reqs = [_req(cfg, rng, int(t)) for t in rng.integers(4, 14, 5)]
        out = engine.run_packed(reqs, max_batch=2)
        assert all(isinstance(w, np.ndarray) and w.ndim == 1 for w in out)

    def test_return_waves_false_gives_lengths(self, engine):
        """Scalar-drain mode: lengths (in samples) match the waves."""
        cfg = engine.model.cfg
        rng = np.random.default_rng(6)
        reqs = [_req(cfg, rng, t) for t in (5, 9)]
        waves = engine.run_prepared(reqs)
        lens = engine.run_prepared(reqs, return_waves=False)
        assert lens == [len(w) for w in waves]
        lens_packed = engine.run_packed(reqs, max_batch=1,
                                        return_waves=False)
        singles = [engine.run_prepared([r])[0] for r in reqs]
        assert lens_packed == [len(w) for w in singles]
