"""Micro-batching tests (serve/batcher.py + the batched /voice path).

Uses a fake engine (no jax) so batching logic is pinned independently of
model compiles; end-to-end batched synthesis over a real tiny model is
covered by test_serve.py's HTTP tests (TTSService defaults to batching).
"""

import threading
import time
from types import SimpleNamespace

import numpy as np
import pytest

from bert_vits2_tpu.infer.api import PreparedRequest
from bert_vits2_tpu.serve.batcher import MicroBatcher


def _req(t: int, sid: int = 0, **kw) -> PreparedRequest:
    inputs = tuple(np.zeros((t,), np.float32) for _ in range(6))
    return PreparedRequest(inputs=inputs, sid=sid, **kw)


class FakeEngine:
    """run_prepared returns each request's sid as a 1-sample wave and
    records per-call batch sizes."""

    def __init__(self, call_delay_s: float = 0.0, buckets=(32, 64)):
        self.calls: list[list[PreparedRequest]] = []
        self.call_delay_s = call_delay_s
        self.buckets = buckets
        self.sampling_rate = 1600
        self.model = SimpleNamespace(cfg=SimpleNamespace(emotion="none"))

    def _bucket(self, t: int) -> int:
        for b in self.buckets:
            if t <= b:
                return b
        return t

    def group_key(self, req):
        emo_kind = (
            None if req.emo is None else (req.emo.dtype.str, req.emo.shape[1:])
        )
        return (self._bucket(len(req.inputs[0])), emo_kind)

    def prepare(self, text, speaker, language="ZH", segments=None, **kw):
        n = len(text or "".join(s for s, _ in segments))
        knobs = {
            k: kw[k]
            for k in ("sdp_ratio", "noise_scale", "noise_scale_w",
                      "length_scale", "seed")
            if k in kw
        }
        return _req(max(n, 1), sid=int(speaker), **knobs)

    def run_prepared(self, reqs):
        self.calls.append(list(reqs))
        if self.call_delay_s:
            time.sleep(self.call_delay_s)
        return [np.full((1,), r.sid, np.float32) for r in reqs]


class TestMicroBatcher:
    def test_submit_many_is_one_call_in_order(self):
        eng = FakeEngine()
        mb = MicroBatcher(eng, max_batch=16, max_delay_s=0.05)
        try:
            reqs = [_req(8, sid=i) for i in range(5)]
            waves = mb.submit(reqs)
            assert [int(w[0]) for w in waves] == list(range(5))
            assert len(eng.calls) == 1 and len(eng.calls[0]) == 5
        finally:
            mb.close()

    def test_concurrent_clients_share_a_batch(self):
        eng = FakeEngine(call_delay_s=0.02)
        mb = MicroBatcher(eng, max_batch=16, max_delay_s=0.05)
        results = {}

        def client(i):
            results[i] = mb.submit([_req(8, sid=i)])[0]

        try:
            threads = [threading.Thread(target=client, args=(i,))
                       for i in range(6)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            assert all(int(results[i][0]) == i for i in range(6))
            assert max(len(c) for c in eng.calls) > 1  # some batching happened
        finally:
            mb.close()

    def test_max_batch_respected(self):
        eng = FakeEngine()
        mb = MicroBatcher(eng, max_batch=4, max_delay_s=0.05)
        try:
            mb.submit([_req(8, sid=i) for i in range(10)])
            assert all(len(c) <= 4 for c in eng.calls)
            assert sum(len(c) for c in eng.calls) == 10
        finally:
            mb.close()

    def test_different_buckets_not_merged(self):
        eng = FakeEngine(buckets=(32, 64))
        mb = MicroBatcher(eng, max_batch=16, max_delay_s=0.02)
        try:
            mb.submit([_req(8), _req(50), _req(8), _req(50)])
            for call in eng.calls:
                assert len({eng._bucket(len(r.inputs[0])) for r in call}) == 1
        finally:
            mb.close()

    def test_mixed_emo_kinds_not_merged(self):
        """V2.1 engines take either a [1] int32 codebook index or a [1,1024]
        float vector (infer/api.py _resolve_emotion); those are different jit
        graphs and must never ride one batch."""
        eng = FakeEngine()
        mb = MicroBatcher(eng, max_batch=16, max_delay_s=0.02)
        try:
            idx = _req(8)._replace(emo=np.zeros(1, np.int32))
            vec = _req(8)._replace(emo=np.zeros((1, 1024), np.float32))
            mb.submit([idx, vec, idx, vec])
            assert len(eng.calls) >= 2
            for call in eng.calls:
                assert len({eng.group_key(r) for r in call}) == 1
        finally:
            mb.close()

    def test_error_propagates_to_waiters(self):
        eng = FakeEngine()

        def boom(reqs):
            raise ValueError("device on fire")

        eng.run_prepared = boom
        mb = MicroBatcher(eng, max_batch=4, max_delay_s=0.01)
        try:
            with pytest.raises(ValueError, match="device on fire"):
                mb.submit([_req(8)])
        finally:
            mb.close()

    def test_closed_batcher_rejects(self):
        eng = FakeEngine()
        mb = MicroBatcher(eng)
        mb.close()
        with pytest.raises(RuntimeError):
            mb.submit([_req(8)])


class TestBatchedVoicePath:
    """TTSService.voice batches an auto-split paragraph into one device call."""

    def _service(self, eng, batching=True):
        from bert_vits2_tpu.serve.registry import ModelRegistry
        from bert_vits2_tpu.serve.server import TTSService

        reg = ModelRegistry()
        reg.init_model("dummy.ckpt", "dummy.json", engine=eng)
        return TTSService(reg, batching=batching, batch_delay_ms=5.0)

    def test_auto_split_rides_one_batch(self):
        eng = FakeEngine()
        svc = self._service(eng)
        audio, sr = svc.voice(
            "第一句。第二句。第三句。", 0, speaker=1, language="ZH",
            auto_split=True, silence_ms=10,
        )
        assert sr == eng.sampling_rate
        # 3 sentences -> one batched call of 3, plus 2 silence gaps
        assert len(eng.calls) == 1 and len(eng.calls[0]) == 3
        assert len(audio) == 3 * 1 + 2 * int(eng.sampling_rate * 10 / 1000)
        svc.models_delete(0)  # also exercises batcher retirement
        assert id(eng) not in svc._batchers

    def test_batching_disabled_still_one_run_prepared(self):
        eng = FakeEngine()
        svc = self._service(eng, batching=False)
        svc.voice("一句。二句。", 0, speaker=1, language="ZH",
                  auto_split=True, silence_ms=0)
        assert len(eng.calls) == 1 and len(eng.calls[0]) == 2
