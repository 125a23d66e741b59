"""Inference-engine tests (reference semantics: infer.py:107-437)."""

import numpy as np
import pytest

from bert_vits2_tpu.infer import TTSEngine, get_text
from bert_vits2_tpu.models import ModelConfig, Synthesizer


@pytest.fixture(scope="module")
def engine():
    import jax
    import jax.numpy as jnp

    cfg = ModelConfig(
        n_vocab=512, bert_dim=1024, spec_channels=33, segment_size=8,
        inter_channels=8, hidden_channels=8, filter_channels=16, n_heads=2,
        n_layers=2, resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
        upsample_rates=(4, 4), upsample_initial_channel=16,
        upsample_kernel_sizes=(8, 8), n_speakers=4, gin_channels=8,
        n_layers_trans_flow=2,
    )
    model = Synthesizer(cfg)
    b, t_x = 1, 8
    rngs = {"params": jax.random.key(0), "noise": jax.random.key(1),
            "dropout": jax.random.key(2)}
    bert = jnp.zeros((b, t_x, cfg.bert_dim))
    params = model.init(
        rngs, jnp.zeros((b, t_x), jnp.int32), jnp.asarray([t_x]),
        jnp.zeros((b, 16, cfg.spec_channels)), jnp.asarray([16]),
        jnp.zeros((b,), jnp.int32), jnp.zeros((b, t_x), jnp.int32),
        jnp.zeros((b, t_x), jnp.int32), bert, bert, bert, deterministic=True,
    )
    return TTSEngine(model, params, spk2id={"alice": 1, "bob": 2},
                     text_buckets=(32, 64), frames_per_token=4)


class TestGetText:
    def test_shapes_and_intersperse(self):
        phones, tones, langs, bert, ja, en = get_text("こんにちは。", "JP")
        t = len(phones)
        assert t % 2 == 1 and (phones[0::2] == 0).all()
        assert tones.shape == langs.shape == (t,)
        assert bert.shape == ja.shape == en.shape == (t, 1024)
        assert (langs[1::2] == 1).all()  # JP id broadcast over real tokens

    def test_inactive_language_noise_not_zero(self):
        _, _, _, bert, ja, en = get_text("hello world.", "EN")
        assert np.abs(bert).max() > 0 and np.abs(ja).max() > 0
        assert not np.allclose(bert, ja)


class TestEngine:
    def test_infer_produces_audio(self, engine):
        wave = engine.infer("おはようございます。", speaker="alice", language="JP",
                            sdp_ratio=0.0, noise_scale=0.0, noise_scale_w=0.0)
        assert wave.ndim == 1 and len(wave) > 0
        assert np.isfinite(wave).all() and np.abs(wave).max() <= 1.0

    def test_speaker_resolution(self, engine):
        assert engine.resolve_speaker("bob") == 2
        assert engine.resolve_speaker(3) == 3

    def test_deterministic_given_seed(self, engine):
        kw = dict(speaker=1, language="JP", sdp_ratio=0.0, noise_scale=0.4,
                  noise_scale_w=0.0, seed=5)
        a = engine.infer("こんにちは。", **kw)
        b = engine.infer("こんにちは。", **kw)
        np.testing.assert_array_equal(a, b)

    def test_jit_cache_reuse(self, engine):
        engine.infer("テスト。", speaker=0, language="JP")
        n = len(engine._jitted)
        engine.infer("もういちど。", speaker=0, language="JP")
        assert len(engine._jitted) == n  # same bucket -> no recompile

    def test_multilang_concat(self, engine):
        wave = engine.infer_multilang(
            [("你好。", "ZH"), ("hello.", "EN")], speaker=0,
            sdp_ratio=0.0, noise_scale=0.0, noise_scale_w=0.0,
        )
        assert len(wave) > 0 and np.isfinite(wave).all()


class TestLoader:
    def test_load_tts_engine_random_init(self, tmp_path):
        """load_tts_engine with no checkpoint builds a working engine."""
        import json

        import numpy as np

        from bert_vits2_tpu.infer import load_tts_engine

        cfg = dict(
            version="2.3",
            train=dict(segment_size=128),
            data=dict(
                sampling_rate=1600, filter_length=64, hop_length=16,
                win_length=64, n_mel_channels=16, mel_fmin=0.0, mel_fmax=None,
                add_blank=True, n_speakers=4, spk2id=dict(alice=1),
            ),
            model=dict(
                inter_channels=8, hidden_channels=8, filter_channels=16,
                n_heads=2, n_layers=2, kernel_size=3, p_dropout=0.1,
                resblock="1", resblock_kernel_sizes=[3],
                resblock_dilation_sizes=[[1, 3]], upsample_rates=[4, 4],
                upsample_initial_channel=16, upsample_kernel_sizes=[8, 8],
                gin_channels=8, n_layers_trans_flow=2,
            ),
        )
        p = tmp_path / "config.json"
        p.write_text(json.dumps(cfg))
        eng = load_tts_engine(str(p))
        wave = eng.infer("你好。", speaker="alice", language="ZH",
                         sdp_ratio=0.0, noise_scale=0.0, noise_scale_w=0.0)
        assert wave.ndim == 1 and len(wave) > 0 and np.isfinite(wave).all()
        assert eng.sampling_rate == 1600


class TestBatchedInfer:
    def test_infer_batch_matches_shapes(self, engine):
        waves = engine.infer_batch(
            ["おはよう。", "こんにちは、みなさん、おげんきですか。"],
            speakers=["alice", "bob"],
            language="JP", sdp_ratio=0.0, noise_scale=0.0, noise_scale_w=0.0,
        )
        assert len(waves) == 2
        for w in waves:
            assert w.ndim == 1 and len(w) > 0
            assert np.isfinite(w).all()
        # longer text -> at least as much audio (deterministic durations)
        assert len(waves[1]) >= len(waves[0])

    def test_per_item_knobs_in_one_batch(self, engine):
        """Heterogeneous knobs share one device call: per-item length_scale
        stretches only its own row (Synthesizer.infer [b]-knob broadcast)."""
        text = "こんにちは。"
        waves = engine.infer_batch(
            [text, text], speakers=[1, 1], language="JP",
            sdp_ratio=0.0, noise_scale=0.0, noise_scale_w=0.0,
            length_scale=[1.0, 2.0],
        )
        assert len(waves[1]) > len(waves[0])
        # row 0 (length_scale 1.0) must match a solo call with scalar knobs
        # (the batch pads to a larger frame cap: compare the common prefix)
        solo = engine.infer(text, speaker=1, language="JP", sdp_ratio=0.0,
                            noise_scale=0.0, noise_scale_w=0.0,
                            length_scale=1.0)
        n = min(len(waves[0]), len(solo))
        assert n > 0
        np.testing.assert_allclose(waves[0][:n], solo[:n], atol=2e-5)

    def test_run_prepared_identical_rows_agree(self, engine):
        req = engine.prepare("テストです。", 1, language="JP", sdp_ratio=0.0,
                             noise_scale=0.0, noise_scale_w=0.0)
        a, b = engine.run_prepared([req, req])
        np.testing.assert_array_equal(a, b)

    def test_prepare_segments_matches_infer_multilang(self, engine):
        segs = [("你好。", "ZH"), ("hello.", "EN")]
        kw = dict(sdp_ratio=0.0, noise_scale=0.0, noise_scale_w=0.0)
        req = engine.prepare(None, 0, segments=segs, **kw)
        a = engine.run_prepared([req])[0]
        b = engine.infer_multilang(segs, speaker=0, **kw)
        np.testing.assert_array_equal(a, b)


class TestServeBatching:
    def test_run_prepared_pads_batch_to_power_of_two(self, engine):
        """3 requests ride an internally padded batch of 4; exactly 3 waves
        come back, matching the 1-request result per row."""
        reqs = [engine.prepare("テスト。", speaker=0, language="JP", seed=5)
                for _ in range(3)]
        waves = engine.run_prepared(reqs)
        assert len(waves) == 3

    def test_mixed_emo_kinds_rejected(self, engine):
        import numpy as np

        a = engine.prepare("テスト。", speaker=0, language="JP")
        b = a._replace(emo=np.zeros((1, 1024), np.float32))
        c = a._replace(emo=np.zeros(1, np.int32))
        with pytest.raises(ValueError, match="emotion input kinds"):
            engine.run_prepared([b, c])

    def test_warmup_compiles_grid(self, engine):
        n = engine.warmup(batch_sizes=(1,), buckets=(32,))
        assert n == 1
        # warmed graph is reused by a real request
        before = len(engine._jitted)
        engine.infer("テスト。", speaker=0, language="JP")
        assert len(engine._jitted) == before


class TestDataParallelInference:
    """Batched synthesis sharded over the `data` mesh axis matches the
    single-device engine bitwise-for-seed (BASELINE.md scaling target;
    inference analog of the training DP test)."""

    def test_dp_engine_matches_single_device(self, engine):
        import jax

        from bert_vits2_tpu.infer.api import TTSEngine
        from bert_vits2_tpu.parallel import make_mesh

        mesh = make_mesh(n_data=8, n_model=1)
        dp = TTSEngine(
            engine.model, engine.params,
            spk2id={"alice": 1, "bob": 2},
            text_buckets=(32, 64), frames_per_token=4, mesh=mesh,
        )
        texts = [
            ("おはようございます。", "alice"),
            ("こんばんは。", "bob"),
            ("ありがとう。", "alice"),
        ]
        reqs = [
            engine.prepare(t, speaker=s, language="JP", seed=5)
            for t, s in texts
        ]
        want = engine.run_prepared(reqs)
        reqs_dp = [
            dp.prepare(t, speaker=s, language="JP", seed=5)
            for t, s in texts
        ]
        got = dp.run_prepared(reqs_dp)
        assert len(got) == len(want)
        for w, g in zip(want, got):
            np.testing.assert_allclose(g, w, atol=2e-5, rtol=1e-4)
