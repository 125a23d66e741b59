"""Serving-layer tests: language ID / segmentation, mix markup, model
registry, and the HTTP API end-to-end on a localhost port."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from bert_vits2_tpu.serve import (
    ModelRegistry,
    classify_language,
    cut_sentences,
    parse_mix_text,
    sentence_split,
    split_by_language,
    validate_mix_text,
)


class TestClassifyLanguage:
    def test_scripts(self):
        assert classify_language("今晚在院子里坐着乘凉") == "zh"
        assert classify_language("こんにちは、世界") == "ja"
        assert classify_language("hello world") == "en"

    def test_han_only_restricted_to_ja(self):
        # kanji-only text for a JA-only model classifies as ja
        assert classify_language("東京", ["ja"]) == "ja"
        assert classify_language("東京", ["zh", "ja"]) == "zh"

    def test_targets_respected(self):
        assert classify_language("hello", ["zh", "ja"]) in ("zh", "ja")


class TestSplitByLanguage:
    def test_covers_text_exactly(self):
        text = "你好，这是一段文本。こんにちは,これはテストです.Hello, this is a test."
        segs = split_by_language(text, ["zh", "ja", "en"])
        assert "".join(s for s, _ in segs) == text
        langs = [l for _, l in segs]
        assert "zh" in langs and "ja" in langs and "en" in langs

    def test_alpha_nonalpha(self):
        segs = split_by_language("vits和Bert是模型", ["zh", "en"])
        assert "".join(s for s, _ in segs) == "vits和Bert是模型"
        assert segs[0][1] == "en"


class TestSentenceSplit:
    def test_chunks(self):
        text = "这几天心里颇不宁静。今晚在院子里坐着乘凉，忽然想起日日走过的荷塘。" * 3
        chunks = sentence_split(text, 50)
        assert all(len(c) >= 1 for c in chunks)
        assert sum(len(c) for c in chunks) >= len(text) - 10

    def test_cut_sentences(self):
        sents = cut_sentences("你好。今天天气不错！明天见？")
        assert len(sents) == 3


class TestMixMarkup:
    TEXT = "[说话人1]<zh>你好吗？<jp>元気ですか？\n[说话人2]<zh>谢谢。"

    def test_parse(self):
        parsed = parse_mix_text(self.TEXT)
        assert parsed[0][0] == "说话人1"
        assert parsed[0][1] == [("ZH", "你好吗？"), ("JP", "元気ですか？")]
        assert parsed[1] == ("说话人2", [("ZH", "谢谢。")])

    def test_validate(self):
        ok, _ = validate_mix_text(self.TEXT)
        assert ok
        bad, msg = validate_mix_text("no markup at all")
        assert not bad and "No valid speaker" in msg


class TestRegistry:
    def test_refcount_alias_and_delete(self, tmp_path):
        ckpt = tmp_path / "G_100.pth"
        ckpt.write_bytes(b"x")
        cfg = tmp_path / "config.json"
        cfg.write_text("{}")
        reg = ModelRegistry(loader=lambda mp, cp: object())
        a = reg.init_model(str(ckpt), str(cfg))
        b = reg.init_model(str(ckpt), str(cfg))  # alias, no reload
        assert reg.get(a) is reg.get(b)
        assert len(reg.info()) == 2
        assert reg.del_model(a) == a
        assert b in reg and a not in reg
        assert reg.del_model(a) is None

    def test_release_reports_remaining_refs_atomically(self, tmp_path):
        ckpt = tmp_path / "G_100.pth"
        ckpt.write_bytes(b"x")
        cfg = tmp_path / "config.json"
        cfg.write_text("{}")
        reg = ModelRegistry(loader=lambda mp, cp: object())
        a = reg.init_model(str(ckpt), str(cfg))
        b = reg.init_model(str(ckpt), str(cfg))
        eng, still = reg.release(a)
        assert eng is reg.get(b) and still
        eng2, still2 = reg.release(b)
        assert eng2 is eng and not still2
        assert reg.release(b) == (None, False)


@pytest.fixture(scope="module")
def http_server():
    import jax
    import jax.numpy as jnp

    from bert_vits2_tpu.infer import TTSEngine
    from bert_vits2_tpu.models import ModelConfig, Synthesizer
    from bert_vits2_tpu.serve.server import make_server

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
    engine = TTSEngine(model, params, spk2id={"alice": 1},
                       sampling_rate=1600, text_buckets=(32, 64),
                       frames_per_token=4)
    registry = ModelRegistry()
    registry.init_model("dummy.ckpt", "dummy.json", engine=engine)
    srv = make_server(registry, "127.0.0.1", 0)
    port = srv.server_address[1]
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()
    srv.server_close()  # joins micro-batcher worker threads


class TestHTTPServer:
    def test_voice_returns_wav(self, http_server):
        from urllib.parse import urlencode

        q = urlencode(dict(text="你好", model_id=0, speaker_name="alice",
                           language="ZH", sdp_ratio=0, noise=0, noisew=0))
        url = f"{http_server}/voice?{q}"
        with urllib.request.urlopen(url, timeout=600) as r:
            body = r.read()
            assert r.headers["Content-Type"] == "audio/wav"
        assert body[:4] == b"RIFF"
        assert len(body) > 100  # header + nonempty PCM payload

    def test_models_info_and_status(self, http_server):
        with urllib.request.urlopen(f"{http_server}/models/info", timeout=30) as r:
            info = json.loads(r.read())
        assert "0" in info and info["0"]["speakers"] == {"alice": 1}
        with urllib.request.urlopen(f"{http_server}/status", timeout=30) as r:
            st = json.loads(r.read())
        assert st["status"] == 0 and "memory_percent" in st["Data"]

    def test_unknown_model_is_client_error(self, http_server):
        url = f"{http_server}/voice?text=hi&model_id=99&speaker_id=0"
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(url, timeout=30)
        assert e.value.code == 400

    def test_models_delete(self, http_server):
        # add alias then delete it; model 0 must survive
        with urllib.request.urlopen(
            f"{http_server}/models/delete?model_id=42", timeout=30
        ) as r:
            res = json.loads(r.read())
        assert res["status"] == 14
