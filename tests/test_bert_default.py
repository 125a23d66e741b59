"""Default-path BERT wiring: engines must use REAL weights when present and
degrade to noise only loudly (reference infer.py:107-137 always computes real
BERT for the active language; VERDICT r3 item 1).

A tiny HF-format checkpoint (random weights, real tokenizer) stands in for
the 1024-d production models — same loading path, same word2ph alignment.
"""

import logging
import os

import numpy as np
import pytest

from bert_vits2_tpu.text.bert import (
    AutoBertExtractor,
    RandomBertExtractor,
    weights_present,
)

ZH_TEXT = "你好天气"
# char-level word2ph with CLS/SEP rows, post-intersperse style not needed
# for extractor-level tests: n_tokens = len(chars) + 2 = len(word2ph)
ZH_W2PH = [1, 2, 2, 2, 2, 1]


@pytest.fixture(scope="module")
def zh_weights_dir(tmp_path_factory):
    """Tiny BERT checkpoint dir in HF format (config + weights + tokenizer).

    hidden_size must be the production 1024 (get_text asserts BERT_DIM);
    intermediate/vocab stay tiny so the file is a few MB.
    """
    from transformers import BertConfig, BertModel, BertTokenizer

    d = tmp_path_factory.mktemp("bert_assets") / "zh"
    os.makedirs(d, exist_ok=True)
    bc = BertConfig(
        vocab_size=12, hidden_size=1024, num_hidden_layers=2,
        num_attention_heads=8, intermediate_size=32,
        max_position_embeddings=64, type_vocab_size=2,
    )
    BertModel(bc).eval().save_pretrained(d)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "你", "好", "天", "气", ",", ".", "!"]
    vf = d / "vocab.txt"
    vf.write_text("\n".join(vocab) + "\n", encoding="utf-8")
    BertTokenizer(str(vf)).save_pretrained(d)
    return str(d)


class TestAutoBertExtractor:
    def test_weights_present(self, zh_weights_dir, tmp_path):
        assert weights_present(zh_weights_dir)
        assert not weights_present(str(tmp_path / "nope"))

    def test_describe_reports_backends(self, zh_weights_dir):
        ext = AutoBertExtractor(paths={"ZH": zh_weights_dir})
        assert ext.describe() == {"ZH": "jax", "JP": "noise", "EN": "noise"}

    def test_real_weights_used_not_noise(self, zh_weights_dir):
        ext = AutoBertExtractor(paths={"ZH": zh_weights_dir})
        feats = ext(ZH_TEXT, ZH_W2PH, "ZH")
        assert feats.shape == (sum(ZH_W2PH), 1024)
        noise = RandomBertExtractor()(ZH_TEXT, ZH_W2PH, "ZH")
        assert not np.allclose(feats, noise)
        assert ext.describe()["ZH"] == "jax"

    def test_matches_direct_jax_extractor(self, zh_weights_dir):
        from bert_vits2_tpu.text.bert_jax import JaxBertExtractor

        auto = AutoBertExtractor(paths={"ZH": zh_weights_dir})
        direct = JaxBertExtractor(paths={"ZH": zh_weights_dir})
        np.testing.assert_allclose(
            auto(ZH_TEXT, ZH_W2PH, "ZH"),
            direct(ZH_TEXT, ZH_W2PH, "ZH"),
            atol=1e-6,
        )

    def test_missing_language_warns_and_falls_back(self, zh_weights_dir):
        ext = AutoBertExtractor(paths={"ZH": zh_weights_dir})
        with pytest.warns(UserWarning, match="NO BERT WEIGHTS.*JP"):
            feats = ext("こんにちは", [1, 5, 1], "JP")
        np.testing.assert_array_equal(
            feats, RandomBertExtractor()("こんにちは", [1, 5, 1], "JP")
        )
        assert ext.describe()["JP"] == "noise"

    def test_allow_noise_false_raises(self, tmp_path):
        # fails FAST at construction (ADVICE r4): a server started with
        # --require-bert must abort at load, not 500 on the first request
        with pytest.raises(FileNotFoundError, match="allow_noise=False"):
            AutoBertExtractor(
                paths={"ZH": str(tmp_path / "missing")}, allow_noise=False
            )

    def test_style_text_mixing_changes_features(self, zh_weights_dir):
        ext = AutoBertExtractor(paths={"ZH": zh_weights_dir})
        plain = ext(ZH_TEXT, ZH_W2PH, "ZH")
        styled = ext(ZH_TEXT, ZH_W2PH, "ZH", style_text="天气好",
                     style_weight=0.7)
        assert not np.allclose(plain, styled)


class TestEngineWiring:
    def test_get_text_uses_real_weights(self, zh_weights_dir):
        """The full get_text path (g2p + intersperse + extractor) must
        produce the extractor's features for the active language."""
        from bert_vits2_tpu.infer.api import get_text
        from bert_vits2_tpu.text.bert_jax import JaxBertExtractor

        auto = AutoBertExtractor(paths={"ZH": zh_weights_dir})
        phones, tones, langs, bert, ja_bert, en_bert = get_text(
            ZH_TEXT, "ZH", bert_extractor=auto
        )
        direct = JaxBertExtractor(paths={"ZH": zh_weights_dir})
        noise_out = get_text(ZH_TEXT, "ZH",
                             bert_extractor=RandomBertExtractor())
        assert not np.allclose(bert, noise_out[3])
        # features equal the direct extractor run through the same word2ph
        norm, phs, tns, w2ph = __import__(
            "bert_vits2_tpu.text", fromlist=["clean_text"]
        ).clean_text(ZH_TEXT, "ZH")
        w2ph = [w * 2 for w in w2ph]
        w2ph[0] += 1
        np.testing.assert_allclose(
            bert, direct(norm, w2ph, "ZH"), atol=1e-6
        )

    def test_load_tts_engine_default_is_auto(self, tmp_path, zh_weights_dir):
        """load_tts_engine with no explicit extractor builds an
        AutoBertExtractor and logs the backend map (server boot log)."""
        import json

        from bert_vits2_tpu.infer.loader import load_tts_engine

        config = {
            "version": "2.3",
            "data": {
                "sampling_rate": 44100, "filter_length": 128,
                "hop_length": 32, "win_length": 128, "n_speakers": 2,
                "spk2id": {"a": 0, "b": 1},
            },
            "model": {
                "inter_channels": 8, "hidden_channels": 8,
                "filter_channels": 16, "n_heads": 2, "n_layers": 1,
                "kernel_size": 3, "p_dropout": 0.1,
                "resblock": "1", "resblock_kernel_sizes": [3],
                "resblock_dilation_sizes": [[1, 3]],
                "upsample_rates": [4, 8], "upsample_initial_channel": 16,
                "upsample_kernel_sizes": [8, 16], "n_layers_q": 2,
                "use_spectral_norm": False, "gin_channels": 8,
            },
            "train": {"segment_size": 256},
        }
        cp = tmp_path / "config.json"
        cp.write_text(json.dumps(config), encoding="utf-8")
        logger = logging.getLogger("bert_vits2_tpu")
        records = []
        h = logging.Handler()
        h.emit = records.append
        logger.addHandler(h)
        old_level = logger.level
        logger.setLevel(logging.INFO)
        try:
            engine = load_tts_engine(
                str(cp), bert_paths={"ZH": zh_weights_dir}
            )
        finally:
            logger.removeHandler(h)
            logger.setLevel(old_level)
        assert isinstance(engine.bert_extractor, AutoBertExtractor)
        assert engine.bert_extractor.describe()["ZH"] == "jax"
        assert any("BERT extractors" in r.getMessage() for r in records)

    def test_engine_prepare_conditions_on_real_bert(self, zh_weights_dir,
                                                    tiny_model):
        """Two engines sharing weights, one with real BERT and one with
        noise, must prepare DIFFERENT conditioning features."""
        from bert_vits2_tpu.infer.api import TTSEngine

        model, params = tiny_model
        real = TTSEngine(
            model, {"params": params},
            bert_extractor=AutoBertExtractor(paths={"ZH": zh_weights_dir}),
        )
        noisy = TTSEngine(
            model, {"params": params},
            bert_extractor=RandomBertExtractor(),
        )
        r1 = real.prepare(ZH_TEXT, 0, language="ZH")
        r2 = noisy.prepare(ZH_TEXT, 0, language="ZH")
        assert not np.allclose(r1.inputs[3], r2.inputs[3])  # ZH features
        np.testing.assert_array_equal(r1.inputs[0], r2.inputs[0])  # phones
