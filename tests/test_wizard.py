"""Dataset wizard end-to-end on a synthetic two-utterance corpus
(reference: webui_preprocess.py:18-94)."""

import json
import os

import numpy as np
import pytest


@pytest.fixture
def corpus(tmp_path):
    from scipy.io import wavfile

    root = tmp_path / "data" / "demo"
    raw = root / "raw"
    raw.mkdir(parents=True)
    rng = np.random.default_rng(0)
    rows = []
    for i, (spk, lang, text) in enumerate(
        [("alice", "ZH", "你好世界。"), ("bob", "ZH", "今天天气不错。")]
    ):
        wav = (rng.normal(size=24000) * 3000).astype(np.int16)
        wavfile.write(raw / f"u{i}.wav", 22050, wav)
        rows.append(f"u{i}.wav|{spk}|{lang}|{text}")
    (root / "esd.list").write_text("\n".join(rows) + "\n", encoding="utf-8")
    return tmp_path


def test_wizard_all_steps(corpus, monkeypatch):
    from bert_vits2_tpu.preprocess import wizard

    data_root = str(corpus / "data")
    # config
    assert "config" in wizard.generate_config("demo", batch_size=4,
                                              data_root=data_root)
    p = wizard.get_paths("demo", data_root)
    cfg = json.load(open(p["config"], encoding="utf-8"))
    assert cfg["train"]["batch_size"] == 4
    assert cfg["data"]["sampling_rate"] == 44100
    # resample raw/ -> wavs/ at 44.1k
    msg = wizard.resample("demo", processes=1, data_root=data_root)
    assert "2/2" in msg
    from scipy.io import wavfile

    sr, data = wavfile.read(os.path.join(p["wavs"], "u0.wav"))
    assert sr == 44100 and data.ndim == 1
    # text: path rewrite + g2p + split + spk2id
    msg = wizard.preprocess_text_step("demo", data_root=data_root)
    assert "2 speakers" in msg
    assert os.path.isfile(p["train"]) and os.path.isfile(p["val"])
    cfg = json.load(open(p["config"], encoding="utf-8"))
    assert set(cfg["data"]["spk2id"]) == {"alice", "bob"}
    # bert + spec caches
    wizard.bert_gen_step("demo", data_root=data_root)
    wizard.spec_gen_step("demo", data_root=data_root)
    for fn in ("u0", "u1"):
        base = os.path.join(p["wavs"], fn)
        assert os.path.isfile(base + ".bert.npy")
        assert os.path.isfile(base + ".spec.npy")
        spec = np.load(base + ".spec.npy")
        assert spec.shape[-1] == 2048 // 2 + 1 or spec.shape[0] == 2048 // 2 + 1
