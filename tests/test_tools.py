"""Tooling tests: preprocessing CLIs, global yaml config, compress/mix."""

import json
import os

import numpy as np
import pytest


class TestResample:
    def test_rate_conversion(self, tmp_path):
        from scipy.io import wavfile

        from bert_vits2_tpu.preprocess.resample import resample_file

        src = tmp_path / "a.wav"
        rng = np.random.default_rng(0)
        wavfile.write(src, 16000, (rng.uniform(-0.3, 0.3, 16000) * 32767).astype(np.int16))
        dst = tmp_path / "out" / "a.wav"
        resample_file(str(src), str(dst), sr_out=44100)
        sr, data = wavfile.read(dst)
        assert sr == 44100
        assert abs(len(data) - 44100) < 100  # ~1 s preserved


class TestPreprocessText:
    def test_end_to_end(self, tmp_path):
        from scipy.io import wavfile

        from bert_vits2_tpu.preprocess.text import preprocess_text

        rows = []
        for i in range(6):
            wav = tmp_path / f"u{i}.wav"
            wavfile.write(wav, 44100, np.zeros(1000, np.int16))
            rows.append(f"{wav}|spk{i % 2}|ZH|你好世界")
        # a duplicate and a missing-file row get filtered
        rows.append(rows[0])
        rows.append(f"{tmp_path}/missing.wav|spk0|ZH|你好")
        lst = tmp_path / "trans.list"
        lst.write_text("\n".join(rows), encoding="utf-8")
        cfg = tmp_path / "config.json"
        cfg.write_text(json.dumps({"data": {}}))

        spk2id = preprocess_text(
            str(lst), config_path=str(cfg), val_per_lang=1, max_val_total=2
        )
        assert spk2id == {"spk0": 0, "spk1": 1}
        cleaned = (tmp_path / "trans.list.cleaned").read_text(encoding="utf-8")
        first = cleaned.splitlines()[0].split("|")
        assert len(first) == 7
        phones, tones, word2ph = first[4].split(), first[5].split(), first[6]
        assert len(phones) == len(tones) and len(phones) > 2
        train = (tmp_path / "train.list").read_text(encoding="utf-8").splitlines()
        val = (tmp_path / "val.list").read_text(encoding="utf-8").splitlines()
        assert len(train) == 5 and len(val) == 1
        updated = json.loads(cfg.read_text())
        assert updated["data"]["n_speakers"] == 2
        assert updated["version"] == "2.3"

    def test_caches(self, tmp_path):
        from scipy.io import wavfile

        from bert_vits2_tpu.preprocess.bert_gen import bert_gen
        from bert_vits2_tpu.preprocess.spec_gen import spec_gen

        wav = tmp_path / "u0.wav"
        wavfile.write(wav, 44100, np.zeros(4096, np.int16))
        row = f"{wav}|spk0|ZH|你好|n i h ao|0 0 0 0|2 2"
        lst = tmp_path / "f.list"
        lst.write_text(row, encoding="utf-8")

        spec_gen(str(lst), 2048, 512, 2048, processes=1)
        spec = np.load(str(wav).replace(".wav", ".spec.npy"))
        assert spec.shape[1] == 1025

        n = bert_gen(str(lst))
        assert n == 1
        bert = np.load(str(wav).replace(".wav", ".bert.npy"))
        assert bert.shape == (9, 1024)  # 4 phones interspersed + 1


class TestGlobalConfig:
    def test_yaml_roundtrip(self, tmp_path, monkeypatch):
        import yaml

        from bert_vits2_tpu.config import Config

        yml = tmp_path / "config.yml"
        yml.write_text(
            yaml.safe_dump(
                dict(
                    dataset_path=str(tmp_path),
                    resample=dict(in_dir="raw", out_dir="wavs", sampling_rate=22050),
                    preprocess_text=dict(val_per_lang=2),
                    server=dict(port=9999, models=[]),
                )
            )
        )
        cfg = Config(str(yml))
        assert cfg.resample_config.sampling_rate == 22050
        assert cfg.resample_config.in_dir == os.path.join(str(tmp_path), "raw")
        assert cfg.preprocess_text_config.val_per_lang == 2
        assert cfg.server_config.port == 9999

    def test_missing_file_defaults(self, tmp_path, monkeypatch):
        from bert_vits2_tpu.config import Config

        monkeypatch.chdir(tmp_path)
        cfg = Config("nonexistent.yml")
        assert cfg.server_config.port == 5000


class TestModelTools:
    def _params(self, seed=0):
        rng = np.random.default_rng(seed)
        return {
            "enc_p": {"emb": {"embedding": rng.normal(size=(4, 3)).astype(np.float32)}},
            "enc_q": {"pre": {"kernel": rng.normal(size=(2, 2)).astype(np.float32)}},
            "dec": {"conv": {"kernel": rng.normal(size=(3, 3)).astype(np.float32)}},
        }

    def test_compress_strips_enc_q_and_halves(self):
        from bert_vits2_tpu.utils.model_tools import compress_params

        c = compress_params(self._params(), half=True)
        assert "enc_q" not in c
        assert c["dec"]["conv"]["kernel"].dtype == np.float16

    def test_release_roundtrip(self, tmp_path):
        from bert_vits2_tpu.utils.model_tools import load_release, save_release

        p = self._params()
        path = str(tmp_path / "release.npz")
        save_release(path, p)
        r = load_release(path)
        np.testing.assert_array_equal(
            r["dec"]["conv"]["kernel"], p["dec"]["conv"]["kernel"]
        )
        assert "enc_q" not in r

    def test_mix_ratios(self):
        from bert_vits2_tpu.utils.model_tools import mix_params

        a, b = self._params(0), self._params(1)
        m = mix_params(a, b, voice_ratio=(1.0, 0.0), tone_ratio=(0.0, 1.0))
        np.testing.assert_array_equal(
            m["dec"]["conv"]["kernel"], a["dec"]["conv"]["kernel"]
        )
        np.testing.assert_array_equal(
            m["enc_p"]["emb"]["embedding"], b["enc_p"]["emb"]["embedding"]
        )


class TestFetchAssets:
    def test_check_and_report(self, tmp_path, capsys):
        from bert_vits2_tpu.tools.fetch_assets import check_asset, run

        # empty root: everything missing, exit 1
        assert run(str(tmp_path), ["slm"], fetch=False) == 1
        out = capsys.readouterr().out
        assert "wavlm-base-plus" in out and "MISS" in out

        # a populated asset passes
        d = tmp_path / "slm" / "wavlm-base-plus"
        d.mkdir(parents=True)
        (d / "config.json").write_text("{}")
        (d / "model.safetensors").write_bytes(b"\0")
        ok, status = check_asset(str(tmp_path), "slm/wavlm-base-plus")
        assert ok, status
        assert run(str(tmp_path), ["slm"], fetch=False) == 0

    def test_missing_extra_file_detected(self, tmp_path):
        from bert_vits2_tpu.tools.fetch_assets import check_asset

        d = tmp_path / "bert" / "deberta-v3-large"
        d.mkdir(parents=True)
        (d / "config.json").write_text("{}")
        (d / "pytorch_model.bin").write_bytes(b"\0")
        ok, status = check_asset(
            str(tmp_path), "bert/deberta-v3-large", ("spm.model",)
        )
        assert not ok and "spm.model" in status
