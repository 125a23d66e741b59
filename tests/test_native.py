"""Native C++ batch loader (bert_vits2_tpu/native/dataloader.cc).

Skipped entirely when g++ is unavailable — the numpy path in
data/dataset.py is the functional fallback.
"""

import os

import numpy as np
import pytest

native = pytest.importorskip("bert_vits2_tpu.native")

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no native toolchain"
)


@pytest.fixture(scope="module")
def loader():
    ld = native.BatchLoader(2)
    yield ld
    ld.close()


class TestNpy:
    def test_roundtrip_and_shapes(self, loader, tmp_path):
        paths = []
        for i in range(4):
            a = np.arange(i * 10, i * 10 + 6, dtype=np.float32).reshape(3, 2)
            p = str(tmp_path / f"a{i}.npy")
            np.save(p, a)
            paths.append(p)
        dst = np.empty((4, 3, 2), np.float32)
        rows, cols = loader.load_npy_into(paths, dst)
        assert (rows == 3).all() and (cols == 2).all()
        for i in range(4):
            np.testing.assert_array_equal(
                dst[i], np.arange(i * 10, i * 10 + 6, dtype=np.float32).reshape(3, 2)
            )

    def test_truncate_and_zero_pad(self, loader, tmp_path):
        p = str(tmp_path / "a.npy")
        np.save(p, np.ones((5, 3), np.float32))
        # smaller dst row truncates; larger dst row zero-fills the tail
        small = np.empty((1, 2, 3), np.float32)
        loader.load_npy_into([p], small)
        np.testing.assert_array_equal(small[0], np.ones((2, 3), np.float32))
        big = np.empty((1, 8, 3), np.float32)
        rows, cols = loader.load_npy_into([p], big)
        assert rows[0] == 5 and cols[0] == 3
        assert (big[0, :5] == 1).all() and (big[0, 5:] == 0).all()

    def test_missing_file_flagged(self, loader, tmp_path):
        good = str(tmp_path / "g.npy")
        np.save(good, np.zeros((2, 2), np.float32))
        dst = np.empty((2, 2, 2), np.float32)
        rows, _ = loader.load_npy_into([str(tmp_path / "nope.npy"), good], dst)
        assert rows[0] == -1 and rows[1] == 2

    def test_rejects_wrong_dtype(self, loader, tmp_path):
        p = str(tmp_path / "f64.npy")
        np.save(p, np.zeros((2, 2), np.float64))
        dst = np.empty((1, 2, 2), np.float32)
        rows, _ = loader.load_npy_into([p], dst)
        assert rows[0] == -1


class TestWav:
    def test_pcm16_stereo_matches_python_loader(self, loader, tmp_path):
        from scipy.io import wavfile

        from bert_vits2_tpu.data.dataset import load_wav

        p = str(tmp_path / "s.wav")
        rng = np.random.default_rng(0)
        sig = (rng.normal(size=(64, 2)) * 8000).astype(np.int16)
        wavfile.write(p, 44100, sig)
        dst = np.empty((1, 80), np.float32)
        lens, srs = loader.load_wav_into([p], dst)
        assert lens[0] == 64 and srs[0] == 44100
        ref, sr = load_wav(p)
        np.testing.assert_allclose(dst[0, :64], ref, atol=1e-6)
        assert (dst[0, 64:] == 0).all()

    def test_float32_mono(self, loader, tmp_path):
        from scipy.io import wavfile

        p = str(tmp_path / "f.wav")
        sig = np.linspace(-1, 1, 50).astype(np.float32)
        wavfile.write(p, 22050, sig)
        dst = np.empty((1, 50), np.float32)
        lens, srs = loader.load_wav_into([p], dst)
        assert lens[0] == 50 and srs[0] == 22050
        np.testing.assert_allclose(dst[0], sig, atol=1e-7)

    def test_missing_flagged(self, loader, tmp_path):
        dst = np.empty((1, 10), np.float32)
        lens, srs = loader.load_wav_into([str(tmp_path / "no.wav")], dst)
        assert lens[0] == -1 and srs[0] == -1
