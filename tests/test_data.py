"""Data pipeline tests: dataset loading, bucketed sampler, static collation.

Mirrors the semantics of data_utils.py:16-404 (see SURVEY.md §2.4).
"""

import numpy as np
import pytest

from bert_vits2_tpu.data import (
    BucketSampler,
    FilelistDataset,
    collate_batch,
)


SR = 44100
HOP = 512


@pytest.fixture(scope="module")
def tiny_corpus(tmp_path_factory):
    """3 speakers x several utterances of varying length, with cached BERT."""
    from scipy.io import wavfile

    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    rows = []
    phone_bank = ["a", "i", "u", "n", "k", "s", "t", "m"]
    for i in range(6):
        frames = 40 + 25 * i  # spec frames, spans bucket boundaries
        n = frames * HOP
        wav = (rng.uniform(-0.3, 0.3, n) * 32767).astype(np.int16)
        path = root / f"utt{i}.wav"
        wavfile.write(path, SR, wav)
        n_ph = 4 + i
        phones = [phone_bank[j % len(phone_bank)] for j in range(n_ph)]
        tones = ["0"] * n_ph
        word2ph = ["1"] * n_ph
        np.save(
            str(path).replace(".wav", ".bert.npy"),
            rng.normal(size=(2 * n_ph + 1, 1024)).astype(np.float32),
        )
        rows.append(
            f"{path}|spk{i % 3}|JP|dummy|{' '.join(phones)}|{' '.join(tones)}|{' '.join(word2ph)}"
        )
    filelist = root / "train.list"
    filelist.write_text("\n".join(rows), encoding="utf-8")
    return filelist


@pytest.fixture(scope="module")
def dataset(tiny_corpus):
    return FilelistDataset(
        str(tiny_corpus),
        spk2id={"spk0": 0, "spk1": 1, "spk2": 2},
        sampling_rate=SR,
    )


class TestDataset:
    def test_loads_all_items(self, dataset):
        assert len(dataset) == 6
        assert dataset.skipped == 0

    def test_item_contents(self, dataset):
        it = dataset[2]
        n_ph = 4 + 2
        t = 2 * n_ph + 1  # add_blank intersperse
        assert it["phones"].shape == (t,)
        assert it["phones"][0::2].sum() == 0  # blanks at even positions
        assert it["tones"].shape == (t,)
        assert it["bert"].shape == (t, 1024)
        assert it["ja_bert"].shape == (t, 1024)
        # JP is the active language: ja_bert is the cached features (non-noise
        # check: placeholder draws would differ between bert and en_bert)
        assert not np.allclose(it["bert"], it["en_bert"])
        assert it["sid"] == 2 % 3
        frames = it["spec"].shape[0]
        assert it["spec"].shape == (frames, 2048 // 2 + 1)
        assert abs(frames - len(it["wave"]) // HOP) <= 1

    def test_spec_cache_roundtrip(self, dataset):
        it1 = dataset[0]
        it2 = dataset[0]  # second load hits .spec.npy cache
        np.testing.assert_allclose(it1["spec"], it2["spec"])

    def test_spec_matches_ops_stft(self, dataset):
        import jax.numpy as jnp

        from bert_vits2_tpu.ops.stft import spectrogram

        it = dataset[1]
        spec_dev = spectrogram(
            jnp.asarray(it["wave"][None]), n_fft=2048, hop=HOP, win_length=2048
        )
        np.testing.assert_allclose(
            np.asarray(spec_dev)[0], it["spec"], rtol=1e-4, atol=1e-4
        )


class TestBucketSampler:
    def test_partitions_by_rank(self, dataset):
        lengths = dataset.lengths()
        all_ids = []
        for rank in range(2):
            s = BucketSampler(lengths, batch_size=2, num_replicas=2, rank=rank,
                              boundaries=(32, 100, 200), seed=7)
            for _, ids in s:
                assert len(ids) == 2
                all_ids.extend(ids)
        # every original item appears (possibly duplicated by wrap padding)
        covered = set(all_ids)
        valid = {i for i, ln in enumerate(lengths) if 32 <= ln <= 200}
        assert covered == valid

    def test_epoch_determinism(self, dataset):
        lengths = dataset.lengths()
        a = BucketSampler(lengths, 2, boundaries=(32, 100, 200), seed=7)
        b = BucketSampler(lengths, 2, boundaries=(32, 100, 200), seed=7)
        a.set_epoch(3)
        b.set_epoch(3)
        assert [ids for _, ids in a] == [ids for _, ids in b]
        b.set_epoch(4)
        assert [ids for _, ids in a] != [ids for _, ids in b]

    def test_same_bucket_same_cap(self, dataset):
        lengths = dataset.lengths()
        s = BucketSampler(lengths, 2, boundaries=(32, 100, 200), seed=0)
        for bidx, ids in s:
            cap = s.bucket_max_frames(bidx)
            for i in ids:
                assert lengths[i] <= cap


class TestCollate:
    def test_static_shapes(self, dataset):
        items = [dataset[i] for i in (0, 1, 2)]
        batch = collate_batch(items, max_frames=200, hop_length=HOP)
        b = 3
        assert batch["x"].shape[0] == b
        assert batch["x"].shape[1] % 32 == 0
        assert batch["spec"].shape == (b, 200, 1025)
        assert batch["wave"].shape == (b, 200 * HOP)
        for i, it in enumerate(items):
            t = len(it["phones"])
            np.testing.assert_array_equal(batch["x"][i, :t], it["phones"])
            assert batch["x_lengths"][i] == t
            f = it["spec"].shape[0]
            assert batch["spec_lengths"][i] == f
            assert np.all(batch["spec"][i, f:] == 0)

    def test_fixed_cap_truncates(self, dataset):
        items = [dataset[5]]  # longest utterance
        batch = collate_batch(items, max_frames=50, hop_length=HOP)
        assert batch["spec"].shape[1] == 50
        assert batch["spec_lengths"][0] == 50
