"""Fast batch path (data/dataset.load_collated_batch + native loader):
must match the itemwise __getitem__/collate_batch pipeline exactly on the
shared fields, with BERT carried as (active features, utt_lang)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from scipy.io import wavfile

    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    rows = []
    phones = ["b", "a", "d", "a"]
    for i in range(3):
        n = 12000 + 3000 * i
        wav = (rng.normal(size=n) * 6000).astype(np.int16)
        p = str(root / f"u{i}.wav")
        wavfile.write(p, 44100, wav)
        t_interspersed = len(phones) * 2 + 1
        np.save(p.replace(".wav", ".bert.npy"),
                rng.normal(size=(t_interspersed, 1024)).astype(np.float32))
        rows.append(
            f"{p}|spk{i % 2}|{'ZH' if i % 2 == 0 else 'EN'}|text|"
            f"{' '.join(phones)}|0 1 0 1|2 2"
        )
    fl = root / "train.list"
    fl.write_text("\n".join(rows) + "\n", encoding="utf-8")
    return str(fl)


@pytest.fixture(scope="module")
def ds(corpus):
    from bert_vits2_tpu.data.dataset import FilelistDataset

    return FilelistDataset(
        corpus, spk2id={"spk0": 0, "spk1": 1}, sampling_rate=44100,
        filter_length=512, hop_length=128, win_length=512,
    )


def _reference_batch(ds, ids, max_frames):
    from bert_vits2_tpu.data.collate import collate_batch

    return collate_batch(
        [ds[i] for i in ids], max_frames=max_frames, hop_length=ds.hop_length
    )


@pytest.mark.parametrize("use_native", [False, True])
def test_matches_itemwise_path(ds, use_native):
    from bert_vits2_tpu.data.dataset import load_collated_batch

    loader = None
    if use_native:
        native = pytest.importorskip("bert_vits2_tpu.native")
        if not native.available():
            pytest.skip("no native toolchain")
        loader = native.BatchLoader(2)

    ids = [0, 1, 2]
    max_frames = 128
    ref = _reference_batch(ds, ids, max_frames)
    fast = load_collated_batch(ds, ids, max_frames, loader=loader)

    for key in ("x", "x_lengths", "tone", "language", "sid", "spec_lengths"):
        np.testing.assert_array_equal(fast[key], ref[key], err_msg=key)
    np.testing.assert_allclose(fast["wave"], ref["wave"], atol=1e-6)
    np.testing.assert_allclose(fast["spec"], ref["spec"], atol=1e-4)
    # active-language features land in `bert`; language routing via utt_lang
    assert list(fast["utt_lang"]) == [0, 2, 0]  # ZH, EN, ZH
    active_ref = [ref["bert"][0], ref["en_bert"][1], ref["bert"][2]]
    for i in range(3):
        np.testing.assert_allclose(fast["bert"][i], active_ref[i], atol=1e-6)
    if loader is not None:
        loader.close()


def test_train_step_expands_bert_on_device(ds):
    """A utt_lang batch must produce the same active-language inputs the
    synthesizer would have received, with noise elsewhere."""
    import jax
    import jax.numpy as jnp

    b, t = 2, 5
    rng = np.random.default_rng(1)
    active = rng.normal(size=(b, t, 8)).astype(np.float32)
    batch = {
        "bert": jnp.asarray(active),
        "utt_lang": jnp.asarray([0, 2], jnp.int32),
    }

    # replicate the expand logic (train/step.py expand_bert)
    key = jax.random.key(0)
    noise = jax.random.normal(key, (3, b, t, 8), jnp.float32)
    sel = batch["utt_lang"][:, None, None]
    bert = jnp.where(sel == 0, batch["bert"], noise[0])
    ja = jnp.where(sel == 1, batch["bert"], noise[1])
    en = jnp.where(sel == 2, batch["bert"], noise[2])

    np.testing.assert_allclose(np.asarray(bert)[0], active[0])
    np.testing.assert_allclose(np.asarray(en)[1], active[1])
    # inactive slots are the noise draw, not zeros and not the active feats
    assert not np.allclose(np.asarray(ja)[0], active[0])
    assert np.std(np.asarray(ja)[0]) > 0.5
