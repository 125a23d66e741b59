"""Filelist dataset (reference: data_utils.py:16-182 TextAudioSpeakerLoader).

Rows: `path|spk|lang|text|phones|tones|word2ph` from preprocess_text. Per-item
loading is host-side numpy: wav -> float32, linear spec computed via the same
framed-DFT math as ops/stft (cached as .spec.npy), cached BERT features
(.bert.npy, with .bert.pt import fallback). Inactive languages get N(0,1)
placeholders — noise, not zeros, to match the reference's training
distribution (data_utils.py:159-168).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Sequence

import numpy as np

from bert_vits2_tpu.text import cleaned_text_to_sequence
from bert_vits2_tpu.text.symbols import LANGUAGE_ID_MAP

_BERT_DIM = 1024
_LANG_ORDER = ("ZH", "JP", "EN")


@dataclasses.dataclass
class Utterance:
    audio_path: str
    speaker: str
    language: str
    text: str
    phones: list
    tones: list
    word2ph: list
    # estimated spec frames (from file size, before any audio IO) for bucketing
    est_frames: int = 0


def _intersperse(lst: list, item: int) -> list:
    out = [item] * (len(lst) * 2 + 1)
    out[1::2] = lst
    return out


def load_wav(path: str) -> tuple[np.ndarray, int]:
    """16/32-bit PCM or float wav -> float32 in [-1, 1] (scipy, like
    data_utils.py:99-107 which divides by 32768)."""
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim > 1:
        data = data.mean(axis=1)
    return data, sr


def compute_spec(
    audio: np.ndarray, n_fft: int, hop: int, win: int
) -> np.ndarray:
    """Linear magnitude spectrogram [frames, n_fft//2+1], numpy, matching
    ops/stft.spectrogram (reflect pad (n_fft-hop)/2, center=False, periodic
    Hann, sqrt(re^2+im^2+1e-6))."""
    from bert_vits2_tpu.ops.stft import hann_window_periodic

    pad = (n_fft - hop) // 2
    y = np.pad(audio, (pad, pad), mode="reflect")
    n_frames = 1 + (len(y) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = y[idx] * hann_window_periodic(win)
    fft = np.fft.rfft(frames, n=n_fft, axis=1)
    return np.sqrt(fft.real**2 + fft.imag**2 + 1e-6).astype(np.float32)


class FilelistDataset:
    """Indexable dataset over a `.list` filelist.

    __getitem__ returns a dict of numpy arrays:
      phones/tones/lang [t], bert/ja_bert/en_bert [t, 1024],
      spec [frames, n_fft//2+1], wave [samples], sid scalar.
    """

    def __init__(
        self,
        filelist: str,
        spk2id: dict,
        sampling_rate: int = 44100,
        filter_length: int = 2048,
        hop_length: int = 512,
        win_length: int = 2048,
        add_blank: bool = True,
        min_text_len: int = 1,
        max_text_len: int = 384,
        use_cache: bool = True,
        rng_seed: int = 1234,
        bert_dim: int = _BERT_DIM,
    ):
        self.bert_dim = bert_dim
        self.spk2id = spk2id
        self.sampling_rate = sampling_rate
        self.filter_length = filter_length
        self.hop_length = hop_length
        self.win_length = win_length
        self.add_blank = add_blank
        self.use_cache = use_cache
        self.rng_seed = rng_seed

        self.items: list[Utterance] = []
        skipped = 0
        with open(filelist, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                parts = line.split("|")
                if len(parts) != 7:
                    skipped += 1
                    continue
                path, spk, lang, text, phones, tones, word2ph = parts
                phones = phones.split(" ")
                if not (min_text_len <= len(phones) <= max_text_len) or not os.path.isfile(path):
                    skipped += 1
                    continue
                est = 0
                try:
                    est = os.path.getsize(path) // (2 * hop_length)
                except OSError:
                    pass
                self.items.append(
                    Utterance(
                        audio_path=path,
                        speaker=spk,
                        language=lang,
                        text=text,
                        phones=phones,
                        tones=[int(t) for t in tones.split(" ")],
                        word2ph=[int(w) for w in word2ph.split(" ")],
                        est_frames=est,
                    )
                )
        self.skipped = skipped

    def __len__(self) -> int:
        return len(self.items)

    def lengths(self) -> list[int]:
        """Estimated spec-frame lengths for bucketing (data_utils.py:60)."""
        return [u.est_frames for u in self.items]

    # ---- caching ----

    def _spec_path(self, audio_path: str) -> str:
        return audio_path.replace(".wav", ".spec.npy")

    def _bert_path(self, audio_path: str) -> str:
        return audio_path.replace(".wav", ".bert.npy")

    def _load_spec(self, audio_path: str, audio: np.ndarray) -> np.ndarray:
        cache = self._spec_path(audio_path)
        if self.use_cache and os.path.isfile(cache):
            return np.load(cache)
        spec = compute_spec(audio, self.filter_length, self.hop_length, self.win_length)
        if self.use_cache:
            try:
                np.save(cache, spec)
            except OSError:
                pass
        return spec

    def _load_bert(self, u: Utterance, n_phones: int) -> np.ndarray:
        """[t, 1024] phone-level BERT features for the active language."""
        cache = self._bert_path(u.audio_path)
        if os.path.isfile(cache):
            bert = np.load(cache)
        else:
            pt = u.audio_path.replace(".wav", ".bert.pt")
            if os.path.isfile(pt):
                import torch

                bert = torch.load(pt, map_location="cpu", weights_only=True).float().numpy()
                if self.use_cache:
                    try:
                        np.save(cache, bert.astype(np.float32))
                    except OSError:
                        pass
            else:
                raise FileNotFoundError(
                    f"no cached BERT features for {u.audio_path} "
                    "(run tools/bert_gen.py first)"
                )
        if bert.shape[0] == self.bert_dim and bert.shape[0] != n_phones:
            # reference layout [1024, t]
            bert = bert.T
        assert bert.shape[0] == n_phones, (bert.shape, n_phones)
        return bert.astype(np.float32)

    def __getitem__(self, idx: int) -> dict:
        u = self.items[idx]
        phones, tones, langs = cleaned_text_to_sequence(
            u.phones, u.tones, u.language
        )
        word2ph = list(u.word2ph)
        if self.add_blank:
            phones = _intersperse(phones, 0)
            tones = _intersperse(tones, 0)
            langs = _intersperse(langs, 0)
            word2ph = [w * 2 for w in word2ph]
            word2ph[0] += 1

        audio, sr = load_wav(u.audio_path)
        if sr != self.sampling_rate:
            raise ValueError(f"{u.audio_path}: {sr} != {self.sampling_rate} (resample first)")
        spec = self._load_spec(u.audio_path, audio)

        t = len(phones)
        bert = self._load_bert(u, t)
        # inactive languages: unit Gaussian noise, seeded per utterance for
        # reproducibility (reference uses fresh randn each epoch)
        noise_rng = np.random.default_rng((self.rng_seed, idx))
        placeholders = {
            lang: noise_rng.normal(size=(t, self.bert_dim)).astype(np.float32)
            for lang in _LANG_ORDER
            if lang != u.language
        }
        feats = {lang: placeholders.get(lang) for lang in _LANG_ORDER}
        feats[u.language] = bert

        sid = self.spk2id[u.speaker] if isinstance(self.spk2id, dict) else int(u.speaker)
        return {
            "phones": np.asarray(phones, np.int32),
            "tones": np.asarray(tones, np.int32),
            "lang": np.asarray(langs, np.int32),
            "bert": feats["ZH"],
            "ja_bert": feats["JP"],
            "en_bert": feats["EN"],
            "spec": spec,
            "wave": audio,
            "sid": np.int32(sid),
        }


# ---- fast batch path (native loader + device-side BERT noise) ----

def load_collated_batch(
    ds: FilelistDataset,
    ids: Sequence[int],
    max_frames: int,
    text_pad_multiple: int = 32,
    loader=None,
) -> dict:
    """Collate a batch straight from caches into fixed-shape buffers.

    Differences from the itemwise path (__getitem__ + collate.collate_batch):

    - spec/.bert caches and wavs are read by the native thread pool
      (native/dataloader.cc) directly into the padded batch rows when
      available — GIL-free parallel IO instead of per-item np.load;
    - the inactive-language BERT placeholders are NOT generated here: the
      batch carries `bert` = the ACTIVE language's features plus `utt_lang`
      [b], and the train step draws the N(0,1) placeholders on device
      (train/step.py). The reference burns host CPU on torch.randn for two
      [1024, t] tensors per item per epoch (data_utils.py:159-168) and ships
      3x the bytes over PCIe; semantics are identical because those inputs
      are pure noise.

    Returns the train-step batch dict with keys: x, x_lengths, tone,
    language, bert [b,t,1024] (active), utt_lang [b], spec, spec_lengths,
    wave, sid. Items with missing/unsupported caches fall back to the
    itemwise loaders transparently.
    """
    b = len(ids)
    utts = [ds.items[i] for i in ids]
    seqs = []
    for u in utts:
        phones, tones, langs = cleaned_text_to_sequence(u.phones, u.tones, u.language)
        if ds.add_blank:
            phones = _intersperse(phones, 0)
            tones = _intersperse(tones, 0)
            langs = _intersperse(langs, 0)
        seqs.append((phones, tones, langs))
    max_text = max(len(s[0]) for s in seqs)
    t_x = ((max_text + text_pad_multiple - 1) // text_pad_multiple) * text_pad_multiple
    t_y = max_frames
    hop = ds.hop_length
    n_samples = t_y * hop
    spec_ch = ds.filter_length // 2 + 1

    out = {
        "x": np.zeros((b, t_x), np.int32),
        "x_lengths": np.zeros((b,), np.int32),
        "tone": np.zeros((b, t_x), np.int32),
        "language": np.zeros((b, t_x), np.int32),
        "bert": np.zeros((b, t_x, ds.bert_dim), np.float32),
        "utt_lang": np.zeros((b,), np.int32),
        "spec": np.zeros((b, t_y, spec_ch), np.float32),
        "spec_lengths": np.zeros((b,), np.int32),
        "wave": np.zeros((b, n_samples), np.float32),
        "sid": np.zeros((b,), np.int32),
    }
    for i, (u, (phones, tones, langs)) in enumerate(zip(utts, seqs)):
        t = min(len(phones), t_x)
        out["x"][i, :t] = phones[:t]
        out["x_lengths"][i] = t
        out["tone"][i, :t] = tones[:t]
        out["language"][i, :t] = langs[:t]
        out["utt_lang"][i] = LANGUAGE_ID_MAP[u.language]
        out["sid"][i] = (
            ds.spk2id[u.speaker] if isinstance(ds.spk2id, dict) else int(u.speaker)
        )

    spec_paths = [ds._spec_path(u.audio_path) for u in utts]
    bert_paths = [ds._bert_path(u.audio_path) for u in utts]
    wav_paths = [u.audio_path for u in utts]

    spec_rows = wave_lens = bert_rows = bert_cols = None
    if loader is not None:
        if all(os.path.isfile(p) for p in spec_paths):
            spec_rows, _ = loader.load_npy_into(spec_paths, out["spec"])
        wave_lens, wave_srs = loader.load_wav_into(wav_paths, out["wave"])
        if all(os.path.isfile(p) for p in bert_paths):
            bert_rows, bert_cols = loader.load_npy_into(bert_paths, out["bert"])

    for i, u in enumerate(utts):
        # spec (+ lazy cache compute when missing)
        if spec_rows is not None and spec_rows[i] > 0:
            out["spec_lengths"][i] = min(int(spec_rows[i]), t_y)
        else:
            # full audio from disk — _load_spec caches, and a spec computed
            # from the batch-truncated wave row would poison the cache
            audio, sr = load_wav(u.audio_path)
            if sr != ds.sampling_rate:
                raise ValueError(
                    f"{u.audio_path}: {sr} != {ds.sampling_rate} (resample first)"
                )
            spec = ds._load_spec(u.audio_path, audio)
            f = min(spec.shape[0], t_y)
            out["spec"][i, :f] = spec[:f]
            out["spec_lengths"][i] = f

        # wave (truncated to whole spec frames, like collate.collate_batch)
        if wave_lens is None or wave_lens[i] < 0:
            audio, sr = load_wav(u.audio_path)
            if sr != ds.sampling_rate:
                raise ValueError(
                    f"{u.audio_path}: {sr} != {ds.sampling_rate} (resample first)"
                )
            n = min(len(audio), n_samples)
            out["wave"][i, :n] = audio[:n]
        elif int(wave_srs[i]) != ds.sampling_rate:
            raise ValueError(
                f"{u.audio_path}: {int(wave_srs[i])} != {ds.sampling_rate} "
                "(resample first)"
            )
        out["wave"][i, int(out["spec_lengths"][i]) * hop:] = 0.0

        # active-language BERT features
        t = int(out["x_lengths"][i])
        ok = (
            bert_rows is not None
            and bert_rows[i] == t
            and bert_cols[i] == ds.bert_dim
        )
        if not ok:
            if bert_rows is not None and bert_rows[i] > 0:
                out["bert"][i] = 0.0  # loaded layout didn't match; reload
            bert = ds._load_bert(u, t)
            out["bert"][i, :t] = bert[: min(t, t_x)]
    return out
