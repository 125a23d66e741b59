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
