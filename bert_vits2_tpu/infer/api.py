"""Batched, statically-shaped TTS inference engine (reference: infer.py:107-437).

Reference semantics preserved: get_text (g2p + BERT + blank intersperse +
inactive-language noise), infer with (sdp_ratio, noise_scale, noise_scale_w,
length_scale), skip_start/skip_end boundary trims (3/2 tokens) for seamless
multi-segment concat, infer_multilang.

TPU-native differences: text is padded to bucket lengths and the jitted
synthesis function is cached per (text-bucket, frame-cap) pair — dynamic
output length becomes a device-computed y_length used to trim host-side.
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence

import numpy as np

from bert_vits2_tpu.text import clean_text, cleaned_text_to_sequence
from bert_vits2_tpu.text.bert import BERT_DIM, RandomBertExtractor, expand_word2ph

_LANGS = ("ZH", "JP", "EN")


def _intersperse(lst, item=0):
    out = [item] * (len(lst) * 2 + 1)
    out[1::2] = lst
    return out


def get_text(
    text: str,
    language: str,
    bert_extractor=None,
    add_blank: bool = True,
    style_text: str | None = None,
    style_weight: float = 0.7,
    noise_seed: int = 0,
):
    """text -> (phones, tones, lang_ids, bert/ja_bert/en_bert [t,1024]).

    Ref: infer.py:107-149 (g2p, intersperse, BERT at phone level, randn
    placeholders for the two inactive languages).
    """
    bert_extractor = bert_extractor or RandomBertExtractor()
    norm_text, phones_s, tones, word2ph = clean_text(text, language)
    phones, tones, lang_ids = cleaned_text_to_sequence(phones_s, tones, language)
    if add_blank:
        phones = _intersperse(phones)
        tones = _intersperse(tones)
        lang_ids = _intersperse(lang_ids)
        word2ph = [w * 2 for w in word2ph]
        word2ph[0] += 1

    t = len(phones)
    bert = bert_extractor(norm_text, word2ph, language,
                          style_text=style_text, style_weight=style_weight)
    assert bert.shape == (t, BERT_DIM), (bert.shape, t)
    rng = np.random.default_rng((noise_seed, t))
    feats = {
        lang: rng.normal(size=(t, BERT_DIM)).astype(np.float32)
        for lang in _LANGS
        if lang != language
    }
    feats[language] = bert.astype(np.float32)
    return (
        np.asarray(phones, np.int32),
        np.asarray(tones, np.int32),
        np.asarray(lang_ids, np.int32),
        feats["ZH"],
        feats["JP"],
        feats["EN"],
    )


class TTSEngine:
    """Holds (model, params) and a cache of jitted bucket-shaped synthesizers.

    speakers: spk2id dict (config.json data.spk2id) or None for integer sids.
    """

    def __init__(
        self,
        model,
        params,
        spk2id: dict | None = None,
        sampling_rate: int = 44100,
        bert_extractor=None,
        text_buckets: Sequence[int] = (32, 64, 128, 256, 384),
        frames_per_token: int = 6,
        frame_multiple: int = 64,
    ):
        self.model = model
        self.params = params
        self.spk2id = spk2id or {}
        self.sampling_rate = sampling_rate
        self.hop_length = model.cfg.hop_length
        self.bert_extractor = bert_extractor or RandomBertExtractor()
        self.text_buckets = tuple(sorted(text_buckets))
        self.frames_per_token = frames_per_token
        self.frame_multiple = frame_multiple
        self._jitted: dict = {}

    # ---- shape bucketing ----

    def _bucket(self, t: int) -> int:
        for b in self.text_buckets:
            if t <= b:
                return b
        return ((t + 63) // 64) * 64

    def _frame_cap(self, t_x: int, length_scale: float) -> int:
        cap = int(t_x * self.frames_per_token * max(length_scale, 1.0))
        m = self.frame_multiple
        return max(m, ((cap + m - 1) // m) * m)

    def _synth_fn(self, t_x: int, max_frames: int) -> Callable:
        key = (t_x, max_frames)
        if key not in self._jitted:
            import jax

            model = self.model

            @functools.partial(jax.jit, static_argnames=())
            def fn(params, x, x_lengths, sid, tone, language, bert, ja_bert,
                   en_bert, noise_scale, length_scale, noise_scale_w,
                   sdp_ratio, rng):
                return model.apply(
                    params, x, x_lengths, sid, tone, language, bert, ja_bert,
                    en_bert, max_frames,
                    noise_scale=noise_scale, length_scale=length_scale,
                    noise_scale_w=noise_scale_w, sdp_ratio=sdp_ratio,
                    method=type(model).infer, rngs={"noise": rng},
                )

            self._jitted[key] = fn
        return self._jitted[key]

    # ---- public API ----

    def resolve_speaker(self, speaker) -> int:
        if isinstance(speaker, str):
            return int(self.spk2id[speaker])
        return int(speaker)

    def infer(
        self,
        text: str,
        speaker,
        language: str = "ZH",
        sdp_ratio: float = 0.2,
        noise_scale: float = 0.667,
        noise_scale_w: float = 0.8,
        length_scale: float = 1.0,
        style_text: str | None = None,
        style_weight: float = 0.7,
        skip_start: bool = False,
        skip_end: bool = False,
        seed: int = 0,
    ) -> np.ndarray:
        """Synthesize one utterance -> float32 waveform [n_samples].

        Ref: infer.py:151-332 (incl. the 3/2-token boundary trims).
        """
        inputs = get_text(text, language, self.bert_extractor,
                          style_text=style_text, style_weight=style_weight)
        if skip_start:
            inputs = tuple(a[3:] for a in inputs)
        if skip_end:
            inputs = tuple(a[:-2] for a in inputs)
        return self._run(inputs, speaker, sdp_ratio, noise_scale,
                         noise_scale_w, length_scale, seed)

    def infer_multilang(
        self,
        segments: Sequence[tuple[str, str]],
        speaker,
        sdp_ratio: float = 0.2,
        noise_scale: float = 0.667,
        noise_scale_w: float = 0.8,
        length_scale: float = 1.0,
        seed: int = 0,
    ) -> np.ndarray:
        """Mixed-language synthesis: concat per-segment features (with
        boundary trims) into ONE model call. Ref: infer.py:335-437."""
        parts = []
        n = len(segments)
        for i, (text, lang) in enumerate(segments):
            inputs = get_text(text, lang, self.bert_extractor)
            if i > 0:  # skip_start for all but first
                inputs = tuple(a[3:] for a in inputs)
            if i < n - 1:  # skip_end for all but last
                inputs = tuple(a[:-2] for a in inputs)
            parts.append(inputs)
        joined = tuple(np.concatenate([p[j] for p in parts], axis=0)
                       for j in range(6))
        return self._run(joined, speaker, sdp_ratio, noise_scale,
                         noise_scale_w, length_scale, seed)

    def infer_batch(
        self,
        texts: Sequence[str],
        speakers: Sequence,
        language="ZH",
        sdp_ratio: float = 0.2,
        noise_scale: float = 0.667,
        noise_scale_w: float = 0.8,
        length_scale: float = 1.0,
        seed: int = 0,
    ) -> list:
        """Batched synthesis: all utterances padded to one shared (text
        bucket, frame cap) and synthesized in ONE device call — the serving
        throughput path (the reference loops infer() per segment,
        hiyoriUI.py:320-339). Returns a list of trimmed float32 waveforms."""
        import jax
        import jax.numpy as jnp

        langs = (
            [language] * len(texts) if isinstance(language, str) else list(language)
        )
        items = [
            get_text(t, lang, self.bert_extractor)
            for t, lang in zip(texts, langs)
        ]
        lens = [len(it[0]) for it in items]
        t_x = self._bucket(max(lens))
        max_frames = self._frame_cap(t_x, length_scale)

        def pad(a):
            width = [(0, t_x - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
            return np.pad(a, width)

        stacked = [
            np.stack([pad(it[j]) for it in items]) for j in range(6)
        ]
        sids = [self.resolve_speaker(s) for s in speakers]
        fn = self._synth_fn(t_x, max_frames)
        wave, _, _, y_len = fn(
            self.params,
            jnp.asarray(stacked[0]),
            jnp.asarray(lens),
            jnp.asarray(sids),
            *[jnp.asarray(s) for s in stacked[1:]],
            jnp.float32(noise_scale),
            jnp.float32(length_scale),
            jnp.float32(noise_scale_w),
            jnp.float32(sdp_ratio),
            jax.random.key(seed),
        )
        wave, y_len = np.asarray(wave), np.asarray(y_len)
        return [
            wave[i, : min(int(y_len[i]), max_frames) * self.hop_length]
            for i in range(len(texts))
        ]

    def _run(self, inputs, speaker, sdp_ratio, noise_scale, noise_scale_w,
             length_scale, seed) -> np.ndarray:
        import jax
        import jax.numpy as jnp

        phones, tones, lang_ids, bert, ja_bert, en_bert = inputs
        t = len(phones)
        t_x = self._bucket(t)
        max_frames = self._frame_cap(t_x, length_scale)

        def pad(a):
            width = [(0, t_x - t)] + [(0, 0)] * (a.ndim - 1)
            return np.pad(a, width)

        sid = self.resolve_speaker(speaker)
        fn = self._synth_fn(t_x, max_frames)
        wave, _, _, y_len = fn(
            self.params,
            jnp.asarray(pad(phones)[None]),
            jnp.asarray([t]),
            jnp.asarray([sid]),
            jnp.asarray(pad(tones)[None]),
            jnp.asarray(pad(lang_ids)[None]),
            jnp.asarray(pad(bert)[None]),
            jnp.asarray(pad(ja_bert)[None]),
            jnp.asarray(pad(en_bert)[None]),
            jnp.float32(noise_scale),
            jnp.float32(length_scale),
            jnp.float32(noise_scale_w),
            jnp.float32(sdp_ratio),
            jax.random.key(seed),
        )
        n = min(int(np.asarray(y_len)[0]), max_frames) * self.hop_length
        return np.asarray(wave)[0, :n]
