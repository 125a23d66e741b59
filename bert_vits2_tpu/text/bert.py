"""Word-level BERT feature extraction -> phone-level conditioning features.

Reference behavior (text/chinese_bert.py:15-60, japanese_bert.py, english_bert_mock.py):
per-language pretrained encoder, take hidden_states[-3] (1024-d), repeat each
word/char vector word2ph[i] times to phone resolution, optionally mix in a
style text's mean feature with `style_weight` (V2.3 style transfer).

The extractor is pluggable so the engine runs with: cached features (.bert.npy
from the data pipeline), a host torch/HF model (if local weights exist), or
seeded noise (the reference itself feeds randn for inactive languages,
infer.py:126-137).
"""

from __future__ import annotations

import logging
import os
import warnings
from typing import Protocol

import numpy as np

logger = logging.getLogger("bert_vits2_tpu")

BERT_DIM = 1024

def _asset_root() -> str:
    """Root holding the `bert/` weight directory.

    $BERT_VITS2_ASSET_ROOT wins; else a reference-style `./bert` beside the
    current working directory; else the repo root — so a server launched
    from anywhere still finds fetched weights instead of silently degrading
    to noise (the old CWD-relative defaults did exactly that)."""
    env = os.environ.get("BERT_VITS2_ASSET_ROOT")
    if env:
        return env
    if os.path.isdir(os.path.join(os.getcwd(), "bert")):
        return os.getcwd()
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


# language -> default local path (reference dir names, infer.py:34-41)
DEFAULT_BERT_PATHS = {
    "ZH": os.path.join(_asset_root(), "bert", "chinese-roberta-wwm-ext-large"),
    "JP": os.path.join(_asset_root(), "bert",
                       "deberta-v2-large-japanese-char-wwm"),
    "EN": os.path.join(_asset_root(), "bert", "deberta-v3-large"),
}


class BertExtractor(Protocol):
    def __call__(
        self,
        norm_text: str,
        word2ph: list[int],
        language: str,
        style_text: str | None = None,
        style_weight: float = 0.7,
    ) -> np.ndarray:  # [sum(word2ph), 1024]
        ...


def expand_word2ph(features: np.ndarray, word2ph: list[int]) -> np.ndarray:
    """[n_words, d] -> [n_phones, d] by repeating row i word2ph[i] times."""
    assert features.shape[0] == len(word2ph), (features.shape, len(word2ph))
    return np.repeat(features, np.asarray(word2ph), axis=0)


class RandomBertExtractor:
    """Seeded N(0,1) features — matches the reference's placeholder statistics
    for inactive languages; usable for smoke tests and BERT-free operation."""

    def __init__(self, seed: int = 0):
        self.seed = seed

    def __call__(self, norm_text, word2ph, language, style_text=None, style_weight=0.7):
        rng = np.random.default_rng((self.seed, hash(norm_text) & 0x7FFFFFFF))
        return rng.normal(size=(sum(word2ph), BERT_DIM)).astype(np.float32)


def weights_present(path: str) -> bool:
    """True when `path` holds a loadable HF checkpoint (config + weights)."""
    return (
        os.path.isdir(path)
        and os.path.isfile(os.path.join(path, "config.json"))
        and any(
            os.path.isfile(os.path.join(path, f))
            for f in ("model.safetensors", "pytorch_model.bin")
        )
    )


class AutoBertExtractor:
    """Default engine extractor: REAL per-language BERT features whenever
    local weights exist, noise only as an explicit degraded mode.

    The reference always computes real BERT for the active language
    (infer.py:107-137, text/chinese_bert.py:15-60); noise is reserved for the
    *inactive* languages. This resolver gives the same semantics without a
    hard dependency on downloaded assets:

      - language has weights under `paths[lang]` -> JAX TPU encoder
        (text/bert_jax.py JaxBertExtractor; Megatron-TP over `mesh` when
        given), falling back to the host torch/HF extractor if the JAX
        import path fails;
      - no weights -> `allow_noise=True` (default) emits a LOUD once-per-
        language warning and substitutes seeded noise; `allow_noise=False`
        raises instead (production servers should set this).

    Resolution is lazy (first call per language) so engine construction
    stays cheap; `describe()` reports the backend per language for boot
    logs without touching the weights.
    """

    def __init__(
        self,
        paths: dict | None = None,
        mesh=None,
        allow_noise: bool = True,
        seed: int = 0,
    ):
        self.paths = dict(DEFAULT_BERT_PATHS)
        if paths:
            self.paths.update(paths)
        self.mesh = mesh
        self.allow_noise = allow_noise
        self._noise = RandomBertExtractor(seed)
        self._real: dict = {}  # language -> (backend_name, extractor|None)
        self._shared_jax = None
        if not allow_noise:
            # fail FAST, as --require-bert documents ("error at load"):
            # weight loading itself stays lazy, but presence is checked now
            # so a misconfigured server does not boot and then 500 on the
            # first request in a weightless language
            missing = [
                f"{lang} ({path!r})"
                for lang, path in sorted(self.paths.items())
                if not weights_present(path)
            ]
            if missing:
                raise FileNotFoundError(
                    "allow_noise=False but local BERT weights are missing "
                    f"for: {', '.join(missing)}; run `python -m "
                    "bert_vits2_tpu.tools.fetch_assets --fetch` "
                    "(docs/WEIGHTS.md)"
                )

    def describe(self) -> dict[str, str]:
        """language -> backend name ("jax"/"torch"/"noise"), resolved ones
        as-is, unresolved ones predicted from weight presence."""
        out = {}
        for lang, path in self.paths.items():
            if lang in self._real:
                out[lang] = self._real[lang][0]
            else:
                out[lang] = "jax" if weights_present(path) else "noise"
        return out

    def _resolve(self, language: str):
        if language in self._real:
            return self._real[language]
        path = self.paths.get(language, "")
        if not weights_present(path):
            if not self.allow_noise:
                raise FileNotFoundError(
                    f"no local BERT weights for {language} at {path!r} and "
                    "allow_noise_bert=False; run `python -m "
                    "bert_vits2_tpu.tools.fetch_assets --fetch` to download "
                    "them (docs/WEIGHTS.md)"
                )
            warnings.warn(
                f"NO BERT WEIGHTS for language {language} (looked in "
                f"{path!r}) — synthesizing with SEEDED-NOISE prosody "
                "features. Output quality will be degraded; fetch real "
                "weights with `python -m bert_vits2_tpu.tools.fetch_assets "
                "--fetch` (docs/WEIGHTS.md), or silence this by passing an "
                "explicit bert_extractor.",
                stacklevel=3,
            )
            self._real[language] = ("noise", None)
            return self._real[language]
        try:
            if self._shared_jax is None:
                from bert_vits2_tpu.text.bert_jax import JaxBertExtractor

                self._shared_jax = JaxBertExtractor(
                    paths=self.paths, mesh=self.mesh
                )
            self._shared_jax._load(language)  # surface load errors here
            self._real[language] = ("jax", self._shared_jax)
        except Exception as e:  # noqa: BLE001 - fall back to the host path
            logger.warning(
                "JAX BERT load failed for %s (%s); falling back to the "
                "torch/HF extractor", language, e,
            )
            ext = TorchBertExtractor(paths=self.paths)
            ext._load(language)
            self._real[language] = ("torch", ext)
        logger.info(
            "BERT extractor for %s: %s (%s)",
            language, self._real[language][0], path,
        )
        return self._real[language]

    def __call__(self, norm_text, word2ph, language, style_text=None,
                 style_weight: float = 0.7):
        backend, ext = self._resolve(language)
        if ext is None:
            return self._noise(norm_text, word2ph, language,
                               style_text=style_text,
                               style_weight=style_weight)
        return ext(norm_text, word2ph, language, style_text=style_text,
                   style_weight=style_weight)


class TorchBertExtractor:
    """Host-side HF transformers extractor (needs local model weights).

    Mirrors the reference exactly: tokenize with the per-language tokenizer,
    forward with output_hidden_states, concat hidden_states[-3:-2] -> 1024-d,
    strip nothing (CLS/SEP rows align with word2ph[0]/[-1] as in the
    reference), repeat to phone level, optional style mixing.
    """

    def __init__(self, paths: dict | None = None, device: str = "cpu"):
        self.paths = dict(DEFAULT_BERT_PATHS)
        if paths:
            self.paths.update(paths)
        self.device = device
        self._models: dict = {}

    def _load(self, language: str):
        if language in self._models:
            return self._models[language]
        import torch
        from transformers import AutoModelForMaskedLM, AutoTokenizer

        path = self.paths[language]
        if not os.path.isdir(path):
            raise FileNotFoundError(
                f"no local BERT weights for {language} at {path}; pass cached "
                "features or use RandomBertExtractor"
            )
        tok = AutoTokenizer.from_pretrained(path)
        model = AutoModelForMaskedLM.from_pretrained(path).to(self.device).eval()
        self._models[language] = (tok, model)
        return tok, model

    def _word_features(self, text: str, language: str) -> np.ndarray:
        import torch

        tok, model = self._load(language)
        with torch.no_grad():
            inputs = tok(text, return_tensors="pt").to(self.device)
            out = model(**inputs, output_hidden_states=True)
            hidden = torch.cat(out.hidden_states[-3:-2], -1)[0].cpu().numpy()
        return hidden

    def __call__(self, norm_text, word2ph, language, style_text=None, style_weight=0.7):
        feats = self._word_features(norm_text, language)
        assert feats.shape[0] == len(word2ph), (feats.shape, len(word2ph))
        if style_text:
            style = self._word_features(style_text, language).mean(0, keepdims=True)
            feats = feats * (1.0 - style_weight) + style * style_weight
        return expand_word2ph(feats, word2ph).astype(np.float32)
