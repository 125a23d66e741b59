"""L3 host-side text frontend: symbols, cleaners, per-language g2p, BERT.

Unlike the reference (text/__init__.py:33-63) importing this package has NO
side effects: no model downloads, no g2p warm-up. Heavy/optional backends load
lazily on first use.
"""

from __future__ import annotations

from bert_vits2_tpu.text.symbols import (
    LANGUAGE_ID_MAP,
    LANGUAGE_TONE_START_MAP,
    NUM_LANGUAGES,
    NUM_TONES,
    PUNCTUATION,
    SYMBOL_TO_ID,
    SYMBOLS,
)


def cleaned_text_to_sequence(cleaned_text, tones, language):
    """Phones -> ids, tones offset per language, language ids broadcast.

    Ref: text/__init__.py:6-18.
    """
    phones = [SYMBOL_TO_ID[symbol] for symbol in cleaned_text]
    tone_start = LANGUAGE_TONE_START_MAP[language]
    tones = [t + tone_start for t in tones]
    lang_id = LANGUAGE_ID_MAP[language]
    lang_ids = [lang_id] * len(phones)
    return phones, tones, lang_ids


def clean_text(text: str, language: str):
    from bert_vits2_tpu.text.cleaner import clean_text as _clean

    return _clean(text, language)


__all__ = [
    "SYMBOLS",
    "SYMBOL_TO_ID",
    "PUNCTUATION",
    "NUM_TONES",
    "NUM_LANGUAGES",
    "LANGUAGE_ID_MAP",
    "LANGUAGE_TONE_START_MAP",
    "cleaned_text_to_sequence",
    "clean_text",
]
