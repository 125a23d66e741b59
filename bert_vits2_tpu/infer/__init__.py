"""High-level inference API (reference: infer.py)."""

from bert_vits2_tpu.infer.api import PreparedRequest, TTSEngine, get_text
from bert_vits2_tpu.infer.loader import load_generator_params, load_tts_engine

__all__ = [
    "PreparedRequest",
    "TTSEngine",
    "get_text",
    "load_tts_engine",
    "load_generator_params",
]
