"""High-level inference API (reference: infer.py)."""

from bert_vits2_tpu.infer.api import TTSEngine, get_text

__all__ = ["TTSEngine", "get_text"]
