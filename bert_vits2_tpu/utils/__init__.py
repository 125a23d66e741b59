"""Host-side utilities: logging, TensorBoard summaries, plots, wav IO
(reference: utils.py:144-378, tools/log.py)."""

from bert_vits2_tpu.utils.audio import write_wav
from bert_vits2_tpu.utils.logging import get_logger, summarize
from bert_vits2_tpu.utils.plot import alignment_to_image, spectrogram_to_image

__all__ = [
    "write_wav",
    "get_logger",
    "summarize",
    "alignment_to_image",
    "spectrogram_to_image",
]
