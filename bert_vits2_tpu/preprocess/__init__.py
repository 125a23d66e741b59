"""Offline data preparation (reference: resample.py, preprocess_text.py,
bert_gen.py, spec_gen.py). All host-side CPU; CLIs:

    python -m bert_vits2_tpu.preprocess.resample --in-dir raw --out-dir wavs
    python -m bert_vits2_tpu.preprocess.text --transcription-path x.list ...
    python -m bert_vits2_tpu.preprocess.bert_gen -c config.json
    python -m bert_vits2_tpu.preprocess.spec_gen -c config.json
"""

from bert_vits2_tpu.preprocess.resample import resample_file
from bert_vits2_tpu.preprocess.text import preprocess_text

__all__ = ["resample_file", "preprocess_text"]
