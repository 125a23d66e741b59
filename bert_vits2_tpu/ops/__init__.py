"""L0 numeric primitives: masking, DSP, splines, monotonic alignment."""

from bert_vits2_tpu.ops.masking import (
    generate_path,
    intersperse,
    intersperse_jnp,
    kl_divergence_gaussian,
    rand_slice_segments,
    sequence_mask,
    slice_segments,
)
from bert_vits2_tpu.ops.stft import (
    mel_filterbank,
    mel_spectrogram,
    spec_to_mel,
    spectrogram,
)
from bert_vits2_tpu.ops.spline import (
    piecewise_rational_quadratic_transform,
    rational_quadratic_spline,
    unconstrained_rational_quadratic_spline,
)
from bert_vits2_tpu.ops.align import maximum_path, maximum_path_auto, maximum_path_scan

__all__ = [
    "generate_path",
    "intersperse",
    "intersperse_jnp",
    "kl_divergence_gaussian",
    "rand_slice_segments",
    "sequence_mask",
    "slice_segments",
    "mel_filterbank",
    "mel_spectrogram",
    "spec_to_mel",
    "spectrogram",
    "piecewise_rational_quadratic_transform",
    "rational_quadratic_spline",
    "unconstrained_rational_quadratic_spline",
    "maximum_path",
    "maximum_path_auto",
    "maximum_path_scan",
]
