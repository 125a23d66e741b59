"""STFT / mel-spectrogram as MXU matmuls (reference: mel_processing.py:43-142).

Design: instead of an FFT, the (windowed) DFT is a single [n_fft, 2*(n_fft/2+1)]
matmul applied to framed audio — this rides the TPU MXU, fuses with the mel
projection (another matmul), and keeps everything statically shaped. Numerics
match the reference bit-for-bit at fp32 given the same framing:

- reflect-pad by (n_fft - hop)/2 on both sides, center=False framing,
- periodic Hann window,
- magnitude = sqrt(re^2 + im^2 + 1e-6)            (mel_processing.py:77)
- mel = slaney-scale, slaney-normalized filterbank (librosa-compatible),
- log dynamic-range compression log(clamp(x, 1e-5)) (mel_processing.py:11-18).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_HIGHEST = lax.Precision.HIGHEST


def hann_window_periodic(win_length: int) -> np.ndarray:
    """Periodic Hann, matching torch.hann_window(win_length)."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    sampling_rate: int, n_fft: int, n_mels: int, fmin: float, fmax: float | None
) -> np.ndarray:
    """Slaney-scale, slaney-normalized triangular filterbank [n_mels, n_bins].

    Equivalent to librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax)
    (htk=False, norm='slaney'), which the reference uses (mel_processing.py:88).
    """
    if fmax is None:
        fmax = sampling_rate / 2.0
    n_bins = n_fft // 2 + 1
    fftfreqs = np.linspace(0.0, sampling_rate / 2.0, n_bins)
    mel_pts = _mel_to_hz_slaney(
        np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax), n_mels + 2)
    )
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    weights = weights * enorm[:, None]
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=4)
def _dft_basis(n_fft: int, win_length: int) -> np.ndarray:
    """Windowed real-DFT basis [n_fft, 2*n_bins] (cos block then -sin block)."""
    n_bins = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)
    k = np.arange(n_bins, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(n, k) / n_fft  # [n_fft, n_bins]
    win = np.zeros(n_fft)
    off = (n_fft - win_length) // 2
    win[off : off + win_length] = hann_window_periodic(win_length).astype(np.float64)
    basis = np.concatenate([np.cos(ang), -np.sin(ang)], axis=1) * win[:, None]
    return basis.astype(np.float32)


def frame_signal(y: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """Reflect-pad ((n_fft-hop)/2 each side) and frame: [b, t] -> [b, f, n_fft].

    Matches the reference framing (mel_processing.py:57-77, center=False), so
    f = t // hop when t is a hop multiple.
    """
    pad = (n_fft - hop) // 2
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    num_frames = 1 + (y.shape[1] - n_fft) // hop
    idx = jnp.arange(num_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    return y[:, idx]  # [b, f, n_fft]


def spectrogram(
    y: jax.Array, n_fft: int, hop: int, win_length: int, eps: float = 1e-6
) -> jax.Array:
    """Linear magnitude spectrogram. y: [b, t] -> [b, f, n_bins] (channel-last).

    Ref: spectrogram_torch (mel_processing.py:43-78); channels LAST here,
    i.e. the reference's [b, n_bins, f] transposed.
    """
    n_bins = n_fft // 2 + 1
    frames = frame_signal(y, n_fft, hop)  # [b, f, n_fft]
    basis = jnp.asarray(_dft_basis(n_fft, win_length))
    proj = jnp.einsum("bfn,nk->bfk", frames, basis, precision=_HIGHEST)
    re, im = proj[..., :n_bins], proj[..., n_bins:]
    return jnp.sqrt(re * re + im * im + eps)


def dynamic_range_compression(x: jax.Array, clip_val: float = 1e-5) -> jax.Array:
    """log(clamp(x, clip_val)). Ref: mel_processing.py:11-18."""
    return jnp.log(jnp.clip(x, min=clip_val))


def spec_to_mel(
    spec: jax.Array,
    n_fft: int,
    n_mels: int,
    sampling_rate: int,
    fmin: float,
    fmax: float | None,
) -> jax.Array:
    """[b, f, n_bins] linear spec -> [b, f, n_mels] log-mel. Ref: mel_processing.py:81-93."""
    mel_w = jnp.asarray(mel_filterbank(sampling_rate, n_fft, n_mels, fmin, fmax))
    mel = jnp.einsum("bfk,mk->bfm", spec, mel_w, precision=_HIGHEST)
    return dynamic_range_compression(mel)


def mel_spectrogram(
    y: jax.Array,
    n_fft: int,
    n_mels: int,
    sampling_rate: int,
    hop: int,
    win_length: int,
    fmin: float,
    fmax: float | None,
) -> jax.Array:
    """Waveform -> log-mel, one fused matmul chain. [b, t] -> [b, f, n_mels].

    Ref: mel_spectrogram_torch (mel_processing.py:95-142).
    """
    spec = spectrogram(y, n_fft, hop, win_length)
    return spec_to_mel(spec, n_fft, n_mels, sampling_rate, fmin, fmax)
