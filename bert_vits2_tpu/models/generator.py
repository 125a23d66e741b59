"""HiFi-GAN-style upsampling decoder (reference: models.py:490-564; HiFi-GAN
paper arXiv:2010.05646).

conv_pre (k7) + speaker conditioning, 5 ConvTranspose upsample stages
(8,8,2,2,2 => x512 = hop length), each followed by a 3-kernel MRF (ResBlock1
with dilations (1,3,5) interleaved with dilation-1 convs), averaged; conv_post
(k7, no bias) + tanh. All convs weight-normed.

TPU notes: channel-last keeps every conv in NHC layout; the whole stack is a
single fused XLA program. leaky_relu slope 0.1 matches modules.py:14.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from bert_vits2_tpu.nn.conv import Conv1d, ConvTranspose1d
from bert_vits2_tpu.nn.conv import normal_init

LRELU_SLOPE = 0.1


def _fold_time(x, f):
    """[b, T, C] -> [b, T/f, f*C] (free row-major reshape)."""
    b, t, c = x.shape
    return x.reshape(b, t // f, f * c)


def _fold_mask(x_mask, f, dtype):
    """[b, T] 0/1 mask -> [b, T/f, f, 1] (f>1) or [b, T, 1], broadcast-ready.

    Never materialized at channel width: masking a folded [b, T/f, f*C]
    tensor goes through a free row-major reshape to [b, T/f, f, C] (see
    _masked) so the mask read is C-times smaller than a repeat()'d mask —
    at vocoder shapes that repeat costs ~20% of the whole decoder.
    """
    b, t = x_mask.shape
    if f == 1:
        return x_mask[..., None].astype(dtype)
    return x_mask.reshape(b, t // f, f, 1).astype(dtype)


def _masked(x, mask, f, c):
    """Apply a _fold_mask'ed mask to a (possibly folded) [b,T/f,f*C] tensor."""
    if f == 1:
        return x * mask
    b, tf, _ = x.shape
    return (x.reshape(b, tf, f, c) * mask).reshape(b, tf, f * c)


class ResBlock1(nn.Module):
    """3 dilated + 3 plain convs with residuals (reference: modules.py:221-322).

    time_fold > 1 runs the whole block in f-folded time (see
    nn/conv.py:fold_conv_kernel): bit-identical, but keeps the MXU lanes full
    when channels < 128 — the vocoder tail (C=16..64 at 100k+ timesteps) is
    otherwise lane-padding-bound, ~8x off peak.
    """

    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3, 5)
    time_fold: int = 1

    @nn.compact
    def __call__(self, x, x_mask=None):
        f = self.time_fold
        if f > 1:
            x = _fold_time(x, f)
        mask = None
        if x_mask is not None:
            mask = _fold_mask(x_mask, f, x.dtype)
        for j, d in enumerate(self.dilations):
            xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
            if mask is not None:
                xt = _masked(xt, mask, f, self.channels)
            xt = Conv1d(
                self.channels,
                self.kernel_size,
                dilation=d,
                padding=(self.kernel_size * d - d) // 2,
                use_weight_norm=True,
                kernel_init=normal_init(0.01),
                time_fold=f,
                name=f"convs1_{j}",
            )(xt)
            xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
            if mask is not None:
                xt = _masked(xt, mask, f, self.channels)
            xt = Conv1d(
                self.channels,
                self.kernel_size,
                padding=(self.kernel_size - 1) // 2,
                use_weight_norm=True,
                kernel_init=normal_init(0.01),
                time_fold=f,
                name=f"convs2_{j}",
            )(xt)
            x = xt + x
        if mask is not None:
            x = _masked(x, mask, f, self.channels)
        if f > 1:
            x = x.reshape(x.shape[0], x.shape[1] * f, self.channels)
        return x


class ResBlock2(nn.Module):
    """2 dilated convs with residuals (reference: modules.py:325-360)."""

    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3)
    time_fold: int = 1

    @nn.compact
    def __call__(self, x, x_mask=None):
        f = self.time_fold
        if f > 1:
            x = _fold_time(x, f)
        mask = None
        if x_mask is not None:
            mask = _fold_mask(x_mask, f, x.dtype)
        for j, d in enumerate(self.dilations):
            xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
            if mask is not None:
                xt = _masked(xt, mask, f, self.channels)
            xt = Conv1d(
                self.channels,
                self.kernel_size,
                dilation=d,
                padding=(self.kernel_size * d - d) // 2,
                use_weight_norm=True,
                kernel_init=normal_init(0.01),
                time_fold=f,
                name=f"convs_{j}",
            )(xt)
            x = xt + x
        if mask is not None:
            x = _masked(x, mask, f, self.channels)
        if f > 1:
            x = x.reshape(x.shape[0], x.shape[1] * f, self.channels)
        return x


class Generator(nn.Module):
    initial_channel: int
    resblock: str = "1"
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    upsample_rates: Sequence[int] = (8, 8, 2, 2, 2)
    upsample_initial_channel: int = 512
    upsample_kernel_sizes: Sequence[int] = (16, 16, 8, 2, 2)
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, g=None, y_mask=None, mrf_packed=None):
        """x: [b, t, inter_channels]; g: [b, gin] -> waveform [b, t * hop].

        mrf_packed (inference only): per-stage packed MRF weights from
        ops.mrf_pallas.pack_generator_mrf — stages with an entry run the
        fused Pallas MRF kernel (one HBM read + one write instead of ~19
        intermediate round trips, dense im2col MXU contraction) instead of
        the ResBlock modules. Entries are weight-norm-resolved views of the
        SAME parameters, passed as traced inputs so they never become HLO
        constants. None (default, and always during init/training) keeps
        the XLA time-folded path.

        y_mask [b, t] (optional): valid-frame mask for statically padded
        inference. The reference decodes exact dynamic lengths (models.py:1073)
        so every conv's implicit zero padding starts right at the sequence end;
        with static shapes the padding region turns nonzero (biases) and its
        dilated-conv receptive fields would bleed into the tail of the valid
        audio. Re-masking before every conv reproduces the reference's
        exact-length numerics (verified <=1e-5 vs torch in
        tools/parity_reference.py).
        """
        num_kernels = len(self.resblock_kernel_sizes)
        res_cls = ResBlock1 if self.resblock == "1" else ResBlock2
        # Cast to the compute dtype up front: an f32 mask times a bf16
        # activation would silently upcast every masked tensor to f32.
        mask = None if y_mask is None else y_mask[..., None].astype(x.dtype)

        x = Conv1d(self.upsample_initial_channel, 7, padding=3, name="conv_pre")(x)
        if g is not None and self.gin_channels > 0:
            x = x + Conv1d(self.upsample_initial_channel, 1, name="cond")(g[:, None, :])
        if mask is not None:
            x = x * mask

        for i, (u, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            x = ConvTranspose1d(
                ch,
                k,
                u,
                padding=(k - u) // 2,
                use_weight_norm=True,
                kernel_init=normal_init(0.01),
                name=f"ups_{i}",
            )(x)
            stage_mask = None
            if mask is not None:
                mask = jax.numpy.repeat(mask, u, axis=1)
                stage_mask = mask[..., 0]
                x = x * mask
            packed = None
            if mrf_packed is not None and self.resblock == "1" \
                    and mrf_packed[i] is not None:
                from bert_vits2_tpu.ops.mrf_pallas import (
                    fused_mrf_folded_supported,
                    fused_mrf_supported,
                )

                kind, payload = next(iter(mrf_packed[i].items()))
                ok = (
                    fused_mrf_folded_supported(
                        ch, x.shape[1], self.resblock_kernel_sizes,
                        self.resblock_dilation_sizes)
                    if kind == "folded"
                    else fused_mrf_supported(
                        ch, x.shape[1], self.resblock_kernel_sizes,
                        self.resblock_dilation_sizes)
                )
                if ok:
                    packed = (kind, payload)
            if packed is not None:
                from bert_vits2_tpu.ops.mrf_pallas import (
                    fused_mrf,
                    fused_mrf_folded,
                )

                # always mask (all-ones when the caller gave none): the
                # kernel's padded halo zeros then reproduce the XLA
                # ResBlock's implicit zero-pad semantics at the sequence
                # edges; use_mask=False would feed conv1 bias values from
                # the halo into conv2 and diverge in the first/last taps
                mvec = (
                    stage_mask
                    if stage_mask is not None
                    else jnp.ones(x.shape[:2], x.dtype)
                )
                kind, payload = packed
                fn = fused_mrf_folded if kind == "folded" else fused_mrf
                x = fn(
                    x, mvec, payload,
                    tuple(self.resblock_kernel_sizes),
                    tuple(tuple(d) for d in self.resblock_dilation_sizes),
                    use_mask=True,
                )
            else:
                # MXU lane fold: channels < 128 at long T are
                # lane-padding-bound; run the MRF in f-folded time with
                # f*ch = 128 (bit-identical).
                fold = 1
                if 0 < ch < 128 and 128 % ch == 0:
                    fold = 128 // ch
                    while fold > 1 and x.shape[1] % fold:
                        fold //= 2
                xs = None
                for j, (rk, rd) in enumerate(
                    zip(self.resblock_kernel_sizes,
                        self.resblock_dilation_sizes)
                ):
                    block = res_cls(
                        ch, rk, tuple(rd), time_fold=fold,
                        name=f"resblocks_{i * num_kernels + j}",
                    )
                    xs = (
                        block(x, stage_mask)
                        if xs is None
                        else xs + block(x, stage_mask)
                    )
                x = xs / num_kernels

        x = jax.nn.leaky_relu(x)  # default slope 0.01 here, as in the reference
        ch = x.shape[-1]
        post_fold = 1
        if 0 < ch < 128 and 128 % ch == 0:
            post_fold = 128 // ch
            while post_fold > 1 and x.shape[1] % post_fold:
                post_fold //= 2
        if post_fold > 1:
            x = _fold_time(x, post_fold)
        x = Conv1d(
            1, 7, padding=3, use_bias=False, time_fold=post_fold, name="conv_post"
        )(x)
        if post_fold > 1:
            x = x.reshape(x.shape[0], x.shape[1] * post_fold, 1)
        wave = jax.numpy.tanh(x)[..., 0]  # [b, t_samples]
        if mask is not None:
            wave = wave * mask[..., 0]
        return wave
