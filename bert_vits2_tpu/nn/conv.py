"""1-D convolution primitives, channel-last, with explicit weight-norm.

Layout: activations are [batch, time, channels] (TPU/XLA-friendly; the
reference uses [b, c, t] throughout, e.g. modules.py:133-218). Kernels are
stored [k, in_per_group, out]; weight-normed layers store (v, g) explicitly so
PyTorch checkpoints (g * v / ||v||, torch.nn.utils.weight_norm) import exactly.

torch parity notes:
- Conv1d weight_norm: torch weight [out, in, k], dim=0 -> g per out-channel,
  norm over (in, k). Here: v [k, in, out], g [out], norm over (k, in).
- ConvTranspose1d weight_norm: torch weight [in, out, k], dim=0 -> g per
  IN-channel, norm over (out, k). Preserved here (g shape [in]).
- Default init mimics torch Conv1d (kaiming_uniform a=sqrt(5) == U(+-1/sqrt(fan_in))).
"""

from __future__ import annotations

import numpy as np
import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NHC", "HIO", "NHC")  # (batch, time, channel) conv dimension numbers


def torch_conv_init(fan_in: int):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch's Conv default."""
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def normal_init(std: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * std

    return init


def fold_conv_kernel(w: jax.Array, f: int, dilation: int, padding: int):
    """Re-express a stride-1 dilated time conv as a conv over f-folded time.

    Small-channel convs (the HiFi-GAN vocoder tail: C=16..64 at hundreds of
    thousands of timesteps) waste most of the MXU: XLA pads BOTH channel
    operands to 128 lanes, an up-to-64x compute overhead. Folding time into
    channels ([b, T, C] -> [b, T/f, f*C], a free row-major reshape) makes every
    output lane useful; the conv becomes an exactly-equivalent folded conv
    whose kernel is the original taps block-scattered over (input-phase,
    output-phase) channel blocks.

    w: [k, c_in, c_out]. Returns (wf [k', f*c_in, f*c_out], (pad_lo, pad_hi))
    such that  conv(x_folded, wf, padding=(pad_lo, pad_hi))  equals the folded
    reshape of  conv(x, w, dilation, symmetric padding `padding`).
    """
    k, c_in, c_out = w.shape
    entries = []
    for r in range(f):  # output phase within a folded frame
        for i in range(k):  # original tap
            q, rho = divmod(r - padding + i * dilation, f)
            entries.append((q, rho, r, i))
    qmin = min(e[0] for e in entries)
    qmax = max(e[0] for e in entries)
    wf = jnp.zeros((qmax - qmin + 1, f * c_in, f * c_out), w.dtype)
    for q, rho, r, i in entries:
        wf = wf.at[
            q - qmin, rho * c_in : (rho + 1) * c_in, r * c_out : (r + 1) * c_out
        ].set(w[i])
    return wf, (-qmin, qmax)


class Conv1d(nn.Module):
    """Conv over time. Input [b, t, c_in] -> [b, t', features].

    padding: int p -> symmetric explicit padding (torch-style), or "VALID".

    time_fold f > 1: input/output are time-folded [b, t/f, f*c]; the conv runs
    in folded space (see fold_conv_kernel) — bit-identical results, full MXU
    lane utilization for small c. Requires stride=1, groups=1, int padding.
    Parameter shapes are unchanged (still [k, c_in, features]), so checkpoints
    are layout-independent.
    """

    features: int
    kernel_size: int = 1
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    padding: int | str = 0
    use_bias: bool = True
    use_weight_norm: bool = False
    kernel_init: nn.initializers.Initializer | None = None
    dtype: jnp.dtype | None = None
    time_fold: int = 1

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        if self.time_fold > 1:
            assert self.stride == 1 and self.groups == 1
            assert not isinstance(self.padding, str)
            # folded output always has t/f frames: require a same-length conv
            assert (self.kernel_size - 1) * self.dilation == 2 * self.padding
            in_ch //= self.time_fold
        k = self.kernel_size
        fan_in = (in_ch // self.groups) * k
        kinit = self.kernel_init or torch_conv_init(fan_in)
        kshape = (k, in_ch // self.groups, self.features)

        if self.use_weight_norm:
            v = self.param("v", kinit, kshape)
            # torch init: g = ||v|| at init time; we can't see v here, so g is
            # initialized to ||v|| lazily via a dependent initializer.
            g = self.param(
                "g",
                lambda key, shape: jnp.linalg.norm(
                    v.reshape(-1, self.features), axis=0
                ),
                (self.features,),
            )
            norm = jnp.linalg.norm(v.reshape(-1, self.features), axis=0)
            kernel = v * (g / jnp.maximum(norm, 1e-12))
        else:
            kernel = self.param("kernel", kinit, kshape)

        dtype = self.dtype or x.dtype
        if self.time_fold > 1:
            wf, (lo, hi) = fold_conv_kernel(
                kernel, self.time_fold, self.dilation, self.padding
            )
            y = lax.conv_general_dilated(
                x.astype(dtype),
                wf.astype(dtype),
                window_strides=(1,),
                padding=[(lo, hi)],
                dimension_numbers=_DN,
            )
        else:
            if isinstance(self.padding, str):
                padding = self.padding
            else:
                padding = [(self.padding, self.padding)]
            y = lax.conv_general_dilated(
                x.astype(dtype),
                kernel.astype(dtype),
                window_strides=(self.stride,),
                padding=padding,
                rhs_dilation=(self.dilation,),
                dimension_numbers=_DN,
                feature_group_count=self.groups,
            )
        if self.use_bias:
            b = self.param("bias", torch_conv_init(fan_in), (self.features,))
            if self.time_fold > 1:
                b = jnp.tile(b, self.time_fold)
            y = y + b.astype(dtype)
        return y


class ConvTranspose1d(nn.Module):
    """Transposed conv matching torch ConvTranspose1d(k, stride, padding=p).

    out_len = (t - 1) * stride - 2p + k. Implemented as input-dilated conv with
    the kernel flipped in time (gradient-of-conv formulation), which XLA maps
    to efficient TPU convs.
    """

    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    use_bias: bool = True
    use_weight_norm: bool = True
    kernel_init: nn.initializers.Initializer | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k, s, p = self.kernel_size, self.stride, self.padding
        fan_in = in_ch * k // s  # torch fan_in for transposed conv grouping=1
        kinit = self.kernel_init or torch_conv_init(in_ch * k)
        # stored layout [k, in, out]; torch layout is [in, out, k]
        kshape = (k, in_ch, self.features)

        if self.use_weight_norm:
            v = self.param("v", kinit, kshape)
            # torch weight_norm dim=0 on [in, out, k] -> g per IN channel,
            # norm over (out, k) for each in-channel.
            def g_init(key, shape):
                return jnp.linalg.norm(
                    jnp.transpose(v, (1, 0, 2)).reshape(in_ch, -1), axis=1
                )

            g = self.param("g", g_init, (in_ch,))
            norm = jnp.linalg.norm(
                jnp.transpose(v, (1, 0, 2)).reshape(in_ch, -1), axis=1
            )
            kernel = v * (g / jnp.maximum(norm, 1e-12))[None, :, None]
        else:
            kernel = self.param("kernel", kinit, kshape)

        dtype = self.dtype or x.dtype
        if k % s == 0:
            # Sub-pixel fast path: input dilation (lhs_dilation) materializes
            # stride-1 zeros on TPU and runs the conv at the OUTPUT rate with
            # mostly-zero inputs. For k = m*s the transposed conv is exactly a
            # dense m-tap conv producing s interleaved output phases:
            #   y[n] = sum_i x[u-i] . W[r + i*s],  u=(n+p)//s, r=(n+p)%s
            # which keeps the MXU lanes full (features = s*out).
            m = k // s
            t = x.shape[1]
            w = kernel.reshape(m, s, in_ch, self.features)  # [i, r, in, out]
            w = jnp.flip(w, 0).transpose(0, 2, 1, 3)  # [tau, in, r, out]
            w = w.reshape(m, in_ch, s * self.features)
            x_pad = jnp.pad(x, ((0, 0), (m - 1, m - 1), (0, 0)))
            z = lax.conv_general_dilated(
                x_pad.astype(dtype),
                w.astype(dtype),
                window_strides=(1,),
                padding="VALID",
                dimension_numbers=_DN,
            )  # [b, t+m-1, s*out]
            z = z.reshape(z.shape[0], (t + m - 1) * s, self.features)
            out_len = (t - 1) * s - 2 * p + k
            y = lax.dynamic_slice_in_dim(z, p, out_len, axis=1)
        else:
            pad = k - 1 - p
            y = lax.conv_general_dilated(
                x.astype(dtype),
                jnp.flip(kernel, 0).astype(dtype),
                window_strides=(1,),
                padding=[(pad, pad)],
                lhs_dilation=(s,),
                dimension_numbers=_DN,
            )
        if self.use_bias:
            b = self.param("bias", torch_conv_init(in_ch * k), (self.features,))
            y = y + b.astype(dtype)
        return y


class Conv2d(nn.Module):
    """2-D conv, channel-last [b, h, w, c]. Used by the period discriminators
    (models.py:567-627: kernels (k,1), strides (s,1)) and the GST reference
    encoder (models.py:752-808)."""

    features: int
    kernel_size: tuple[int, int]
    stride: tuple[int, int] = (1, 1)
    padding: tuple[int, int] = (0, 0)
    use_bias: bool = True
    use_weight_norm: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        fan_in = in_ch * kh * kw
        kshape = (kh, kw, in_ch, self.features)
        kinit = torch_conv_init(fan_in)

        if self.use_weight_norm:
            v = self.param("v", kinit, kshape)
            g = self.param(
                "g",
                lambda key, shape: jnp.linalg.norm(
                    v.reshape(-1, self.features), axis=0
                ),
                (self.features,),
            )
            norm = jnp.linalg.norm(v.reshape(-1, self.features), axis=0)
            kernel = v * (g / jnp.maximum(norm, 1e-12))
        else:
            kernel = self.param("kernel", kinit, kshape)

        dtype = self.dtype or x.dtype
        y = lax.conv_general_dilated(
            x.astype(dtype),
            kernel.astype(dtype),
            window_strides=self.stride,
            padding=[(self.padding[0],) * 2, (self.padding[1],) * 2],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", torch_conv_init(fan_in), (self.features,))
            y = y + b.astype(dtype)
        return y


class Dense(nn.Module):
    """Linear layer with torch Linear default init (U(+-1/sqrt(fan_in)))."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        bound = 1.0 / np.sqrt(fan_in)
        kernel = self.param(
            "kernel",
            lambda key, shape: jax.random.uniform(
                key, shape, jnp.float32, -bound, bound
            ),
            (fan_in, self.features),
        )
        y = x @ kernel.astype(x.dtype)
        if self.use_bias:
            b = self.param(
                "bias",
                lambda key, shape: jax.random.uniform(
                    key, shape, jnp.float32, -bound, bound
                ),
                (self.features,),
            )
            y = y + b.astype(x.dtype)
        return y
