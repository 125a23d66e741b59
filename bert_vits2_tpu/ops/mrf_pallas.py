"""Pallas TPU kernel: fused multi-receptive-field (MRF) resblock stack.

The HiFi-GAN decoder tail (reference: modules.py:221-322 ResBlock1 x3 per
upsample stage) runs 18 small-channel dilated convs per stage over very long
time axes (C=16..64 at T up to 500k samples). Two structural costs in the
XLA path:

1. MXU density. With C < 128 lanes a plain NHC conv wastes (128-C)/128 of
   the MXU; the time-folded formulation (nn/conv.py:fold_conv_kernel) fills
   the lanes but embeds dilation zeros in the folded kernel — useful-MAC
   density k/(K_fold*f) is 17-37% for the tail stages. Either way the MXU
   spends most of its cycles on structural zeros.
2. HBM traffic. 18 convs + activations round-trip ~19 intermediate tensors
   through HBM per stage.

This kernel runs the whole 3-block MRF for one (batch, time-tile) program
in VMEM with im2col matmuls:

    XT = concat_k(shifted x)   [k*C, W]   (VMEM copy, no HBM)
    y  = W_im2col @ XT         [C,  W]    contraction k*C = 176..704 — dense

so the MXU contraction dimension is k*C (>=128 for every tail stage) with
zero structural waste, and HBM sees exactly one read of x and one write of
the averaged MRF output. Time tiles overlap by the stack's receptive field
(halo H = 6*(k_max-1)); the caller pads T so every DMA stays in bounds.

Inference-only (no custom VJP); the training path keeps the XLA formulation.
Weights arrive weight-norm-resolved in im2col layout [C_out, k*C_in]
(prepare_mrf_weights). Accumulation is fp32; activations bf16 or fp32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.1
_LANE = 128


def _halo(kernel_sizes, dilations) -> int:
    """Receptive-field halo of the deepest block chain (one side)."""
    return max(
        sum((k - 1) // 2 * d + (k - 1) // 2 for d in ds)
        for k, ds in zip(kernel_sizes, dilations)
    )


def prepare_mrf_weights(blocks: list, kernel_sizes, dilations, dtype):
    """Resolve weight-norm and pack each conv kernel [k, C, C] into im2col
    layout [C_out, k*C_in] (tap-major columns, matching the kernel's concat
    order). blocks: per-MRF-block flax ResBlock1 param subtrees, each with
    convs1_{s}/convs2_{s} children holding {v, g, bias}."""

    def resolve(conv):
        v, g = conv["v"], conv["g"]
        norm = jnp.linalg.norm(v.reshape(-1, v.shape[-1]), axis=0)
        w = v * (g / jnp.maximum(norm, 1e-12))  # [k, C_in, C_out]
        k = w.shape[0]
        # [C_out, k*C_in] with tap-major rows: column block i is tap i
        w = jnp.transpose(w, (2, 0, 1)).reshape(w.shape[2], k * w.shape[1])
        return w.astype(dtype), conv["bias"].astype(jnp.float32)

    packed = []
    for j, (k, ds) in enumerate(zip(kernel_sizes, dilations)):
        w1, b1, w2, b2 = [], [], [], []
        blk = blocks[j]
        for s in range(len(ds)):
            w, b = resolve(blk[f"convs1_{s}"])
            w1.append(w)
            b1.append(b)
            w, b = resolve(blk[f"convs2_{s}"])
            w2.append(w)
            b2.append(b)
        packed.append(
            (jnp.stack(w1), jnp.stack(b1), jnp.stack(w2), jnp.stack(b2))
        )
    return packed


def pack_generator_mrf(
    dec_params: dict,
    kernel_sizes,
    dilation_sizes,
    upsample_rates,
    upsample_initial_channel: int,
    dtype,
) -> list:
    """Per-upsample-stage packed MRF weights for Generator(..., mrf_packed=).

    Entries are None for stages the kernels do not target (c >= 128);
    otherwise {"folded": weights} when the phase-fold kernel applies
    (C <= 16) or {"plain": weights} for the narrow-M kernel.
    dec_params: the Generator's param subtree (params["dec"])."""
    n_k = len(kernel_sizes)
    out = []
    for i in range(len(upsample_rates)):
        ch = upsample_initial_channel // (2 ** (i + 1))
        if not (0 < ch < 128 and ch % 8 == 0):
            out.append(None)
            continue
        blocks = [
            dec_params[f"resblocks_{i * n_k + j}"] for j in range(n_k)
        ]
        # measured dispatch (tools/profile_vocoder.py, device-loop timing,
        # v5e bf16): the folded kernel wins only where the fold factor
        # outruns the dilation spread (slabs = f + (k-1)d grows with d, and
        # each K=slabs*C pass is dense) -> folded at C<=16 (f>=8), the
        # narrow-M kernel for 24..112, XLA for C>=128 (M already full and
        # the plain conv runs 158-194 TF/s there)
        # single-key dicts, not (tag, payload) tuples: the pack rides
        # through jit as a traced argument, so the tag must live in the
        # static pytree STRUCTURE (dict key), not in a leaf
        if _LANE % ch == 0 and _LANE // ch >= 8:
            out.append({"folded": prepare_mrf_weights_folded(
                blocks, kernel_sizes, dilation_sizes, _LANE // ch, dtype)})
        else:
            out.append({"plain": prepare_mrf_weights(
                blocks, kernel_sizes, dilation_sizes, dtype)})
    return out


def _mrf_kernel(
    *refs,  # x [1,1,C,W], mask [1,1,1,W], 4 weight refs per block, out
    kernel_sizes,
    dilations,
    halo,
    t_t,
    use_mask,
    interpret,
):
    del interpret  # same code path everywhere
    x_ref, m_ref = refs[0], refs[1]
    wb_refs = refs[2:-2]
    o_ref, col_ref = refs[-2], refs[-1]  # col_ref: [k_max*C, W] scratch
    cdt = x_ref.dtype
    x0 = x_ref[0, 0]  # [C, W]
    mask = m_ref[0, 0] if use_mask else None  # [1, W]
    c = x0.shape[0]
    acc = jnp.zeros((c, t_t), jnp.float32)

    def conv(xb, w_im2col, bias, k, d, width_out):
        """xb [C, W_in] -> [C, width_out] via im2col matmul; tap i reads
        xb[:, i*d : i*d + width_out] (caller guarantees
        W_in >= (k-1)*d + width_out).

        Taps are staged through the col_ref VMEM scratch: storing each
        lane-shifted slice materializes it at an aligned layout (directly
        concatenating lane-offset vectors is a Mosaic relayout gap)."""
        for i in range(k):
            col_ref[i * c : (i + 1) * c, :width_out] = (
                xb[:, i * d : i * d + width_out]
            )
        xt = col_ref[0 : k * c, 0:width_out]
        y = jax.lax.dot_general(
            w_im2col,
            xt,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (y + bias[:, None]).astype(cdt)

    n_blocks = len(kernel_sizes)
    for j in range(n_blocks):
        k = kernel_sizes[j]
        ds = dilations[j]
        w1_ref, b1_ref, w2_ref, b2_ref = wb_refs[4 * j : 4 * j + 4]
        xb = x0
        off = 0  # left edge of xb within the original slab
        for s, d in enumerate(ds):
            w_in = xb.shape[1]
            # max(x, a*x) == leaky_relu for 0<a<1; avoids the bf16
            # vector compare Mosaic can't lower on this target
            xt = jnp.maximum(xb, LRELU_SLOPE * xb)
            if mask is not None:
                xt = xt * mask[:, off : off + w_in].astype(cdt)
            w1_out = w_in - (k - 1) * d
            xt = conv(xt, w1_ref[s], b1_ref[s], k, d, w1_out)
            xt = jnp.maximum(xt, LRELU_SLOPE * xt)
            if mask is not None:
                m_off = off + (k - 1) // 2 * d
                xt = xt * mask[:, m_off : m_off + w1_out].astype(cdt)
            w2_out = w1_out - (k - 1)
            xt = conv(xt, w2_ref[s], b2_ref[s], k, 1, w2_out)
            # residual: center slice of xb at the new width
            shrink = (k - 1) // 2 * d + (k - 1) // 2
            xb = xt + xb[:, shrink : shrink + w2_out]
            off += shrink
        # center [C, T_t] of this block's output
        lead = halo - off
        blk = xb[:, lead : lead + t_t]
        if mask is not None:
            blk = blk * mask[:, halo : halo + t_t].astype(cdt)
        acc = acc + blk.astype(jnp.float32)

    o_ref[0, 0] = (acc / n_blocks).astype(o_ref.dtype)


def _pick_tile(c: int, t: int) -> int | None:
    # VMEM budget: the im2col scratch k_max*C x (tile + 2*halo) dominates —
    # keep it ~<=3 MB by shrinking the tile as channels grow
    cap = 2048 if c <= 32 else (1024 if c <= 64 else 512)
    for tile in (2048, 1024, 512, 256):
        if tile <= cap and t % tile == 0:
            return tile
    return None


def fused_mrf_supported(c: int, t: int, kernel_sizes, dilations) -> bool:
    """The narrow-M kernel targets the small-channel tail (C < 128):
    in-VMEM masking is free (the XLA path pays ~22% for per-conv
    re-masking, tools/profile_dec_mask.py) and one HBM read+write replaces
    ~19 round trips; at C=128 the plain XLA conv already runs 158+ TF/s
    and beats it, so that stage stays on XLA."""
    return (
        0 < c < 128
        and c % 8 == 0
        and _pick_tile(c, t) is not None
        and len(kernel_sizes) == len(dilations)
    )


def fused_mrf(
    x,
    mask,
    packed_weights,
    kernel_sizes: tuple,
    dilations: tuple,
    use_mask: bool = True,
    interpret: bool | None = None,
):
    """x [B, T, C] -> averaged MRF output [B, T, C].

    packed_weights: output of prepare_mrf_weights (list per block).
    mask: [B, T] 0/1 (ignored when use_mask=False; pass ones).
    interpret: None -> auto (interpret on CPU backends, Mosaic on TPU).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _fused_mrf(
        x, mask, packed_weights,
        kernel_sizes=tuple(kernel_sizes),
        dilations=tuple(tuple(d) for d in dilations),
        use_mask=use_mask,
        interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("kernel_sizes", "dilations", "use_mask", "interpret"),
)
def _fused_mrf(
    x,
    mask,
    packed_weights,
    kernel_sizes: tuple,
    dilations: tuple,
    use_mask: bool = True,
    interpret: bool = False,
):
    b, t, c = x.shape
    halo = _halo(kernel_sizes, dilations)
    tile = _pick_tile(c, t)
    if tile is None:
        raise ValueError(f"T={t} has no supported tile")
    n_tiles = t // tile

    x_cf = jnp.transpose(x, (0, 2, 1))  # [B, C, T]
    x_cf = jnp.pad(x_cf, ((0, 0), (0, 0), (halo, halo)))
    m_cf = jnp.pad(
        mask.astype(x.dtype)[:, None, :], ((0, 0), (0, 0), (halo, halo))
    )

    w = tile + 2 * halo
    starts = np.arange(n_tiles) * tile
    # Overlapping (haloed) windows are not expressible as Pallas block-index
    # maps, so materialize per-tile slabs [B, n_tiles, C, W] with XLA slices.
    # The duplication is 2*halo/tile <= 12% of one HBM pass — cheaper than
    # a manual double-buffered DMA kernel and much simpler.
    slabs = jnp.stack(
        [
            jax.lax.dynamic_slice(
                x_cf, (0, 0, int(s)), (b, c, w)
            )
            for s in starts
        ],
        axis=1,
    )
    m_slabs = jnp.stack(
        [
            jax.lax.dynamic_slice(m_cf, (0, 0, int(s)), (b, 1, w))
            for s in starts
        ],
        axis=1,
    )

    flat_wb = []
    for blk in packed_weights:
        flat_wb.extend(blk)

    kernel = functools.partial(
        _mrf_kernel,
        kernel_sizes=tuple(kernel_sizes),
        dilations=tuple(tuple(d) for d in dilations),
        halo=halo,
        t_t=tile,
        use_mask=use_mask,
        interpret=interpret,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, 1, c, w), lambda bi, ti: (bi, ti, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 1, w), lambda bi, ti: (bi, ti, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + [
            pl.BlockSpec(memory_space=pltpu.VMEM)
            for _ in flat_wb
        ],
        out_specs=pl.BlockSpec(
            (1, 1, c, tile), lambda bi, ti: (bi, ti, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles, c, tile), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((max(kernel_sizes) * c, w), x.dtype),
        ],
        interpret=interpret,
    )(slabs, m_slabs, *flat_wb)

    # [B, n_tiles, C, tile] -> [B, C, T] -> [B, T, C]
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, c, t)
    return jnp.transpose(out, (0, 2, 1))


# ---------------------------------------------------------------------------
# folded variant: phase-folded layout fills all 128 MXU rows for C < 128
# ---------------------------------------------------------------------------
#
# The plain kernel's matmuls have M = C_out output rows; the MXU computes
# 128-row tiles, so stages with C in {16, 32, 64} run at <= C/128 of peak
# (measured 12-51 TF/s, tools/profile_vocoder.py). Folding f = 128/C time
# phases into the row dimension makes every output tile [f*C = 128, N]:
#
#   x_fold[j*C + c, n] = x[c, n*f + j]          (fold outside, one relayout)
#   y_fold = W_big @ XT                         (M = 128, dense rows)
#
# where XT stacks one [C, W] slab per DISTINCT flat tap offset
# s = j + (i - (k-1)/2) * d over output phases j and taps i (slab s lives at
# fold row-block (s mod f) shifted (s div f) columns — a plain block copy),
# and W_big[j*C + c_out, (s - s_min)*C + c_in] holds the tap weight wherever
# s is one of phase j's taps, zero elsewhere. Useful-MAC density is
# k / slabs = k / (f + (k-1)d); with all rows busy the effective ceiling
# rises from C/128 * peak to density * peak — 2-4x for the tail stages.
# Centered taps keep every intermediate aligned to the input's flat
# positions, so residual adds and masks are plain column slices.


def _conv_geom(k: int, d: int, f: int):
    """-> (s_min, n_slabs, hL_cols, hR_cols) for a centered (k, d) conv in
    f-fold layout."""
    s_min = -((k - 1) // 2) * d
    s_max = (f - 1) + ((k - 1) // 2) * d
    hl = (-s_min + f - 1) // f
    hr = s_max // f
    return s_min, s_max - s_min + 1, hl, hr


def _block_halo_cols(kernel_sizes, dilations, f: int) -> int:
    """Max per-side column halo over the block chains (left and right
    consumption differ; the tile is padded by the worst of either side)."""
    worst = 0
    for k, ds in zip(kernel_sizes, dilations):
        tot_l = tot_r = 0
        for d in ds:
            _, _, hl1, hr1 = _conv_geom(k, d, f)
            _, _, hl2, hr2 = _conv_geom(k, 1, f)
            tot_l += hl1 + hl2
            tot_r += hr1 + hr2
        worst = max(worst, tot_l, tot_r)
    return worst


def prepare_mrf_weights_folded(blocks: list, kernel_sizes, dilations,
                               f: int, dtype):
    """Weight-norm-resolved, phase-folded weights.

    -> per block: list over dilation stages of
       ((W1_big [f*C, slabs1*C], b1 [f*C]), (W2_big, b2)).
    """

    def resolve(conv):
        v, g = conv["v"], conv["g"]
        norm = jnp.linalg.norm(v.reshape(-1, v.shape[-1]), axis=0)
        w = v * (g / jnp.maximum(norm, 1e-12))  # [k, C_in, C_out]
        return w, conv["bias"]

    def fold_w(w, bias, k, d):
        c = w.shape[1]
        s_min, slabs, _, _ = _conv_geom(k, d, f)
        big = jnp.zeros((f * c, slabs * c), w.dtype)
        for j in range(f):
            for i in range(k):
                sp = j + (i - (k - 1) // 2) * d - s_min
                big = big.at[j * c:(j + 1) * c,
                             sp * c:(sp + 1) * c].set(w[i].T)
        return big.astype(dtype), jnp.tile(bias, f).astype(jnp.float32)

    packed = []
    for j, (k, ds) in enumerate(zip(kernel_sizes, dilations)):
        blk = blocks[j]
        stages = []
        for s, d in enumerate(ds):
            w1, b1 = resolve(blk[f"convs1_{s}"])
            w2, b2 = resolve(blk[f"convs2_{s}"])
            stages.append((fold_w(w1, b1, k, d), fold_w(w2, b2, k, 1)))
        packed.append(stages)
    return packed


def _mrf_folded_kernel(
    *refs,  # x [1,1,fC,Wc], mask [1,1,fC,Wc], per-conv (w, b)..., out, col
    kernel_sizes,
    dilations,
    f,
    halo_cols,
    t_cols,
    use_mask,
):
    x_ref, m_ref = refs[0], refs[1]
    wb_refs = refs[2:-2]
    o_ref, col_ref = refs[-2], refs[-1]
    cdt = x_ref.dtype
    x0 = x_ref[0, 0]  # [fC, Wc]
    mask = m_ref[0, 0] if use_mask else None  # [fC, Wc] (pre-broadcast)
    fc = x0.shape[0]
    c = fc // f
    acc = jnp.zeros((fc, t_cols), jnp.float32)

    def conv(xb, w_big, bias, k, d, w_out):
        s_min, slabs, hl, hr = _conv_geom(k, d, f)
        for sp in range(slabs):
            s = sp + s_min
            ph = s % f
            shift = s // f  # floor division: negative s shifts left
            col_ref[sp * c:(sp + 1) * c, :w_out] = (
                xb[ph * c:(ph + 1) * c, hl + shift: hl + shift + w_out]
            )
        xt = col_ref[0:slabs * c, 0:w_out]
        y = jax.lax.dot_general(
            w_big[...], xt,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (y + bias[...][:, None]).astype(cdt)

    wb_i = 0
    n_blocks = len(kernel_sizes)
    for j in range(n_blocks):
        k = kernel_sizes[j]
        ds = dilations[j]
        xb = x0
        off = 0  # left columns consumed so far (output col 0 of xb maps to
        #          slab col `off`; centered taps keep flat alignment)
        for d in ds:
            w1_ref, b1_ref, w2_ref, b2_ref = wb_refs[wb_i:wb_i + 4]
            wb_i += 4
            w_in = xb.shape[1]
            _, _, hl1, hr1 = _conv_geom(k, d, f)
            _, _, hl2, hr2 = _conv_geom(k, 1, f)
            xt = jnp.maximum(xb, LRELU_SLOPE * xb)
            if mask is not None:
                xt = xt * mask[:, off:off + w_in].astype(cdt)
            w1_out = w_in - hl1 - hr1
            xt = conv(xt, w1_ref, b1_ref, k, d, w1_out)
            xt = jnp.maximum(xt, LRELU_SLOPE * xt)
            if mask is not None:
                xt = xt * mask[:, off + hl1: off + hl1 + w1_out].astype(cdt)
            w2_out = w1_out - hl2 - hr2
            xt = conv(xt, w2_ref, b2_ref, k, 1, w2_out)
            shrink = hl1 + hl2
            xb = xt + xb[:, shrink: shrink + w2_out]
            off += shrink
        lead = halo_cols - off
        blk = xb[:, lead: lead + t_cols]
        if mask is not None:
            blk = blk * mask[:, halo_cols: halo_cols + t_cols].astype(cdt)
        acc = acc + blk.astype(jnp.float32)

    o_ref[0, 0] = (acc / n_blocks).astype(o_ref.dtype)


def _pick_tile_cols(c: int, t_cols: int) -> int | None:
    # VMEM budget: im2col scratch (max_slabs*C rows) + the folded weight
    # tables; larger C means more slab rows, so shrink the tile
    cap = 1024 if c <= 16 else (512 if c <= 32 else 256)
    for tile in (1024, 512, 256, 128, 64, 32):
        if tile <= cap and t_cols % tile == 0:
            return tile
    return None


def fused_mrf_folded_supported(c: int, t: int, kernel_sizes,
                               dilations) -> bool:
    f = _LANE // c if 0 < c < _LANE and _LANE % c == 0 else 1
    return (
        f > 1
        and t % f == 0
        and _pick_tile_cols(c, t // f) is not None
        and len(kernel_sizes) == len(dilations)
    )


def fused_mrf_folded(
    x,
    mask,
    packed_folded,
    kernel_sizes: tuple,
    dilations: tuple,
    use_mask: bool = True,
    interpret: bool | None = None,
):
    """Folded fused MRF: x [B, T, C] -> [B, T, C]; C in {16, 32, 64}.

    packed_folded: prepare_mrf_weights_folded output. mask: [B, T]."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _fused_mrf_folded(
        x, mask, packed_folded,
        kernel_sizes=tuple(kernel_sizes),
        dilations=tuple(tuple(d) for d in dilations),
        use_mask=use_mask,
        interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("kernel_sizes", "dilations", "use_mask", "interpret"),
)
def _fused_mrf_folded(
    x,
    mask,
    packed_folded,
    kernel_sizes: tuple,
    dilations: tuple,
    use_mask: bool = True,
    interpret: bool = False,
):
    b, t, c = x.shape
    f = _LANE // c
    t_cols = t // f
    halo = _block_halo_cols(kernel_sizes, dilations, f)
    tile = _pick_tile_cols(c, t_cols)
    if tile is None:
        raise ValueError(f"T={t} (cols {t_cols}) has no supported tile")
    n_tiles = t_cols // tile

    # fold: [B, T, C] -> [B, f*C, T/f] with row j*C + c = (phase j, chan c)
    x_f = x.reshape(b, t_cols, f, c).transpose(0, 2, 3, 1)
    x_f = x_f.reshape(b, f * c, t_cols)
    x_f = jnp.pad(x_f, ((0, 0), (0, 0), (halo, halo)))
    m_f = mask.astype(x.dtype).reshape(b, t_cols, f).transpose(0, 2, 1)
    m_f = jnp.repeat(m_f, c, axis=1)  # [B, f*C, T/f] broadcast rows
    m_f = jnp.pad(m_f, ((0, 0), (0, 0), (halo, halo)))

    w = tile + 2 * halo
    starts = np.arange(n_tiles) * tile
    slabs = jnp.stack(
        [jax.lax.dynamic_slice(x_f, (0, 0, int(s)), (b, f * c, w))
         for s in starts], axis=1)
    m_slabs = jnp.stack(
        [jax.lax.dynamic_slice(m_f, (0, 0, int(s)), (b, f * c, w))
         for s in starts], axis=1)

    flat_wb = []
    max_slab_rows = 0
    for blk, (k, ds) in zip(packed_folded, zip(kernel_sizes, dilations)):
        for (w1, b1), (w2, b2) in blk:
            flat_wb += [w1, b1, w2, b2]
            max_slab_rows = max(max_slab_rows, w1.shape[1], w2.shape[1])

    kernel = functools.partial(
        _mrf_folded_kernel,
        kernel_sizes=tuple(kernel_sizes),
        dilations=tuple(tuple(d) for d in dilations),
        f=f,
        halo_cols=halo,
        t_cols=tile,
        use_mask=use_mask,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, f * c, w), lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, f * c, w), lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat_wb],
        out_specs=pl.BlockSpec(
            (1, 1, f * c, tile), lambda bi, ti: (bi, ti, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles, f * c, tile), x.dtype),
        scratch_shapes=[pltpu.VMEM((max_slab_rows, w), x.dtype)],
        interpret=interpret,
    )(slabs, m_slabs, *flat_wb)

    # unfold: [B, n_tiles, fC, tile] -> [B, T, C]
    out = jnp.transpose(out, (0, 1, 3, 2)).reshape(b, t_cols, f, c)
    return out.reshape(b, t, c)
