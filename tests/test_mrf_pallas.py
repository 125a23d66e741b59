"""Fused MRF Pallas kernel vs the XLA ResBlock path (interpret mode on the
CPU mesh; the Mosaic path compiles on TPU only — bench.py exercises it)."""

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp

from bert_vits2_tpu.models.generator import Generator, ResBlock1
from bert_vits2_tpu.ops.mrf_pallas import (
    fused_mrf,
    fused_mrf_supported,
    pack_generator_mrf,
    prepare_mrf_weights,
)

KS = (3, 7, 11)
DS = ((1, 3, 5), (1, 3, 5), (1, 3, 5))


class _MRF(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x, x_mask):
        xs = None
        for j, (k, d) in enumerate(zip(KS, DS)):
            blk = ResBlock1(self.ch, k, d, time_fold=1, name=f"rb_{j}")
            xs = blk(x, x_mask) if xs is None else xs + blk(x, x_mask)
        return xs / len(KS)


@pytest.mark.parametrize("c,t", [(16, 512), (32, 256)])
def test_matches_resblock_stack(c, t):
    rng = np.random.default_rng(c)
    x = jnp.asarray(rng.normal(size=(2, t, c)), jnp.float32)
    lens = [t, t - 57]
    mask = jnp.asarray(
        (np.arange(t)[None, :] < np.asarray(lens)[:, None]).astype(np.float32)
    )
    m = _MRF(c)
    params = m.init(jax.random.key(0), x, mask)["params"]
    want = np.asarray(m.apply({"params": params}, x, mask))
    packed = prepare_mrf_weights(
        [params[f"rb_{j}"] for j in range(3)], KS, DS, jnp.float32
    )
    assert fused_mrf_supported(c, t, KS, DS)
    got = np.asarray(fused_mrf(x, mask, packed, KS, DS))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_unsupported_shapes():
    assert not fused_mrf_supported(256, 1024, KS, DS)  # wide stage
    assert not fused_mrf_supported(16, 100, KS, DS)  # no tile divides T


def test_generator_fused_path_matches():
    """Full Generator with mrf_packed == the plain path (same params)."""
    gen = Generator(
        initial_channel=8,
        resblock_kernel_sizes=KS,
        resblock_dilation_sizes=DS,
        upsample_rates=(4, 4),
        upsample_initial_channel=32,
        upsample_kernel_sizes=(8, 8),
        gin_channels=8,
    )
    rng = np.random.default_rng(7)
    b, t0 = 2, 64
    x = jnp.asarray(rng.normal(size=(b, t0, 8)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(b, 8)), jnp.float32)
    lens = [t0, t0 - 20]
    y_mask = jnp.asarray(
        (np.arange(t0)[None, :] < np.asarray(lens)[:, None]).astype(
            np.float32
        )
    )
    params = gen.init(jax.random.key(0), x, g, y_mask)["params"]
    want = np.asarray(gen.apply({"params": params}, x, g, y_mask))
    packed = pack_generator_mrf(params, KS, DS, (4, 4), 32, jnp.float32)
    assert packed[0] is not None and packed[1] is not None
    got = np.asarray(
        gen.apply({"params": params}, x, g, y_mask, mrf_packed=packed)
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)
    # masked tail is still silent
    assert np.abs(got[1, (t0 - 20) * 16 :]).max() == 0.0


def test_generator_fused_path_matches_unmasked():
    """y_mask=None: the fused path must still match the XLA ResBlock path.

    The kernel runs with an internal all-ones mask so its padded halo zeros
    reproduce the implicit zero-padding of the 'same' convs at the global
    sequence edges (the first/last ~halo samples are where an unmasked
    use_mask=False run would diverge)."""
    gen = Generator(
        initial_channel=8,
        resblock_kernel_sizes=KS,
        resblock_dilation_sizes=DS,
        upsample_rates=(4, 4),
        upsample_initial_channel=32,
        upsample_kernel_sizes=(8, 8),
        gin_channels=8,
    )
    rng = np.random.default_rng(11)
    b, t0 = 2, 64
    x = jnp.asarray(rng.normal(size=(b, t0, 8)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(b, 8)), jnp.float32)
    params = gen.init(jax.random.key(0), x, g, None)["params"]
    want = np.asarray(gen.apply({"params": params}, x, g, None))
    packed = pack_generator_mrf(params, KS, DS, (4, 4), 32, jnp.float32)
    got = np.asarray(
        gen.apply({"params": params}, x, g, None, mrf_packed=packed)
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("c,t", [(16, 1024), (32, 512), (64, 256)])
def test_folded_matches_resblock_stack(c, t):
    """Phase-folded kernel (M = 128 MXU rows) vs the XLA ResBlock path."""
    from bert_vits2_tpu.ops.mrf_pallas import (
        fused_mrf_folded,
        fused_mrf_folded_supported,
        prepare_mrf_weights_folded,
    )

    f = 128 // c
    rng = np.random.default_rng(c)
    x = jnp.asarray(rng.normal(size=(2, t, c)), jnp.float32)
    lens = [t, t - 57]
    mask = jnp.asarray(
        (np.arange(t)[None, :] < np.asarray(lens)[:, None]).astype(np.float32)
    )
    m = _MRF(c)
    params = m.init(jax.random.key(0), x, mask)["params"]
    want = np.asarray(m.apply({"params": params}, x, mask))
    assert fused_mrf_folded_supported(c, t, KS, DS)
    packed = prepare_mrf_weights_folded(
        [params[f"rb_{j}"] for j in range(3)], KS, DS, f, jnp.float32
    )
    got = np.asarray(fused_mrf_folded(x, mask, packed, KS, DS))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)
    # masked tail silent
    assert np.abs(got[1, t - 40:]).max() == 0.0


def test_dispatch_boundaries():
    """Measured dispatch (v5e, device-loop timing): XLA keeps C>=128 (the
    plain conv already runs 158-194 TF/s with M full), the narrow-M kernel
    takes 24..112, and the phase-folded kernel takes C<=16 where the fold
    factor outruns the dilation spread."""
    from bert_vits2_tpu.ops.mrf_pallas import (
        fused_mrf_folded_supported,
        fused_mrf_supported,
        pack_generator_mrf,
    )

    assert not fused_mrf_supported(128, 1024, KS, DS)
    assert fused_mrf_supported(64, 1024, KS, DS)
    assert fused_mrf_folded_supported(16, 1024, KS, DS)

    import flax.linen as nn

    class _Blocks(nn.Module):
        chans = (256, 128, 64, 32, 16)

        @nn.compact
        def __call__(self):
            outs = []
            for i, c in enumerate(self.chans):
                for j, (k, d) in enumerate(zip(KS, DS)):
                    blk = ResBlock1(c, k, d, time_fold=1,
                                    name=f"resblocks_{i * 3 + j}")
                    outs.append(blk(jnp.zeros((1, 32, c)), None))
            return outs

    params = _Blocks().init(jax.random.key(0))["params"]
    packed = pack_generator_mrf(params, KS, DS, (8, 8, 2, 2, 2), 512,
                                jnp.float32)
    kinds = [None if p is None else next(iter(p)) for p in packed]
    assert kinds == [None, None, "plain", "plain", "folded"]
