"""L1 NN block tests: torch-functional parity for convs, flow invertibility,
mask invariance for the encoder."""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bert_vits2_tpu import nn as bnn
from bert_vits2_tpu.ops import sequence_mask


def _np(x):
    return np.asarray(x)


class TestConv:
    def test_conv1d_matches_torch(self):
        import torch
        import torch.nn.functional as F

        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 16, 8)).astype(np.float32)  # [b, t, c]
        layer = bnn.Conv1d(features=12, kernel_size=3, dilation=2, padding=2)
        params = layer.init(jax.random.key(0), jnp.asarray(x))
        ours = _np(layer.apply(params, jnp.asarray(x)))

        k = _np(params["params"]["kernel"])  # [k, in, out]
        b = _np(params["params"]["bias"])
        w_t = torch.from_numpy(np.transpose(k, (2, 1, 0)))  # [out, in, k]
        golden = F.conv1d(
            torch.from_numpy(np.transpose(x, (0, 2, 1))),
            w_t,
            torch.from_numpy(b),
            dilation=2,
            padding=2,
        ).numpy()
        np.testing.assert_allclose(ours, np.transpose(golden, (0, 2, 1)), atol=1e-5)

    def test_conv1d_grouped_matches_torch(self):
        import torch
        import torch.nn.functional as F

        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 10, 8)).astype(np.float32)
        layer = bnn.Conv1d(features=8, kernel_size=5, groups=8, padding=2)
        params = layer.init(jax.random.key(1), jnp.asarray(x))
        ours = _np(layer.apply(params, jnp.asarray(x)))
        k = _np(params["params"]["kernel"])  # [k, 1, out]
        b = _np(params["params"]["bias"])
        golden = F.conv1d(
            torch.from_numpy(np.transpose(x, (0, 2, 1))),
            torch.from_numpy(np.transpose(k, (2, 1, 0))),
            torch.from_numpy(b),
            padding=2,
            groups=8,
        ).numpy()
        np.testing.assert_allclose(ours, np.transpose(golden, (0, 2, 1)), atol=1e-5)

    def test_weight_norm_conv_matches_torch(self):
        import torch

        rng = np.random.default_rng(2)
        x = rng.normal(size=(1, 12, 4)).astype(np.float32)
        layer = bnn.Conv1d(features=6, kernel_size=3, padding=1, use_weight_norm=True)
        params = layer.init(jax.random.key(2), jnp.asarray(x))
        # perturb g away from ||v|| so the reparameterization actually matters
        params = flax.core.unfreeze(params)
        params["params"]["g"] = params["params"]["g"] * 1.7
        ours = _np(layer.apply(params, jnp.asarray(x)))

        v = _np(params["params"]["v"])  # [k, in, out]
        g = _np(params["params"]["g"])
        b = _np(params["params"]["bias"])
        conv = torch.nn.Conv1d(4, 6, 3, padding=1)
        conv = torch.nn.utils.weight_norm(conv)
        with torch.no_grad():
            conv.weight_v.copy_(torch.from_numpy(np.transpose(v, (2, 1, 0))))
            conv.weight_g.copy_(torch.from_numpy(g.reshape(6, 1, 1)))
            conv.bias.copy_(torch.from_numpy(b))
        golden = conv(torch.from_numpy(np.transpose(x, (0, 2, 1)))).detach().numpy()
        np.testing.assert_allclose(ours, np.transpose(golden, (0, 2, 1)), atol=1e-5)

    @pytest.mark.parametrize("k,s,p", [(16, 8, 4), (4, 2, 1), (8, 2, 3)])
    def test_conv_transpose_matches_torch(self, k, s, p):
        import torch

        rng = np.random.default_rng(3)
        x = rng.normal(size=(2, 9, 6)).astype(np.float32)
        layer = bnn.ConvTranspose1d(
            features=5, kernel_size=k, stride=s, padding=p, use_weight_norm=True
        )
        params = layer.init(jax.random.key(3), jnp.asarray(x))
        params = flax.core.unfreeze(params)
        params["params"]["g"] = params["params"]["g"] * 0.6
        ours = _np(layer.apply(params, jnp.asarray(x)))

        v = _np(params["params"]["v"])  # [k, in, out]
        g = _np(params["params"]["g"])  # [in]
        b = _np(params["params"]["bias"])
        conv = torch.nn.ConvTranspose1d(6, 5, k, s, padding=p)
        conv = torch.nn.utils.weight_norm(conv)
        with torch.no_grad():
            conv.weight_v.copy_(torch.from_numpy(np.transpose(v, (1, 2, 0))))
            conv.weight_g.copy_(torch.from_numpy(g.reshape(6, 1, 1)))
            conv.bias.copy_(torch.from_numpy(b))
        golden = conv(torch.from_numpy(np.transpose(x, (0, 2, 1)))).detach().numpy()
        golden = np.transpose(golden, (0, 2, 1))
        assert ours.shape == golden.shape
        np.testing.assert_allclose(ours, golden, atol=1e-4)

    @pytest.mark.parametrize("k,d", [(3, 1), (3, 5), (7, 3), (11, 5), (1, 1)])
    def test_time_folded_conv_matches_unfolded(self, k, d):
        """time_fold runs the conv in [b, t/f, f*c] space (MXU lane packing);
        must be bit-level-close to the plain conv with identical params."""
        rng = np.random.default_rng(3)
        b, t, c, f = 2, 48, 4, 8
        x = jnp.asarray(rng.normal(size=(b, t, c)), jnp.float32)
        p = (k * d - d) // 2
        plain = bnn.Conv1d(c, k, dilation=d, padding=p, use_weight_norm=True)
        params = plain.init(jax.random.key(1), x)
        y0 = _np(plain.apply(params, x))
        folded = bnn.Conv1d(
            c, k, dilation=d, padding=p, use_weight_norm=True, time_fold=f
        )
        yf = _np(folded.apply(params, x.reshape(b, t // f, f * c))).reshape(b, t, c)
        np.testing.assert_allclose(yf, y0, atol=1e-6)

    def test_time_folded_resblock_matches_unfolded(self):
        from bert_vits2_tpu.models.generator import ResBlock1

        rng = np.random.default_rng(4)
        b, t, c, f = 2, 48, 4, 8
        x = jnp.asarray(rng.normal(size=(b, t, c)), jnp.float32)
        mask = jnp.asarray(rng.uniform(size=(b, t)) > 0.2, jnp.float32)
        block = ResBlock1(c, 3, (1, 3, 5))
        params = block.init(jax.random.key(2), x, mask)
        y0 = _np(block.apply(params, x, mask))
        yf = _np(ResBlock1(c, 3, (1, 3, 5), time_fold=f).apply(params, x, mask))
        np.testing.assert_allclose(yf, y0, atol=1e-6)

    def test_banded_attention_dispatch_matches_dense(self):
        """MultiHeadAttention with x_mask_vec routes through the fused-kernel
        dispatch (lax.platform_dependent; dense branch on CPU). Must equal the
        original attn_mask-only path on valid rows. The TPU kernel itself is
        checked against the dense branch on real hardware (bench/driver)."""
        from bert_vits2_tpu.nn.attention import MultiHeadAttention

        rng = np.random.default_rng(5)
        b, t, ch, h = 3, 64, 32, 2
        x = jnp.asarray(rng.normal(size=(b, t, ch)), jnp.float32)
        mask = np.ones((b, t), np.float32)
        mask[0, 40:] = 0
        mask[2, 10:] = 0
        mask = jnp.asarray(mask)
        am = mask[:, None, :, None] * mask[:, None, None, :]
        att = MultiHeadAttention(ch, ch, h, window_size=4)
        params = att.init(jax.random.key(0), x, x, am)
        y_old = _np(att.apply(params, x, x, am))
        y_new = _np(att.apply(params, x, x, am, x_mask_vec=mask))
        np.testing.assert_allclose(
            y_new * _np(mask)[..., None], y_old * _np(mask)[..., None], atol=2e-5
        )

    def test_layernorm_matches_torch(self):
        import torch
        import torch.nn.functional as F

        rng = np.random.default_rng(4)
        x = rng.normal(size=(2, 7, 5)).astype(np.float32)
        layer = bnn.LayerNorm(5)
        params = layer.init(jax.random.key(4), jnp.asarray(x))
        params = flax.core.unfreeze(params)
        params["params"]["gamma"] = jnp.asarray(rng.normal(size=5).astype(np.float32))
        params["params"]["beta"] = jnp.asarray(rng.normal(size=5).astype(np.float32))
        ours = _np(layer.apply(params, jnp.asarray(x)))
        golden = F.layer_norm(
            torch.from_numpy(x),
            (5,),
            torch.from_numpy(_np(params["params"]["gamma"])),
            torch.from_numpy(_np(params["params"]["beta"])),
            1e-5,
        ).numpy()
        np.testing.assert_allclose(ours, golden, atol=1e-5)


class TestEncoder:
    def test_mask_invariance(self):
        """Padding content must not affect valid positions."""
        enc = bnn.Encoder(
            hidden_channels=32, filter_channels=64, n_heads=2, n_layers=2, kernel_size=3
        )
        rng = np.random.default_rng(5)
        x = rng.normal(size=(1, 10, 32)).astype(np.float32)
        mask = _np(sequence_mask(jnp.array([6]), 10))
        params = enc.init(jax.random.key(5), jnp.asarray(x), jnp.asarray(mask))
        y1 = _np(enc.apply(params, jnp.asarray(x), jnp.asarray(mask)))
        x2 = x.copy()
        x2[:, 6:] = 99.0  # garbage in the padding
        y2 = _np(enc.apply(params, jnp.asarray(x2), jnp.asarray(mask)))
        np.testing.assert_allclose(y1[:, :6], y2[:, :6], atol=1e-5)
        assert np.abs(y1[:, 6:]).max() == 0.0

    def test_speaker_conditioning_changes_output(self):
        enc = bnn.Encoder(
            hidden_channels=16,
            filter_channels=32,
            n_heads=2,
            n_layers=3,
            gin_channels=8,
        )
        x = jnp.asarray(np.random.default_rng(6).normal(size=(1, 5, 16)), jnp.float32)
        mask = jnp.ones((1, 5))
        g = jnp.ones((1, 8))
        params = enc.init(jax.random.key(6), x, mask, g=g)
        y_g = _np(enc.apply(params, x, mask, g=g))
        y_0 = _np(enc.apply(params, x, mask, g=None))
        assert np.abs(y_g - y_0).max() > 1e-4


class TestFlows:
    def _roundtrip(self, module, x, mask, g=None, **init_kw):
        params = module.init(jax.random.key(0), x, mask, **init_kw)
        # randomize the zero-init projections so the flow is non-trivial
        params = jax.tree.map(
            lambda p: p + 0.01 * np.random.default_rng(1).normal(size=p.shape).astype(np.float32),
            flax.core.unfreeze(params),
        )
        fwd = module.apply(params, x, mask, **init_kw)
        y = fwd[0] if isinstance(fwd, tuple) else fwd
        x_rec = module.apply(params, y, mask, reverse=True, **init_kw)
        return _np(x), _np(x_rec), fwd

    def test_elementwise_affine_roundtrip(self):
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 6, 3)), jnp.float32)
        mask = jnp.ones((2, 6))
        x0, x1, (y, logdet) = self._roundtrip(bnn.ElementwiseAffine(3), x, mask)
        np.testing.assert_allclose(x0, x1, atol=1e-5)
        assert logdet.shape == (2,)

    def test_residual_coupling_roundtrip(self):
        x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 8, 4)), jnp.float32)
        mask = jnp.ones((2, 8))
        mod = bnn.ResidualCouplingLayer(
            channels=4, hidden_channels=16, kernel_size=5, dilation_rate=1, n_layers=2,
            mean_only=True,
        )
        x0, x1, _ = self._roundtrip(mod, x, mask)
        np.testing.assert_allclose(x0, x1, atol=1e-5)

    def test_transformer_coupling_roundtrip(self):
        x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 6, 4)), jnp.float32)
        mask = jnp.ones((1, 6))
        mod = bnn.TransformerCouplingLayer(
            channels=4, hidden_channels=16, kernel_size=3, n_layers=2, n_heads=2,
            filter_channels=32, mean_only=True,
        )
        x0, x1, _ = self._roundtrip(mod, x, mask)
        np.testing.assert_allclose(x0, x1, atol=1e-5)

    def test_conv_flow_roundtrip(self):
        x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 5, 2)), jnp.float32)
        mask = jnp.ones((2, 5))
        mod = bnn.ConvFlow(in_channels=2, filter_channels=16, kernel_size=3, n_layers=2)
        x0, x1, (y, logdet) = self._roundtrip(mod, x, mask)
        np.testing.assert_allclose(x0, x1, atol=1e-4)

    def test_log_flow_roundtrip(self):
        x = jnp.asarray(np.random.default_rng(4).uniform(0.1, 3, (1, 4, 2)), jnp.float32)
        mask = jnp.ones((1, 4))
        mod = bnn.Log()
        params = mod.init(jax.random.key(0), x, mask)
        y, logdet = mod.apply(params, x, mask)
        x_rec = mod.apply(params, y, mask, reverse=True)
        np.testing.assert_allclose(_np(x_rec), _np(x), atol=1e-3)


class TestWN:
    def test_shapes_and_mask(self):
        wn = bnn.WN(hidden_channels=16, kernel_size=5, dilation_rate=1, n_layers=4,
                    gin_channels=8)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 12, 16)), jnp.float32)
        mask = jnp.asarray(sequence_mask(jnp.array([12, 7]), 12))
        g = jnp.ones((2, 8))
        params = wn.init(jax.random.key(0), x, mask, g=g)
        y = _np(wn.apply(params, x, mask, g=g))
        assert y.shape == (2, 12, 16)
        assert np.abs(y[1, 7:]).max() == 0.0
