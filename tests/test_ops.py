"""L0 op tests: golden-value checks for DSP, spline, MAS, masking.

torch (CPU) serves as the oracle for STFT numerics, mirroring the reference's
use of torch.stft (mel_processing.py:64). The MAS oracle is the pure-numpy
golden model of the numba DP.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bert_vits2_tpu import ops
from bert_vits2_tpu.ops.align import maximum_path_numpy
from bert_vits2_tpu.ops.stft import hann_window_periodic


class TestMasking:
    def test_sequence_mask(self):
        m = ops.sequence_mask(jnp.array([2, 4]), 5)
        np.testing.assert_array_equal(
            np.asarray(m), [[1, 1, 0, 0, 0], [1, 1, 1, 1, 0]]
        )

    def test_intersperse(self):
        assert ops.intersperse([1, 2, 3], 0) == [0, 1, 0, 2, 0, 3, 0]
        out = ops.intersperse_jnp(jnp.array([1, 2, 3]), 0)
        np.testing.assert_array_equal(np.asarray(out), [0, 1, 0, 2, 0, 3, 0])

    def test_slice_segments(self):
        x = jnp.arange(24, dtype=jnp.float32).reshape(2, 6, 2)
        out = ops.slice_segments(x, jnp.array([1, 3]), 2)
        np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(x[0, 1:3]))
        np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(x[1, 3:5]))

    def test_rand_slice_in_bounds(self):
        x = jnp.ones((4, 20, 3))
        lengths = jnp.array([20, 10, 5, 4])
        _, starts = ops.rand_slice_segments(x, lengths, 4, jax.random.key(0))
        starts = np.asarray(starts)
        assert (starts >= 0).all()
        assert (starts + 4 <= np.asarray(lengths)).all()

    def test_generate_path(self):
        # durations [2, 1, 3] over t_y=6
        dur = jnp.array([[2, 1, 3]], dtype=jnp.float32)
        x_mask = jnp.ones((1, 3))
        y_mask = jnp.ones((1, 6))
        path = np.asarray(ops.generate_path(dur, x_mask, y_mask))[0]
        expected = np.zeros((6, 3))
        expected[0:2, 0] = 1
        expected[2:3, 1] = 1
        expected[3:6, 2] = 1
        np.testing.assert_array_equal(path, expected)
        # each frame attends exactly one token
        assert (path.sum(-1) == 1).all()


class TestSTFT:
    @pytest.mark.parametrize("t", [8192, 16384])
    def test_spectrogram_matches_torch(self, t):
        import torch

        n_fft, hop, win = 1024, 256, 1024
        rng = np.random.default_rng(0)
        y = rng.uniform(-0.9, 0.9, size=(2, t)).astype(np.float32)

        ours = np.asarray(ops.spectrogram(jnp.asarray(y), n_fft, hop, win))

        yt = torch.from_numpy(y)
        pad = (n_fft - hop) // 2
        yt = torch.nn.functional.pad(yt.unsqueeze(1), (pad, pad), mode="reflect")[:, 0]
        spec = torch.stft(
            yt,
            n_fft,
            hop_length=hop,
            win_length=win,
            window=torch.hann_window(win),
            center=False,
            onesided=True,
            return_complex=True,
        )
        golden = torch.sqrt(spec.real**2 + spec.imag**2 + 1e-6).numpy()
        golden = np.transpose(golden, (0, 2, 1))  # to channel-last
        assert ours.shape == golden.shape
        np.testing.assert_allclose(ours, golden, atol=2e-3, rtol=1e-4)

    def test_frame_count_is_t_over_hop(self):
        spec = ops.spectrogram(jnp.zeros((1, 16384)), 2048, 512, 2048)
        assert spec.shape == (1, 32, 1025)

    def test_hann_periodic(self):
        import torch

        np.testing.assert_allclose(
            hann_window_periodic(64), torch.hann_window(64).numpy(), atol=1e-6
        )

    def test_mel_filterbank_slaney_properties(self):
        fb = ops.mel_filterbank(44100, 2048, 128, 0.0, None)
        assert fb.shape == (128, 1025)
        assert (fb >= 0).all()
        # every filter has support; filters overlap only with neighbors
        assert (fb.sum(axis=1) > 0).all()
        # slaney norm: peak of each triangle equals 2/(width in Hz)
        # -> check against a hand-computed small case at linear (sub-1kHz) range
        fb_small = ops.mel_filterbank(8000, 512, 4, 0.0, 1000.0)
        assert fb_small.shape == (4, 257)

    def test_mel_spectrogram_shape_and_finite(self):
        y = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (2, 16384)), jnp.float32)
        mel = ops.mel_spectrogram(y, 2048, 128, 44100, 512, 2048, 0.0, None)
        assert mel.shape == (2, 32, 128)
        assert np.isfinite(np.asarray(mel)).all()
        # silence: magnitude floor is sqrt(1e-6)=1e-3 (mel_processing.py:77),
        # so the log-mel of silence is a constant per-mel value, same per frame
        mel0 = np.asarray(
            ops.mel_spectrogram(jnp.zeros((1, 4096)), 2048, 128, 44100, 512, 2048, 0.0, None)
        )
        assert (mel0 < -9.0).all()
        np.testing.assert_allclose(mel0[0, 0], mel0[0, -1], atol=1e-5)


class TestSpline:
    def _params(self, shape, num_bins=10, seed=0):
        rng = np.random.default_rng(seed)
        w = rng.normal(size=shape + (num_bins,)).astype(np.float32)
        h = rng.normal(size=shape + (num_bins,)).astype(np.float32)
        d = rng.normal(size=shape + (num_bins - 1,)).astype(np.float32)
        return jnp.asarray(w), jnp.asarray(h), jnp.asarray(d)

    def test_forward_inverse_roundtrip(self):
        shape = (4, 7)
        w, h, d = self._params(shape)
        x = jnp.asarray(
            np.random.default_rng(1).uniform(-8, 8, size=shape).astype(np.float32)
        )
        y, lad = ops.piecewise_rational_quadratic_transform(
            x, w, h, d, inverse=False, tails="linear", tail_bound=5.0
        )
        x2, lad_inv = ops.piecewise_rational_quadratic_transform(
            y, w, h, d, inverse=True, tails="linear", tail_bound=5.0
        )
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
        np.testing.assert_allclose(np.asarray(lad_inv), -np.asarray(lad), atol=1e-4)

    def test_identity_outside_tails(self):
        shape = (3,)
        w, h, d = self._params(shape, seed=2)
        x = jnp.asarray(np.array([-7.0, 6.0, 9.0], dtype=np.float32))
        y, lad = ops.piecewise_rational_quadratic_transform(
            x, w, h, d, inverse=False, tails="linear", tail_bound=5.0
        )
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)
        np.testing.assert_allclose(np.asarray(lad), 0.0, atol=1e-6)

    def test_logabsdet_matches_autodiff(self):
        w, h, d = self._params((), seed=3)

        def f(x):
            y, _ = ops.piecewise_rational_quadratic_transform(
                x, w, h, d, inverse=False, tails="linear", tail_bound=5.0
            )
            return y

        for xv in [-3.0, -0.5, 0.1, 2.7, 4.9]:
            x = jnp.float32(xv)
            _, lad = ops.piecewise_rational_quadratic_transform(
                x, w, h, d, inverse=False, tails="linear", tail_bound=5.0
            )
            grad = jax.grad(f)(x)
            np.testing.assert_allclose(
                np.asarray(lad), np.log(np.abs(np.asarray(grad))), atol=1e-3
            )

    def test_monotone(self):
        w, h, d = self._params((), seed=4)
        xs = jnp.linspace(-4.9, 4.9, 201)
        wb = jnp.broadcast_to(w, xs.shape + w.shape)
        hb = jnp.broadcast_to(h, xs.shape + h.shape)
        db = jnp.broadcast_to(d, xs.shape + d.shape)
        ys, _ = ops.piecewise_rational_quadratic_transform(
            xs, wb, hb, db, inverse=False, tails="linear", tail_bound=5.0
        )
        assert (np.diff(np.asarray(ys)) > 0).all()


class TestMAS:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_numpy_golden(self, seed):
        rng = np.random.default_rng(seed)
        b, t_y, t_x = 3, 37, 11
        neg_cent = rng.normal(size=(b, t_y, t_x)).astype(np.float32)
        t_ys = np.array([37, 25, 13], dtype=np.int32)
        t_xs = np.array([11, 8, 5], dtype=np.int32)
        golden = maximum_path_numpy(neg_cent, t_ys, t_xs)
        ours = np.asarray(
            jax.jit(ops.maximum_path_scan)(
                jnp.asarray(neg_cent), jnp.asarray(t_ys), jnp.asarray(t_xs)
            )
        )
        np.testing.assert_array_equal(ours, golden)

    def test_path_is_valid_monotonic(self):
        rng = np.random.default_rng(7)
        neg_cent = rng.normal(size=(1, 20, 6)).astype(np.float32)
        path = np.asarray(
            ops.maximum_path_scan(
                jnp.asarray(neg_cent), jnp.array([20]), jnp.array([6])
            )
        )[0]
        # one token per frame, all tokens covered, monotonic non-decreasing
        assert (path.sum(-1) == 1).all()
        assert (path.sum(0) >= 1).all()
        tok = path.argmax(-1)
        assert (np.diff(tok) >= 0).all() and (np.diff(tok) <= 1).all()

    def test_mask_api(self):
        rng = np.random.default_rng(9)
        neg_cent = rng.normal(size=(2, 15, 5)).astype(np.float32)
        t_ys = np.array([15, 10], dtype=np.int32)
        t_xs = np.array([5, 3], dtype=np.int32)
        mask = (
            ops.sequence_mask(jnp.asarray(t_ys), 15)[:, :, None]
            * ops.sequence_mask(jnp.asarray(t_xs), 5)[:, None, :]
        )
        ours = np.asarray(ops.maximum_path(jnp.asarray(neg_cent), mask))
        golden = maximum_path_numpy(neg_cent, t_ys, t_xs)
        np.testing.assert_array_equal(ours, golden)
        # nothing outside the mask
        assert (ours * (1 - np.asarray(mask)) == 0).all()


class TestMASPallas:
    """Fused Pallas MAS kernel vs the numpy golden (interpret mode on CPU;
    the same kernel is validated compiled on real TPU hardware by bench/CI)."""

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_numpy_golden(self, seed):
        from bert_vits2_tpu.ops.align import maximum_path_numpy
        from bert_vits2_tpu.ops.align_pallas import maximum_path_pallas

        rng = np.random.default_rng(seed)
        b, t_y_max, t_x_max = 5, 43, 21
        neg = rng.normal(size=(b, t_y_max, t_x_max)).astype(np.float32)
        t_ys = rng.integers(4, t_y_max + 1, b).astype(np.int32)
        t_xs = np.minimum(rng.integers(2, t_x_max + 1, b), t_ys).astype(np.int32)
        gold = maximum_path_numpy(neg, t_ys, t_xs)
        got = np.asarray(maximum_path_pallas(neg, t_ys, t_xs, interpret=True))
        np.testing.assert_array_equal(gold, got)

    def test_batch_padding_edge(self):
        # b=1 (pads to 8), t_x exactly one lane tile boundary
        from bert_vits2_tpu.ops.align import maximum_path_numpy
        from bert_vits2_tpu.ops.align_pallas import maximum_path_pallas

        rng = np.random.default_rng(7)
        neg = rng.normal(size=(1, 16, 128)).astype(np.float32)
        t_ys = np.asarray([16], np.int32)
        t_xs = np.asarray([128], np.int32)
        # infeasible (t_x > t_y) bands are clamped by caller; use t_x <= t_y
        t_xs = np.asarray([16], np.int32)
        gold = maximum_path_numpy(neg, t_ys, t_xs)
        got = np.asarray(maximum_path_pallas(neg, t_ys, t_xs, interpret=True))
        np.testing.assert_array_equal(gold, got)


class TestBandedAttentionVJP:
    """The fused banded attention's custom_vjp (Pallas backward kernels,
    interpret mode on CPU) against autodiff of the dense XLA formulation —
    the same function the reference trains through (attentions.py:205-341,
    incl. the attention-prob dropout at :278)."""

    def _setup(self, b=2, h=2, t=64, d=32, w=4):
        from bert_vits2_tpu.nn.attention import _abs_to_band, _band_to_abs

        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
        ek = jnp.asarray(rng.normal(size=(2 * w + 1, d)) * 0.2, jnp.float32)
        ev = jnp.asarray(rng.normal(size=(2 * w + 1, d)) * 0.2, jnp.float32)
        lens = np.full((b,), t)
        lens[-1] = t - 10
        mask = jnp.asarray(
            (np.arange(t)[None, :] < lens[:, None]).astype(np.float32)
        )
        seed = jnp.asarray([12345], jnp.int32)

        def dense(q, k, v, ek, ev, p_drop):
            from bert_vits2_tpu.ops.attention_pallas import hash_dropout_probs

            scores = jnp.einsum("bhtd,bhsd->bhts", q, k)
            rel_band = jnp.einsum("bhtd,cd->bhtc", q, ek)
            scores = scores + _band_to_abs(rel_band, t, w)
            am = mask[:, None, :, None] * mask[:, None, None, :]
            scores = jnp.where(am == 0, -1e4, scores)
            p = jax.nn.softmax(scores, axis=-1)
            if p_drop > 0.0:
                p = hash_dropout_probs(p, p_drop, seed)
            out = jnp.einsum("bhts,bhsd->bhtd", p, v)
            band = _abs_to_band(p, w)
            return out + jnp.einsum("bhtc,cd->bhtd", band, ev)

        return (q, k, v, ek, ev), mask, seed, w, dense

    @pytest.mark.parametrize("p_drop", [0.0, 0.1])
    def test_grads_match_dense(self, p_drop):
        from bert_vits2_tpu.ops.attention_pallas import banded_rel_self_attention

        args, mask, seed, w, dense = self._setup()
        vm = mask[:, None, :, None]

        def fused(q, k, v, ek, ev):
            return banded_rel_self_attention(
                q, k, v, mask, ek, ev, w,
                dropout_p=p_drop, dropout_seed=seed, interpret=True,
            )

        o1 = fused(*args)
        o2 = dense(*args, p_drop)
        # valid rows only: the kernel skips the query-row mask (consumers
        # re-mask), so padded rows legitimately differ
        np.testing.assert_allclose(
            np.asarray((o1 - o2) * vm), 0.0, atol=1e-5
        )
        g1 = jax.grad(lambda a: jnp.sum((fused(*a) * vm) ** 2))(args)
        g2 = jax.grad(lambda a: jnp.sum((dense(*a, p_drop) * vm) ** 2))(args)
        for name, a, b_ in zip(("dq", "dk", "dv", "dek", "dev"), g1, g2):
            scale = float(jnp.max(jnp.abs(b_))) + 1e-9
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(b_) / scale,
                atol=3e-5, err_msg=name,
            )

    def test_dropout_rate_determinism(self):
        from bert_vits2_tpu.ops.attention_pallas import _drop_threshold, _hash_keep

        rows = jnp.broadcast_to(jnp.arange(512)[:, None], (512, 512))
        cols = jnp.broadcast_to(jnp.arange(512)[None, :], (512, 512))
        k1 = _hash_keep(rows, cols, 3, jnp.int32(99), _drop_threshold(0.1))
        k2 = _hash_keep(rows, cols, 3, jnp.int32(99), _drop_threshold(0.1))
        k3 = _hash_keep(rows, cols, 3, jnp.int32(100), _drop_threshold(0.1))
        assert np.array_equal(np.asarray(k1), np.asarray(k2))
        assert not np.array_equal(np.asarray(k1), np.asarray(k3))
        rate = float(jnp.mean(k1))
        assert abs(rate - 0.9) < 0.01  # Bernoulli(0.9) over 262k positions

    def test_module_train_mode_grads_flow(self):
        """MultiHeadAttention in train mode (dropout on) takes the hash-
        dropout dispatch on CPU; grads are finite and depend on the rng."""
        from bert_vits2_tpu.nn.attention import MultiHeadAttention

        rng = np.random.default_rng(5)
        b, t, ch, h = 2, 64, 32, 2
        x = jnp.asarray(rng.normal(size=(b, t, ch)), jnp.float32)
        mask = jnp.ones((b, t), jnp.float32)
        am = mask[:, None, :, None] * mask[:, None, None, :]
        att = MultiHeadAttention(ch, ch, h, window_size=4, p_dropout=0.25)
        params = att.init(jax.random.key(0), x, x, am)

        def loss(p, key):
            y = att.apply(
                p, x, x, am, x_mask_vec=mask, deterministic=False,
                rngs={"dropout": key},
            )
            return jnp.sum(y**2)

        g1 = jax.grad(loss)(params, jax.random.key(1))
        leaves = jax.tree.leaves(g1)
        assert all(bool(jnp.isfinite(g).all()) for g in leaves)
        l1 = loss(params, jax.random.key(1))
        l2 = loss(params, jax.random.key(2))
        assert float(l1) != float(l2)  # dropout stream actually applied
