"""Checkpoint-import tests.

Unit-level: key canonicalization, Flip-skipping renumbering, layout transforms,
LSTM gate splitting (numeric vs torch.nn.LSTM). The full end-to-end check vs
the actual reference model (all 1125 tensors, wave err <=1e-5) lives in
tools/parity_reference.py because it needs /root/reference mounted.
"""

import numpy as np
import pytest

from bert_vits2_tpu.compat.torch_import import (
    _canon,
    _convert_lstm,
    _dense_renumber,
    _flatten,
    _sdp_renumber,
    convert_state_dict,
    mpd_rename,
    synthesizer_rename,
)


class TestKeyMapping:
    def test_canon_merges_list_indices(self):
        assert _canon("dec.resblocks.0.convs1.2.weight_v".split(".")) == [
            "dec", "resblocks_0", "convs1_2", "weight_v",
        ]

    def test_canon_keeps_literal_names(self):
        assert _canon("norm_1.gamma".split(".")) == ["norm_1", "gamma"]

    def test_flow_renumber_skips_flips(self):
        # torch flow.flows = [coupling, Flip, coupling, Flip, ...] -> 0,2,4,6
        for torch_i, dense_i in [(0, 0), (2, 1), (4, 2), (6, 3)]:
            assert (
                _dense_renumber(f"flow.flows.{torch_i}.pre.weight", "flow.flows")
                == f"flow.flows.{dense_i}.pre.weight"
            )

    def test_sdp_renumber(self):
        # sdp.flows = [ElementwiseAffine, ConvFlow, Flip, ConvFlow, Flip, ...]
        assert synthesizer_rename("sdp.flows.0.m") == "sdp.flow_ea.m"
        assert synthesizer_rename("sdp.flows.1.pre.weight") == "sdp.flows.0.pre.weight"
        assert synthesizer_rename("sdp.flows.7.pre.weight") == "sdp.flows.3.pre.weight"
        assert synthesizer_rename("sdp.post_flows.0.logs") == "sdp.post_flow_ea.logs"
        assert synthesizer_rename("sdp.post_flows.5.proj.bias") == "sdp.post_flows.2.proj.bias"

    def test_mpd_rename(self):
        r = mpd_rename((2, 3, 5, 7, 11))
        assert r("discriminators.0.convs.1.weight_v") == "disc_s.convs.1.weight_v"
        assert r("discriminators.3.convs.0.bias") == "disc_p5.convs.0.bias"


class TestConvertStateDict:
    def _tiny_tree(self):
        import jax.numpy as jnp

        return {
            "params": {
                "proj": {"kernel": jnp.zeros((4, 8)), "bias": jnp.zeros((8,))},
                "conv": {"v": jnp.zeros((3, 4, 8)), "g": jnp.zeros((8,)),
                          "bias": jnp.zeros((8,))},
                "emb": {"embedding": jnp.zeros((10, 4))},
                "ups_0": {"v": jnp.zeros((4, 6, 3)), "g": jnp.zeros((6,)),
                           "bias": jnp.zeros((3,))},
                "norm": {"gamma": jnp.zeros((4,)), "beta": jnp.zeros((4,))},
            }
        }

    def test_layout_transforms(self):
        rng = np.random.default_rng(0)
        sd = {
            "proj.weight": rng.normal(size=(8, 4)).astype(np.float32),  # Linear
            "proj.bias": rng.normal(size=(8,)).astype(np.float32),
            "conv.weight_v": rng.normal(size=(8, 4, 3)).astype(np.float32),
            "conv.weight_g": rng.normal(size=(8, 1, 1)).astype(np.float32),
            "conv.bias": rng.normal(size=(8,)).astype(np.float32),
            "emb.weight": rng.normal(size=(10, 4)).astype(np.float32),
            # ConvTranspose: torch [in=6, out=3, k=4] -> flax [4, 6, 3]
            "ups.0.weight_v": rng.normal(size=(6, 3, 4)).astype(np.float32),
            "ups.0.weight_g": rng.normal(size=(6, 1, 1)).astype(np.float32),
            "ups.0.bias": rng.normal(size=(3,)).astype(np.float32),
            "norm.gamma": rng.normal(size=(4,)).astype(np.float32),
            "norm.beta": rng.normal(size=(4,)).astype(np.float32),
        }
        params, report = convert_state_dict(sd, self._tiny_tree())
        assert not report["unmatched"] and not report["unused_flax"]
        p = params["params"]
        np.testing.assert_array_equal(p["proj"]["kernel"], sd["proj.weight"].T)
        np.testing.assert_array_equal(
            p["conv"]["v"], np.transpose(sd["conv.weight_v"], (2, 1, 0))
        )
        np.testing.assert_array_equal(p["conv"]["g"], sd["conv.weight_g"].reshape(-1))
        np.testing.assert_array_equal(p["emb"]["embedding"], sd["emb.weight"])
        np.testing.assert_array_equal(
            p["ups_0"]["v"], np.transpose(sd["ups.0.weight_v"], (2, 0, 1))
        )
        np.testing.assert_array_equal(p["norm"]["gamma"], sd["norm.gamma"])

    def test_strict_raises_on_missing(self):
        sd = {"bogus.weight": np.zeros((2, 2), np.float32)}
        with pytest.raises(KeyError):
            convert_state_dict(sd, self._tiny_tree())

    def test_k1_conv_to_dense(self):
        import jax.numpy as jnp

        tree = {"params": {"attn": {"conv_q": {"kernel": jnp.zeros((4, 4)),
                                                "bias": jnp.zeros((4,))}}}}
        w = np.random.default_rng(1).normal(size=(4, 4, 1)).astype(np.float32)
        sd = {"attn.conv_q.weight": w, "attn.conv_q.bias": np.zeros(4, np.float32)}
        params, _ = convert_state_dict(sd, tree)
        np.testing.assert_array_equal(params["params"]["attn"]["conv_q"]["kernel"], w[:, :, 0].T)


class TestLSTMConversion:
    def test_matches_torch_bilstm(self):
        """Reference DurationDiscriminator LSTM (models.py:41): torch fused
        bidirectional LSTM == flax fwd/bwd RNN pair after gate splitting."""
        import torch
        import jax
        import jax.numpy as jnp
        import flax.linen as nn

        in_dim, h = 6, 5
        torch.manual_seed(0)
        lstm = torch.nn.LSTM(in_dim, h, batch_first=True, bidirectional=True)
        sd = {f"LSTM.{k}": v.detach().numpy() for k, v in lstm.state_dict().items()}

        class BiLSTM(nn.Module):
            # setup-style so cell params nest as lstm_fwd/cell/... like
            # models.DurationDiscriminator
            def setup(self):
                self.lstm_fwd = nn.RNN(nn.OptimizedLSTMCell(h), name="lstm_fwd")
                self.lstm_bwd = nn.RNN(nn.OptimizedLSTMCell(h), reverse=True,
                                       keep_order=True, name="lstm_bwd")

            def __call__(self, x):
                return jnp.concatenate(
                    [self.lstm_fwd(x), self.lstm_bwd(x)], axis=-1
                )

        x = np.random.default_rng(2).normal(size=(2, 7, in_dim)).astype(np.float32)
        model = BiLSTM()
        p0 = model.init(jax.random.key(0), jnp.asarray(x))
        flat = _flatten(p0["params"])
        conv = _convert_lstm(sd, flat, "LSTM", "lstm_fwd", "lstm_bwd")
        flat.update(conv)
        from bert_vits2_tpu.compat.torch_import import _unflatten

        params = {"params": _unflatten(flat)}
        out_j = np.asarray(model.apply(params, jnp.asarray(x)))
        with torch.no_grad():
            out_t, _ = lstm(torch.from_numpy(x))
        np.testing.assert_allclose(out_j, out_t.numpy(), rtol=1e-5, atol=1e-5)
