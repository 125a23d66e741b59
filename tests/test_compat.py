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


class TestOldVersionBackCompat:
    def test_missing_bert_proj_zeroed(self, tmp_path):
        """Old-version checkpoints (no en_bert_proj / ja_bert_proj) must zero
        those projections like the reference (utils.py:90-109), not leave
        random init."""
        import jax
        import jax.numpy as jnp
        import torch

        from bert_vits2_tpu.compat import import_generator_checkpoint
        from bert_vits2_tpu.models import ModelConfig, Synthesizer

        cfg = ModelConfig(
            n_vocab=20, bert_dim=16, spec_channels=33, segment_size=8,
            inter_channels=8, hidden_channels=8, filter_channels=16,
            n_heads=2, n_layers=1, resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3),), upsample_rates=(4, 4),
            upsample_initial_channel=16, upsample_kernel_sizes=(8, 8),
            n_speakers=2, gin_channels=8, n_layers_trans_flow=1,
        )
        model = Synthesizer(cfg)
        b, t_x = 1, 8
        rngs = {"params": jax.random.key(0), "noise": jax.random.key(1),
                "dropout": jax.random.key(2)}
        bert = jnp.zeros((b, t_x, cfg.bert_dim))
        params = model.init(
            rngs, jnp.zeros((b, t_x), jnp.int32), jnp.asarray([t_x]),
            jnp.zeros((b, 16, cfg.spec_channels)), jnp.asarray([16]),
            jnp.zeros((b,), jnp.int32), jnp.zeros((b, t_x), jnp.int32),
            jnp.zeros((b, t_x), jnp.int32), bert, bert, bert,
            deterministic=True,
        )["params"]

        path = tmp_path / "G_100.pth"
        torch.save({"model": {}, "iteration": 7, "optimizer": None,
                    "learning_rate": 1e-4}, path)
        out, it, report = import_generator_checkpoint(
            str(path), params, strict=False
        )
        assert it == 7
        assert report.get("zeroed"), "bert projections should be zeroed"
        flat_keys = " ".join(report["zeroed"])
        assert "bert_proj" in flat_keys

        def leaves_with(tree, name, prefix=""):
            for k, v in tree.items():
                p = f"{prefix}/{k}"
                if isinstance(v, dict):
                    yield from leaves_with(v, name, p)
                elif name in p:
                    yield p, v

        found = list(leaves_with(out["enc_p"], "bert_proj"))
        assert found
        for p, v in found:
            assert float(np.abs(np.asarray(v)).max()) == 0.0, p
