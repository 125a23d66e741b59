"""JAX BERT/DeBERTa-v2 encoder parity vs transformers' torch implementations
(tiny random-weight models instantiated locally — no downloads), plus the
tensor-parallel partition specs on a virtual model-axis mesh."""

import numpy as np
import pytest
import torch

from bert_vits2_tpu.text.bert_jax import (
    BertEncoder,
    EncoderConfig,
    bert_partition_specs,
    import_torch_bert,
)

IDS = np.array([[2, 5, 7, 9, 11, 3]], np.int32)
MASK = np.ones_like(IDS)


def _torch_hidden(model, ids, mask):
    with torch.no_grad():
        out = model(
            torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            output_hidden_states=True,
        )
    return [h.numpy() for h in out.hidden_states]


class TestBertParity:
    def test_bert_matches_torch(self):
        from transformers import BertConfig, BertModel

        bc = BertConfig(
            vocab_size=100, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=40, type_vocab_size=2,
        )
        tm = BertModel(bc).eval()
        cfg = EncoderConfig.from_hf(bc)
        params = import_torch_bert(tm.state_dict(), cfg)
        hs_j = BertEncoder(cfg).apply({"params": params}, IDS, MASK)
        hs_t = _torch_hidden(tm, IDS, MASK)
        assert len(hs_j) == len(hs_t) == 3
        for a, b in zip(hs_t, hs_j):
            np.testing.assert_allclose(a, np.asarray(b), atol=2e-5)

    def test_deberta_v3_style_matches_torch(self):
        """share_att_key + buckets + norm_rel_ebd + conv (deberta-v3-large)."""
        from transformers import DebertaV2Config, DebertaV2Model

        dc = DebertaV2Config(
            vocab_size=100, hidden_size=32, num_hidden_layers=3,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=64, type_vocab_size=0,
            relative_attention=True, position_buckets=8,
            pos_att_type=["p2c", "c2p"], share_att_key=True,
            norm_rel_ebd="layer_norm", conv_kernel_size=3,
            position_biased_input=False,
        )
        dm = DebertaV2Model(dc).eval()
        cfg = EncoderConfig.from_hf(dc)
        params = import_torch_bert(dm.state_dict(), cfg)
        hs_j = BertEncoder(cfg).apply({"params": params}, IDS, MASK)
        hs_t = _torch_hidden(dm, IDS, MASK)
        for a, b in zip(hs_t, hs_j):
            np.testing.assert_allclose(a, np.asarray(b), atol=2e-5)

    def test_deberta_v2_style_matches_torch(self):
        """separate pos projections, no buckets, absolute pos biased input."""
        from transformers import DebertaV2Config, DebertaV2Model

        dc = DebertaV2Config(
            vocab_size=100, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
            max_position_embeddings=64, type_vocab_size=0,
            relative_attention=True, position_buckets=-1,
            max_relative_positions=32, pos_att_type=["p2c", "c2p"],
            share_att_key=False, norm_rel_ebd="none", conv_kernel_size=0,
            position_biased_input=True,
        )
        dm = DebertaV2Model(dc).eval()
        cfg = EncoderConfig.from_hf(dc)
        params = import_torch_bert(dm.state_dict(), cfg)
        hs_j = BertEncoder(cfg).apply({"params": params}, IDS, MASK)
        hs_t = _torch_hidden(dm, IDS, MASK)
        for a, b in zip(hs_t, hs_j):
            np.testing.assert_allclose(a, np.asarray(b), atol=2e-5)

    def test_padding_mask_invariance(self):
        """Padded positions must not change unpadded outputs (bucketing)."""
        from transformers import BertConfig, BertModel

        bc = BertConfig(
            vocab_size=100, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=40, type_vocab_size=2,
        )
        tm = BertModel(bc).eval()
        cfg = EncoderConfig.from_hf(bc)
        params = import_torch_bert(tm.state_dict(), cfg)
        enc = BertEncoder(cfg)
        out = np.asarray(enc.apply({"params": params}, IDS, MASK)[-1])
        ids_p = np.pad(IDS, ((0, 0), (0, 10)))
        mask_p = np.pad(MASK, ((0, 0), (0, 10)))
        out_p = np.asarray(enc.apply({"params": params}, ids_p, mask_p)[-1])
        np.testing.assert_allclose(out, out_p[:, : IDS.shape[1]], atol=1e-5)


class TestTensorParallel:
    def test_model_axis_sharding_matches_replicated(self):
        import jax
        from jax.sharding import Mesh, NamedSharding

        from transformers import DebertaV2Config, DebertaV2Model

        dc = DebertaV2Config(
            vocab_size=100, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=64, type_vocab_size=0,
            relative_attention=True, position_buckets=8,
            pos_att_type=["p2c", "c2p"], share_att_key=True,
            norm_rel_ebd="layer_norm", conv_kernel_size=0,
            position_biased_input=False,
        )
        dm = DebertaV2Model(dc).eval()
        cfg = EncoderConfig.from_hf(dc)
        params = import_torch_bert(dm.state_dict(), cfg)
        enc = BertEncoder(cfg)
        ref = np.asarray(enc.apply({"params": params}, IDS, MASK)[-3])

        devices = np.array(jax.devices()[:4]).reshape(1, 4)
        mesh = Mesh(devices, ("data", "model"))
        specs = bert_partition_specs(params)
        sharded = jax.tree.map(
            lambda x, s: jax.device_put(np.asarray(x), NamedSharding(mesh, s)),
            params,
            specs,
        )
        fn = jax.jit(lambda p, i, m: enc.apply({"params": p}, i, m)[-3])
        out = np.asarray(fn(sharded, IDS, MASK))
        np.testing.assert_allclose(ref, out, atol=2e-5)
