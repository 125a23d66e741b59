"""Old-version family support (reference: infer.py:39-104 router, oldVersion/).

Covers: version-string routing, the V1.0.x symbol table, inference-mode
vector quantization (V2.1's 10-code VQ, V2.2's 32-head CLAP VQ), emotion
state-dict import (vector_quantize_pytorch layouts, torch nn.LayerNorm),
version-aware get_text fills, and tiny end-to-end synthesis per family.
"""

import numpy as np
import pytest

from bert_vits2_tpu.compat.versions import (
    V101_SYMBOLS,
    VERSION_TO_FAMILY,
    spec_for,
)
from bert_vits2_tpu.text.symbols import SYMBOLS


class TestVersionSpecs:
    def test_router(self):
        # every version string the reference router knows (infer.py:42-70)
        for v, fam in [
            ("2.3", "2.3"), ("2.2", "2.2"), ("2.1", "2.1"),
            ("2.0.2-fix", "2.0"), ("2.0.1", "2.0"), ("2.0", "2.0"),
            ("1.1.1-fix", "1.1"), ("1.1.1", "1.1"), ("1.1", "1.1"),
            ("1.1.0", "1.1"), ("1.0.1", "1.0"), ("1.0", "1.0"),
            ("1.0.0", "1.0"), (None, "2.3"), ("9.9", "2.3"),
        ]:
            assert spec_for(v).family == fam, v

    def test_v101_symbols(self):
        # oldVersion/V101/text/symbols.py: 108 entries, I/U/cl instead of
        # the julius long-vowel forms
        assert len(V101_SYMBOLS) == 108
        assert V101_SYMBOLS[0] == "_"
        for s in ("I", "U", "cl"):
            assert s in V101_SYMBOLS
        for s in ("a:", "e:", "i:", "o:", "u:", "ty", "zy"):
            assert s not in V101_SYMBOLS
        # 1.1+ tables are identical to the current inventory
        assert list(spec_for("1.1").symbols) == SYMBOLS
        assert list(spec_for("2.1").symbols) == SYMBOLS

    def test_tone_offsets(self):
        # V1.x: 11 tones, EN starts at 7; V2.x: 12 tones, EN starts at 8
        assert spec_for("1.1").num_tones == 11
        assert spec_for("1.1").tone_start == {"ZH": 0, "JP": 6, "EN": 7}
        assert spec_for("2.0").num_tones == 12
        assert spec_for("2.0").tone_start == {"ZH": 0, "JP": 6, "EN": 8}

    def test_model_overrides(self):
        o = spec_for("1.1").model_overrides()
        assert o == dict(n_vocab=112, num_tones=11, use_ja_bert=True,
                         use_en_bert=False, ja_bert_dim=768, emotion="none")
        assert spec_for("2.2").model_overrides()["emotion"] == "clap220"
        assert spec_for("1.0").model_overrides() == dict(
            n_vocab=108, num_tones=11, use_ja_bert=False, use_en_bert=False,
            ja_bert_dim=1024, emotion="none")

    def test_unknown_phone_maps_to_unk(self):
        spec = spec_for("1.0")
        phones, tones, langs = spec.cleaned_text_to_sequence(
            ["a:", "b", "cl"], [0, 1, 0], "ZH"
        )
        s2i = spec.symbol_to_id
        assert phones == [s2i["UNK"], s2i["b"], s2i["cl"]]
        assert tones == [0, 1, 0] and langs == [0, 0, 0]


class TestVectorQuantizer:
    def _nearest_np(self, x, codebook):
        # x [n, h, d], codebook [h, size, d]
        d = ((x[:, :, None, :] - codebook[None]) ** 2).sum(-1)
        idx = d.argmin(-1)  # [n, h]
        return np.take_along_axis(
            np.broadcast_to(codebook, (x.shape[0],) + codebook.shape),
            idx[..., None, None], axis=-2,
        )[..., 0, :]

    def test_single_head_nearest(self):
        import jax

        from bert_vits2_tpu.nn.vq import VectorQuantizer

        vq = VectorQuantizer(8, 5)
        rng = np.random.default_rng(0)
        x = rng.normal(size=(4, 8)).astype(np.float32)
        params = vq.init(jax.random.key(0), x)
        q = np.asarray(vq.apply(params, x))
        cb = np.asarray(params["params"]["codebook"])  # [1, 5, 8]
        expected = self._nearest_np(x[:, None, :], cb)[:, 0, :]
        np.testing.assert_allclose(q, expected, rtol=1e-6)

    def test_single_head_lookup(self):
        import jax

        from bert_vits2_tpu.nn.vq import VectorQuantizer

        vq = VectorQuantizer(8, 5)
        x = np.zeros((2, 8), np.float32)
        params = vq.init(jax.random.key(1), x)
        cb = np.asarray(params["params"]["codebook"])
        idx = np.array([3, 0])
        out = np.asarray(vq.apply(params, idx, method=VectorQuantizer.lookup))
        np.testing.assert_allclose(out, cb[0][idx], rtol=1e-6)

    def test_multi_head_projected(self):
        import jax

        from bert_vits2_tpu.nn.vq import VectorQuantizer

        # V220 shape: dim 512 -> 32 heads x 64 codes x 32 dims
        vq = VectorQuantizer(16, 6, codebook_dim=4, heads=3)
        rng = np.random.default_rng(2)
        x = rng.normal(size=(2, 16)).astype(np.float32)
        params = vq.init(jax.random.key(2), x)
        q = np.asarray(vq.apply(params, x))
        assert q.shape == (2, 16)
        p = params["params"]
        y = x @ np.asarray(p["project_in"]["kernel"]) + np.asarray(
            p["project_in"]["bias"]
        )
        y = y.reshape(2, 3, 4)
        qq = self._nearest_np(y, np.asarray(p["codebook"])).reshape(2, 12)
        expected = qq @ np.asarray(p["project_out"]["kernel"]) + np.asarray(
            p["project_out"]["bias"]
        )
        np.testing.assert_allclose(q, expected, rtol=1e-5, atol=1e-6)


class TestEmotionImport:
    def test_v210_emotion_keys_convert(self):
        import jax

        from bert_vits2_tpu.compat.torch_import import (
            convert_state_dict,
            synthesizer_rename,
        )
        from bert_vits2_tpu.models.text_encoder import TextEncoder

        enc = TextEncoder(16, 8, 8, 16, 2, 1, 3, 0.0, emotion="vq210")
        x = np.zeros((1, 6), np.int32)
        params = enc.init(
            {"params": jax.random.key(0)},
            x, np.array([6]), x, x,
            np.zeros((1, 6, 1024), np.float32),
            np.zeros((1, 6, 1024), np.float32),
            np.zeros((1, 6, 1024), np.float32),
            emo=np.zeros((1, 1024), np.float32),
        )
        rng = np.random.default_rng(3)
        sd = {
            "emo_proj.weight": rng.normal(size=(1024, 1024)).astype(np.float32),
            "emo_proj.bias": rng.normal(size=(1024,)).astype(np.float32),
            "emo_quantizer._codebook.embed": rng.normal(
                size=(1, 10, 1024)).astype(np.float32),
            "emo_quantizer._codebook.initted": np.ones((1,), np.float32),
            "emo_quantizer._codebook.cluster_size": np.ones((1, 10), np.float32),
            "emo_quantizer._codebook.embed_avg": rng.normal(
                size=(1, 10, 1024)).astype(np.float32),
            "emo_q_proj.weight": rng.normal(size=(8, 1024)).astype(np.float32),
            "emo_q_proj.bias": rng.normal(size=(8,)).astype(np.float32),
        }
        # drop EMA buffers the way import_generator_checkpoint does
        _VQ_BUFFERS = (".initted", ".cluster_size", ".embed_avg")
        sd = {k: v for k, v in sd.items()
              if not ("_codebook" in k and k.endswith(_VQ_BUFFERS))}
        converted, report = convert_state_dict(
            sd, params, rename=synthesizer_rename, strict=False
        )
        assert not report["unmatched"], report["unmatched"]
        p = converted["params"]
        np.testing.assert_array_equal(
            p["emo_quantizer"]["codebook"], sd["emo_quantizer._codebook.embed"]
        )
        np.testing.assert_array_equal(
            p["emo_proj"]["kernel"], sd["emo_proj.weight"].T
        )

    def test_v220_emotion_keys_convert(self):
        import jax

        from bert_vits2_tpu.compat.torch_import import (
            convert_state_dict,
            synthesizer_rename,
        )
        from bert_vits2_tpu.models.text_encoder import TextEncoder

        enc = TextEncoder(16, 8, 8, 16, 2, 1, 3, 0.0, emotion="clap220")
        x = np.zeros((1, 6), np.int32)
        params = enc.init(
            {"params": jax.random.key(0)},
            x, np.array([6]), x, x,
            np.zeros((1, 6, 1024), np.float32),
            np.zeros((1, 6, 1024), np.float32),
            np.zeros((1, 6, 1024), np.float32),
            emo=np.zeros((1, 512), np.float32),
        )
        rng = np.random.default_rng(4)
        sd = {
            "in_feature_net.0.weight": rng.normal(size=(1028, 512)).astype(np.float32),
            "in_feature_net.2.weight": rng.normal(size=(1028,)).astype(np.float32),
            "in_feature_net.2.bias": rng.normal(size=(1028,)).astype(np.float32),
            "in_feature_net.3.norm.weight": rng.normal(size=(1028,)).astype(np.float32),
            "in_feature_net.3.norm.bias": rng.normal(size=(1028,)).astype(np.float32),
            "in_feature_net.3.mlp.c_fc1.weight": rng.normal(size=(512, 1028)).astype(np.float32),
            "in_feature_net.3.mlp.c_fc2.weight": rng.normal(size=(512, 1028)).astype(np.float32),
            "in_feature_net.3.mlp.c_proj.weight": rng.normal(size=(1028, 512)).astype(np.float32),
            "in_feature_net.4.weight": rng.normal(size=(512, 1028)).astype(np.float32),
            "emo_vq.project_in.weight": rng.normal(size=(1024, 512)).astype(np.float32),
            "emo_vq.project_in.bias": rng.normal(size=(1024,)).astype(np.float32),
            "emo_vq.project_out.weight": rng.normal(size=(512, 1024)).astype(np.float32),
            "emo_vq.project_out.bias": rng.normal(size=(512,)).astype(np.float32),
            "emo_vq._codebook.embed": rng.normal(size=(32, 64, 32)).astype(np.float32),
            "out_feature_net.weight": rng.normal(size=(8, 512)).astype(np.float32),
            "out_feature_net.bias": rng.normal(size=(8,)).astype(np.float32),
        }
        converted, report = convert_state_dict(
            sd, params, rename=synthesizer_rename, strict=False
        )
        assert not report["unmatched"], report["unmatched"]
        p = converted["params"]
        # torch nn.LayerNorm weight -> flax scale
        np.testing.assert_array_equal(
            p["in_feature_net_2"]["scale"], sd["in_feature_net.2.weight"]
        )
        np.testing.assert_array_equal(
            p["in_feature_net_3"]["mlp_c_fc1"]["kernel"],
            sd["in_feature_net.3.mlp.c_fc1.weight"].T,
        )
        np.testing.assert_array_equal(
            p["emo_vq"]["codebook"], sd["emo_vq._codebook.embed"]
        )


class TestVersionedGetText:
    def test_old_versions_zero_fill(self):
        from bert_vits2_tpu.infer.api import get_text

        spec = spec_for("2.0")
        out = get_text("hello world", "EN", spec=spec)
        phones, tones, langs, bert, ja_bert, en_bert = out
        assert bert.shape[1] == 1024 and not bert.any()  # ZH inactive -> zeros
        assert ja_bert.shape[1] == 1024 and not ja_bert.any()
        assert en_bert.any()  # active language gets features

    def test_v11_ja_bert_width(self):
        from bert_vits2_tpu.infer.api import get_text

        out = get_text("你好", "ZH", spec=spec_for("1.1"))
        assert out[4].shape[1] == 768  # ja_bert is 768-d on 1.1.x

    def test_language_gating(self):
        from bert_vits2_tpu.infer.api import get_text

        with pytest.raises(ValueError):
            get_text("hello", "EN", spec=spec_for("1.0"))


class TestEndToEndFamilies:
    TINY = dict(
        inter_channels=32, hidden_channels=32, filter_channels=64, n_heads=2,
        n_layers=2, n_layers_trans_flow=2, upsample_rates=(4, 4),
        upsample_initial_channel=32, upsample_kernel_sizes=(8, 8),
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
        spec_channels=33, segment_size=8, n_speakers=4, gin_channels=16,
    )

    @pytest.mark.parametrize("version", ["1.0", "1.1", "2.1", "2.2"])
    def test_synthesize(self, version):
        from bert_vits2_tpu.infer.api import TTSEngine
        from bert_vits2_tpu.infer.loader import _materialize
        from bert_vits2_tpu.models import ModelConfig, Synthesizer

        spec = spec_for(version)
        cfg = ModelConfig(**self.TINY, **spec.model_overrides())
        synth = Synthesizer(cfg)
        params = _materialize(0, synth, cfg)
        eng = TTSEngine(
            synth, {"params": params}, version_spec=spec,
            text_buckets=(32,), frames_per_token=4, frame_multiple=32,
        )
        kw = {"emotion": 3} if spec.emotion == "vq210" else {}
        wave = eng.infer("你好", speaker=1, language="ZH", **kw)
        assert wave.ndim == 1 and wave.size > 0 and np.isfinite(wave).all()
