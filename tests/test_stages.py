"""Stage decomposition (reference ONNX split) tests: the 6-stage pipeline
must reproduce Synthesizer.infer, and stages must round-trip through
StableHLO serialization (jax.export)."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny():
    import jax
    import jax.numpy as jnp

    from bert_vits2_tpu.models import ModelConfig, Synthesizer

    cfg = ModelConfig(
        n_vocab=40, bert_dim=16, spec_channels=33, segment_size=8,
        inter_channels=8, hidden_channels=8, filter_channels=16, n_heads=2,
        n_layers=2, resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
        upsample_rates=(4, 4), upsample_initial_channel=16,
        upsample_kernel_sizes=(8, 8), n_speakers=4, gin_channels=8,
        n_layers_trans_flow=2,
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
        jnp.zeros((b, t_x), jnp.int32), bert, bert, bert, deterministic=True,
    )["params"]
    rng = np.random.default_rng(0)
    inputs = dict(
        x=jnp.asarray(rng.integers(1, cfg.n_vocab, (b, t_x)), jnp.int32),
        x_lengths=jnp.asarray([t_x]),
        sid=jnp.asarray([1]),
        tone=jnp.asarray(rng.integers(0, 12, (b, t_x)), jnp.int32),
        language=jnp.asarray(rng.integers(0, 3, (b, t_x)), jnp.int32),
        bert=jnp.asarray(rng.normal(size=(b, t_x, 16)), jnp.float32),
        ja_bert=jnp.asarray(rng.normal(size=(b, t_x, 16)), jnp.float32),
        en_bert=jnp.asarray(rng.normal(size=(b, t_x, 16)), jnp.float32),
    )
    return model, params, inputs


class TestStages:
    def test_pipeline_matches_monolithic_infer(self, tiny):
        import jax

        from bert_vits2_tpu.compat.stages import make_stages, run_stages
        from bert_vits2_tpu.models import Synthesizer

        model, params, inp = tiny
        max_frames = 64
        # deterministic settings: noise_scale=0 kills the prior sample,
        # sdp_ratio=0 ignores the stochastic duration branch
        wave_ref, _, _, ylen_ref = model.apply(
            {"params": params}, inp["x"], inp["x_lengths"], inp["sid"],
            inp["tone"], inp["language"], inp["bert"], inp["ja_bert"],
            inp["en_bert"], max_frames, noise_scale=0.0, sdp_ratio=0.0,
            noise_scale_w=0.0, method=Synthesizer.infer,
            rngs={"noise": jax.random.key(5)},
        )
        stages = make_stages(model, params)
        wave, ylen = run_stages(
            stages, inp["x"], inp["x_lengths"], inp["sid"], inp["tone"],
            inp["language"], inp["bert"], inp["ja_bert"], inp["en_bert"],
            max_frames, noise_scale=0.0, sdp_ratio=0.0, noise_scale_w=0.0,
        )
        assert int(ylen[0]) == int(ylen_ref[0])
        np.testing.assert_allclose(
            np.asarray(wave_ref), np.asarray(wave), atol=1e-5
        )

    def test_stablehlo_export_roundtrip(self, tiny, tmp_path):
        import jax
        import jax.numpy as jnp
        from jax import export as jexport

        from bert_vits2_tpu.compat.stages import export_stages, make_stages

        model, params, inp = tiny
        paths = export_stages(
            model, params, str(tmp_path), t_x=8, max_frames=64, batch=1
        )
        assert set(paths) == {"emb", "enc_p", "sdp", "dp", "flow", "dec"}
        assert os.path.isfile(tmp_path / "manifest.json")

        with open(paths["dp"], "rb") as f:
            restored = jexport.deserialize(f.read())
        stages = make_stages(model, params)
        g = stages["emb"](inp["sid"])
        x_h, m_p, logs_p, x_mask = stages["enc_p"](
            inp["x"], inp["x_lengths"], inp["tone"], inp["language"],
            inp["bert"], inp["ja_bert"], inp["en_bert"], g,
        )
        ref = stages["dp"](x_h, x_mask, g)
        got = restored.call(x_h, x_mask, g)
        np.testing.assert_allclose(
            np.asarray(ref), np.asarray(got), atol=1e-6
        )
