"""SLM (WavLM) path: parity vs transformers' torch WavLM, the sinc
resampler, and the full SLM adversarial losses wired through the fused
train step (reference: losses.py:63-153)."""

import numpy as np
import pytest
import torch

from bert_vits2_tpu.models.slm import (
    WavLMConfig,
    WavLMJax,
    import_torch_wavlm,
    make_resampler,
    make_slm_fns,
)

TINY_HF_KW = dict(
    hidden_size=32, num_hidden_layers=3, num_attention_heads=4,
    intermediate_size=64, conv_dim=[16, 16], conv_kernel=[10, 3],
    conv_stride=[5, 2], conv_bias=False, feat_extract_norm="group",
    num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
    num_buckets=32, max_bucket_distance=50, do_stable_layer_norm=False,
    mask_time_prob=0.0, mask_feature_prob=0.0, layerdrop=0.0,
)


@pytest.fixture(scope="module")
def tiny_wavlm():
    from transformers import WavLMConfig as HFWavLMConfig, WavLMModel

    hc = HFWavLMConfig(**TINY_HF_KW)
    tm = WavLMModel(hc).eval()
    cfg = WavLMConfig.from_hf(hc)
    params = import_torch_wavlm(tm.state_dict(), cfg)
    return tm, cfg, params


class TestWavLMParity:
    def test_hidden_states_match_torch(self, tiny_wavlm):
        tm, cfg, params = tiny_wavlm
        rng = np.random.default_rng(0)
        wave = rng.normal(size=(2, 800)).astype(np.float32) * 0.1
        with torch.no_grad():
            out = tm(torch.tensor(wave), output_hidden_states=True)
        hs_t = [h.numpy() for h in out.hidden_states]
        hs_j = WavLMJax(cfg).apply({"params": params}, wave)
        assert len(hs_t) == len(hs_j) == cfg.num_layers + 1
        for a, b in zip(hs_t, hs_j):
            np.testing.assert_allclose(a, np.asarray(b), atol=2e-5)


class TestResampler:
    def test_sine_preserved(self):
        sr1, sr2 = 44100, 16000
        t = np.arange(sr1 // 2) / sr1
        x = np.sin(2 * np.pi * 440 * t).astype(np.float32)[None]
        y = np.asarray(make_resampler(sr1, sr2)(x))
        assert y.shape[1] == int(np.ceil(x.shape[1] * sr2 / sr1))
        t2 = np.arange(y.shape[1]) / sr2
        ref = np.sin(2 * np.pi * 440 * t2)
        assert np.abs(y[0, 100:-100] - ref[100:-100]).max() < 1e-3

    def test_identity_rate(self):
        # band-limited input: identical rates are near-identity (the 0.99
        # rolloff lowpass only touches the top 1% of the band)
        t = np.arange(2000) / 16000
        x = np.sin(2 * np.pi * 440 * t).astype(np.float32)[None]
        y = np.asarray(make_resampler(16000, 16000)(x))
        assert y.shape == x.shape
        assert np.abs(y[0, 20:-20] - x[0, 20:-20]).max() < 1e-3


class TestSLMTrainStep:
    def test_wavlm_disc_losses_in_fused_step(self, tiny_wavlm):
        import jax
        import jax.numpy as jnp

        from bert_vits2_tpu.models import WavLMDiscriminator
        from bert_vits2_tpu.train import (
            Models,
            TrainConfig,
            init_train_state,
            make_train_step,
        )
        from tests.test_train import TINY, TINY_DATA, _make_batch

        from bert_vits2_tpu.models import (
            MultiPeriodDiscriminator,
            Synthesizer,
        )

        _tm, wl_cfg, wl_params = tiny_wavlm
        slm_embed, slm_feature_fn = make_slm_fns(
            wl_params, wl_cfg, input_sr=TINY_DATA.sampling_rate,
            model_sr=TINY_DATA.sampling_rate,
        )

        synth = Synthesizer(TINY)
        mpd = MultiPeriodDiscriminator(
            periods=(2,), p_channels=(8, 16),
            s_specs=((8, 15, 1, 1, 7), (16, 5, 1, 1, 2)),
        )
        wd = WavLMDiscriminator(
            slm_hidden=wl_cfg.hidden_size, slm_layers=wl_cfg.num_layers + 1,
            initial_channel=8,
        )
        models = Models(synth, mpd, None, wd)
        batch = _make_batch(b=2, t_y=16)
        rngs = {"params": jax.random.key(0), "noise": jax.random.key(1),
                "dropout": jax.random.key(2)}
        params_g = synth.init(
            rngs, batch["x"], batch["x_lengths"], batch["spec"],
            batch["spec_lengths"], batch["sid"], batch["tone"],
            batch["language"], batch["bert"], batch["ja_bert"],
            batch["en_bert"], deterministic=True,
        )["params"]
        wav = batch["wave"][:, : TINY.segment_samples]
        params_d = mpd.init(jax.random.key(3), wav, wav)["params"]
        emb = slm_embed(slm_embed.params, wav)
        params_wd = wd.init(jax.random.key(4), emb)["params"]

        cfg = TrainConfig(learning_rate=1e-4)
        state = init_train_state(models, cfg, params_g, params_d, None,
                                 params_wd, params_slm=slm_embed.params)
        step = make_train_step(
            models, cfg, TINY_DATA, TINY.segment_size,
            slm_embed=slm_embed, slm_feature_fn=slm_feature_fn, donate=False,
        )
        s1, m = step(state, batch, jax.random.key(9), jnp.float32(1e-4))
        for key in ("loss/wd/total", "loss/g/lm", "loss/g/lm_gen"):
            assert key in m and np.isfinite(float(np.asarray(m[key]))), key
        # wavlm discriminator actually updated
        diff = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            state.params_wd, s1.params_wd,
        )
        assert max(jax.tree.leaves(diff)) > 0
