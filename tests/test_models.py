"""L2 model tests on a tiny config (fast CPU compiles)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bert_vits2_tpu.models import (
    DurationDiscriminator,
    Generator,
    ModelConfig,
    MultiPeriodDiscriminator,
    Synthesizer,
    WavLMDiscriminator,
)

TINY = ModelConfig(
    n_vocab=20,
    num_tones=12,
    num_languages=3,
    bert_dim=16,
    spec_channels=33,
    segment_size=8,
    inter_channels=8,
    hidden_channels=8,
    filter_channels=16,
    n_heads=2,
    n_layers=2,
    kernel_size=3,
    p_dropout=0.1,
    resblock="1",
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),),
    upsample_rates=(4, 4),
    upsample_initial_channel=16,
    upsample_kernel_sizes=(8, 8),
    n_speakers=4,
    gin_channels=8,
    n_layers_trans_flow=2,
)


def _batch(cfg, b=2, t_x=11, t_y=40, seed=0):
    rng = np.random.default_rng(seed)
    hop = cfg.hop_length
    return dict(
        x=jnp.asarray(rng.integers(1, cfg.n_vocab, (b, t_x))),
        x_lengths=jnp.asarray([t_x, t_x - 3]),
        y=jnp.asarray(rng.normal(size=(b, t_y, cfg.spec_channels)), jnp.float32),
        y_lengths=jnp.asarray([t_y, t_y - 10]),
        sid=jnp.asarray([0, 2]),
        tone=jnp.asarray(rng.integers(0, cfg.num_tones, (b, t_x))),
        language=jnp.asarray(rng.integers(0, cfg.num_languages, (b, t_x))),
        bert=jnp.asarray(rng.normal(size=(b, t_x, cfg.bert_dim)), jnp.float32),
        ja_bert=jnp.asarray(rng.normal(size=(b, t_x, cfg.bert_dim)), jnp.float32),
        en_bert=jnp.asarray(rng.normal(size=(b, t_x, cfg.bert_dim)), jnp.float32),
    ), hop


class TestSynthesizer:
    @pytest.fixture(scope="class")
    def model_and_params(self):
        model = Synthesizer(TINY)
        batch, hop = _batch(TINY)
        rngs = {"params": jax.random.key(0), "noise": jax.random.key(1),
                "dropout": jax.random.key(2)}
        params = model.init(rngs, **batch, deterministic=True)
        return model, params, batch, hop

    def test_train_forward_shapes(self, model_and_params):
        model, params, batch, hop = model_and_params
        out = model.apply(
            params, **batch, deterministic=True,
            rngs={"noise": jax.random.key(3)},
        )
        b, t_y = 2, batch["y"].shape[1]
        t_x = batch["x"].shape[1]
        assert out["wave_slice"].shape == (b, TINY.segment_size * hop)
        assert out["attn"].shape == (b, t_y, t_x)
        assert out["l_length"].shape == (b,)
        assert out["m_p"].shape == (b, t_y, TINY.inter_channels)
        assert np.isfinite(np.asarray(out["wave_slice"])).all()
        assert np.isfinite(np.asarray(out["l_length"])).all()
        # attn is a valid path within masks
        attn = np.asarray(out["attn"])
        ymask = np.asarray(out["y_mask"])
        assert (attn.sum(-1) == ymask).all()

    def test_infer_shapes(self, model_and_params):
        model, params, batch, hop = model_and_params
        max_frames = 64
        wave, attn, y_mask, y_lengths = model.apply(
            params,
            batch["x"],
            batch["x_lengths"],
            batch["sid"],
            batch["tone"],
            batch["language"],
            batch["bert"],
            batch["ja_bert"],
            batch["en_bert"],
            max_frames,
            method=Synthesizer.infer,
            rngs={"noise": jax.random.key(4)},
        )
        assert wave.shape == (2, max_frames * hop)
        assert np.isfinite(np.asarray(wave)).all()
        assert (np.asarray(y_lengths) >= 1).all()
        # wave is silent beyond y_lengths*hop? (dec of masked z need not be 0,
        # but y_mask must reflect y_lengths)
        np.testing.assert_array_equal(
            np.asarray(y_mask).sum(-1), np.asarray(y_lengths)
        )

    def test_infer_jit_compiles(self, model_and_params):
        model, params, batch, hop = model_and_params

        @jax.jit
        def synth(params, batch, rng):
            return model.apply(
                params,
                batch["x"],
                batch["x_lengths"],
                batch["sid"],
                batch["tone"],
                batch["language"],
                batch["bert"],
                batch["ja_bert"],
                batch["en_bert"],
                64,
                method=Synthesizer.infer,
                rngs={"noise": rng},
            )[0]

        w1 = synth(params, batch, jax.random.key(0))
        w2 = synth(params, batch, jax.random.key(0))
        np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=1e-6)


class TestDiscriminators:
    def test_mpd(self):
        mpd = MultiPeriodDiscriminator(periods=(2, 3))
        y = jnp.asarray(np.random.default_rng(0).normal(size=(2, 256)), jnp.float32)
        yh = jnp.asarray(np.random.default_rng(1).normal(size=(2, 256)), jnp.float32)
        params = mpd.init(jax.random.key(0), y, yh)
        r, g, fr, fg = mpd.apply(params, y, yh)
        assert len(r) == 3 and len(g) == 3
        assert all(np.isfinite(np.asarray(t)).all() for t in r + g)
        assert len(fr[0]) == 7  # DiscriminatorS: 6 convs + post

    def test_duration_discriminator(self):
        dd = DurationDiscriminator(in_channels=8, filter_channels=16, kernel_size=3,
                                   p_dropout=0.1, gin_channels=4)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 7, 8)), jnp.float32)
        mask = jnp.ones((2, 7))
        dur = jnp.abs(jnp.asarray(np.random.default_rng(1).normal(size=(2, 7, 1)), jnp.float32))
        g = jnp.ones((2, 4))
        params = dd.init(jax.random.key(0), x, mask, dur, dur, g=g)
        probs = dd.apply(params, x, mask, dur, dur * 2, g=g)
        assert len(probs) == 2
        for p in probs:
            p = np.asarray(p)
            assert p.shape == (2, 7, 1)
            assert ((p >= 0) & (p <= 1)).all()

    def test_wavlm_discriminator(self):
        wd = WavLMDiscriminator(slm_hidden=8, slm_layers=3, initial_channel=4)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 10, 24)), jnp.float32)
        params = wd.init(jax.random.key(0), x)
        out = wd.apply(params, x)
        assert out.shape[0] == 2


class TestGenerator:
    def test_upsampling_factor(self):
        gen = Generator(
            initial_channel=8,
            resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3),),
            upsample_rates=(4, 4),
            upsample_initial_channel=16,
            upsample_kernel_sizes=(8, 8),
            gin_channels=4,
        )
        x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 12, 8)), jnp.float32)
        g = jnp.ones((1, 4))
        params = gen.init(jax.random.key(0), x, g=g)
        wave = gen.apply(params, x, g=g)
        assert wave.shape == (1, 12 * 16)
        w = np.asarray(wave)
        assert np.isfinite(w).all() and (np.abs(w) <= 1).all()
