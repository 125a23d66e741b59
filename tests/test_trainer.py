"""End-to-end trainer test: synthetic filelist dataset -> Trainer.run for a
few steps -> checkpoint save -> resume (reference behavior: train_ms.py
run/train_and_evaluate + utils checkpoint round-trip)."""

import json
import os

import numpy as np
import pytest

from bert_vits2_tpu.models import (
    DurationDiscriminator,
    ModelConfig,
    MultiPeriodDiscriminator,
    Synthesizer,
)
from bert_vits2_tpu.train import Models

SR = 1600
HOP = 16
N_FFT = 64
BERT_DIM = 16

TINY_MODEL_JSON = dict(
    bert_dim=BERT_DIM,
    n_vocab=112,
    inter_channels=8,
    hidden_channels=8,
    filter_channels=16,
    n_heads=2,
    n_layers=2,
    kernel_size=3,
    p_dropout=0.1,
    resblock="1",
    resblock_kernel_sizes=[3],
    resblock_dilation_sizes=[[1, 3]],
    upsample_rates=[4, 4],
    upsample_initial_channel=16,
    upsample_kernel_sizes=[8, 8],
    gin_channels=8,
    n_layers_trans_flow=2,
    use_spk_conditioned_encoder=True,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """4 synthetic utterances + filelist + tiny config.json."""
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    rows = []
    phones = ["n", "i", "h", "ao"]
    tones = "0 0 0 0"
    word2ph = "2 2"
    for i in range(4):
        wav_path = str(root / f"utt{i}.wav")
        n = SR + 256 * i  # ~100+ spec frames at hop 16
        audio = (rng.uniform(-0.3, 0.3, n) * 32767).astype(np.int16)
        from scipy.io import wavfile

        wavfile.write(wav_path, SR, audio)
        t_ph = len(phones) * 2 + 1  # after add_blank
        np.save(
            wav_path.replace(".wav", ".bert.npy"),
            rng.normal(size=(t_ph, BERT_DIM)).astype(np.float32),
        )
        rows.append(f"{wav_path}|spk0|ZH|nihao|{' '.join(phones)}|{tones}|{word2ph}")

    filelist = root / "train.list"
    filelist.write_text("\n".join(rows), encoding="utf-8")

    config = dict(
        version="2.3",
        train=dict(
            log_interval=1,
            eval_interval=1000,
            seed=7,
            epochs=2,
            learning_rate=1e-4,
            betas=[0.8, 0.99],
            eps=1e-9,
            batch_size=2,
            bf16_run=False,
            lr_decay=0.999,
            segment_size=8 * HOP,
            c_mel=45,
            c_kl=1.0,
        ),
        data=dict(
            training_files=str(filelist),
            validation_files=str(filelist),
            sampling_rate=SR,
            filter_length=N_FFT,
            hop_length=HOP,
            win_length=N_FFT,
            n_mel_channels=16,
            mel_fmin=0.0,
            mel_fmax=None,
            add_blank=True,
            n_speakers=4,
            spk2id=dict(spk0=0),
        ),
        model=TINY_MODEL_JSON,
    )
    cfg_path = root / "config.json"
    cfg_path.write_text(json.dumps(config), encoding="utf-8")
    return root, str(cfg_path)


def _tiny_models(mcfg: ModelConfig) -> Models:
    synth = Synthesizer(mcfg)
    mpd = MultiPeriodDiscriminator(
        periods=(2, 3),
        p_channels=(8, 16),
        s_specs=((8, 15, 1, 1, 7), (16, 41, 4, 4, 20), (16, 5, 1, 1, 2)),
    )
    dd = DurationDiscriminator(
        in_channels=mcfg.hidden_channels, filter_channels=16, kernel_size=3,
        p_dropout=0.1, gin_channels=mcfg.gin_channels,
    )
    return Models(synth, mpd, dd, None)


class TestTrainer:
    def test_run_and_resume(self, corpus, tmp_path):
        from bert_vits2_tpu.compat.hparams import (
            get_hparams_from_file,
            model_config_from_hparams,
        )
        from bert_vits2_tpu.train.trainer import Trainer

        root, cfg_path = corpus
        model_dir = str(tmp_path / "run1")
        mcfg = model_config_from_hparams(get_hparams_from_file(cfg_path))
        assert mcfg.bert_dim == BERT_DIM
        trainer = Trainer(
            cfg_path, model_dir, models=_tiny_models(mcfg), use_dur_disc=True
        )
        assert trainer.mcfg.spec_channels == N_FFT // 2 + 1

        trainer.run(epochs=10, max_steps=2, log_interval=1, eval_interval=1000)
        assert trainer.global_step == 2
        assert os.path.isdir(trainer.ckpt_dir)

        # resume picks up where we left off
        trainer2 = Trainer(
            cfg_path, model_dir, models=_tiny_models(mcfg), use_dur_disc=True
        )
        assert trainer2.global_step == 2
        g1 = np.asarray(
            trainer.state.params_g["enc_p"]["emb"]["embedding"]
        )
        g2 = np.asarray(trainer2.state.params_g["enc_p"]["emb"]["embedding"])
        np.testing.assert_allclose(g1, g2, atol=0, rtol=0)

    def test_evaluate_writes_nothing_without_writer(self, corpus, tmp_path):
        # evaluate() is a no-op graph-wise without TB, but must synthesize
        from bert_vits2_tpu.compat.hparams import (
            get_hparams_from_file,
            model_config_from_hparams,
        )
        from bert_vits2_tpu.train.trainer import Trainer

        root, cfg_path = corpus
        mcfg = model_config_from_hparams(get_hparams_from_file(cfg_path))
        model_dir = str(tmp_path / "run2")
        trainer = Trainer(cfg_path, model_dir, models=_tiny_models(mcfg))
        trainer.evaluate(max_items=1, max_frames=128)


class TestTrainerSLM:
    """v2.3 trains with the SLM/WavLM losses unconditionally
    (train_ms.py:344-356); the Trainer resolves config.json model.slm."""

    def test_declared_slm_with_missing_weights_raises(self, corpus, tmp_path):
        root, cfg_path = corpus
        cfg = json.loads(open(cfg_path, encoding="utf-8").read())
        cfg["model"]["slm"] = dict(
            model=str(root / "no-such-wavlm"), sr=16000,
            hidden=768, nlayers=13, initial_channel=64,
        )
        cfg_slm = root / "config_slm.json"
        cfg_slm.write_text(json.dumps(cfg), encoding="utf-8")
        with pytest.raises(FileNotFoundError, match="slm"):
            from bert_vits2_tpu.train.trainer import Trainer

            Trainer(str(cfg_slm), str(tmp_path / "runX"))

    def test_trainer_step_with_tiny_slm(self, corpus, tmp_path):
        import jax
        import jax.numpy as jnp

        from bert_vits2_tpu.compat.hparams import (
            get_hparams_from_file,
            model_config_from_hparams,
        )
        from bert_vits2_tpu.models import WavLMDiscriminator
        from bert_vits2_tpu.models.slm import (
            WavLMConfig,
            WavLMJax,
            make_slm_fns,
        )
        from bert_vits2_tpu.train import Models
        from bert_vits2_tpu.train.trainer import Trainer

        root, cfg_path = corpus
        mcfg = model_config_from_hparams(get_hparams_from_file(cfg_path))
        wl_cfg = WavLMConfig(
            hidden_size=16, num_layers=2, num_heads=2, intermediate_size=32,
            conv_dim=(8, 8), conv_kernel=(10, 3), conv_stride=(5, 2),
            num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
            num_buckets=32, max_bucket_distance=50,
        )
        wl = WavLMJax(wl_cfg)
        seg = mcfg.segment_samples
        wl_params = wl.init(jax.random.key(9), jnp.zeros((1, seg)))["params"]
        slm_embed, slm_feature_fn = make_slm_fns(
            wl_params, wl_cfg, input_sr=SR, model_sr=SR
        )
        base = _tiny_models(mcfg)
        models = Models(
            base.synthesizer, base.mpd, base.dur_disc,
            WavLMDiscriminator(slm_hidden=16, slm_layers=3, initial_channel=8),
        )
        trainer = Trainer(
            cfg_path, str(tmp_path / "slm_run"), models=models,
            slm_embed=slm_embed, slm_feature_fn=slm_feature_fn,
        )
        assert trainer.state.params_wd is not None
        trainer.run(epochs=10, max_steps=1, log_interval=1, eval_interval=1000)
        assert trainer.global_step == 1
