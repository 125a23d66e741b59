"""Single fused GAN training step (reference: train_ms.py:394-607).

The reference runs four separate optimizer steps with four backward passes and
four DDP allreduces per batch. Here the whole thing is ONE jitted function:

  1. generator forward (once, fixed rngs),
  2. discriminator / duration-discriminator / SLM-discriminator losses against
     the stop-gradient'ed fake, three optax updates (D first, as in the
     reference, so the generator sees the updated discriminators),
  3. generator loss (adversarial + fm + mel + dur + kl + slm) recomputing the
     forward under grad with the SAME rngs — XLA CSEs the duplicated forward
     where possible, and gradient cross-device reduction is inserted by XLA
     from the sharding (no hand-written psum).

Order of updates matches train_ms.py:508-607. Matching reference semantics:
no gradient clipping by default (clip_grad_value_ with None only measures the
norm, commons.py:143-158); optional global-norm clip for bf16 runs.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, NamedTuple, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from bert_vits2_tpu.models.synthesizer import Synthesizer
from bert_vits2_tpu.ops.masking import slice_segments
from bert_vits2_tpu.ops.stft import mel_spectrogram, spec_to_mel
from bert_vits2_tpu.train.losses import (
    discriminator_loss,
    feature_loss,
    generator_loss,
    kl_loss,
)

sg = jax.lax.stop_gradient


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """DSP/data parameters (configs/config.json `data` section)."""

    sampling_rate: int = 44100
    filter_length: int = 2048
    hop_length: int = 512
    win_length: int = 2048
    n_mel_channels: int = 128
    mel_fmin: float = 0.0
    mel_fmax: float | None = None


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization parameters (configs/config.json `train` section)."""

    learning_rate: float = 2e-4
    betas: tuple[float, float] = (0.8, 0.99)
    eps: float = 1e-9
    lr_decay: float = 0.99995
    c_mel: float = 45.0
    c_kl: float = 1.0
    bf16_run: bool = False
    grad_clip_g: float = 500.0
    grad_clip_d: float = 200.0
    seed: int = 42
    # config.json train.freeze_{ZH,EN,JP}_bert — reference stops gradients to
    # the per-language BERT projections (train_ms.py:204-217); freeze_emo is
    # honored for old-version emotion heads (written by webui_preprocess).
    freeze_zh_bert: bool = False
    freeze_en_bert: bool = False
    freeze_jp_bert: bool = False
    freeze_emo: bool = False

    @property
    def frozen_subtrees(self) -> tuple[tuple[str, ...], ...]:
        """params_g subtree paths whose updates are zeroed."""
        out = []
        if self.freeze_zh_bert:
            out.append(("enc_p", "bert_proj"))
        if self.freeze_en_bert:
            out.append(("enc_p", "en_bert_proj"))
        if self.freeze_jp_bert:
            out.append(("enc_p", "ja_bert_proj"))
        if self.freeze_emo:
            out.append(("enc_p", "emo_proj"))
            out.append(("enc_p", "emo_quantizer"))
            out.append(("enc_p", "in_feature_net"))
            out.append(("enc_p", "out_feature_net"))
        return tuple(out)


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params_g: Any
    params_d: Any
    params_dd: Any
    params_wd: Any
    opt_g: Any
    opt_d: Any
    opt_dd: Any
    opt_wd: Any
    # frozen WavLM weights for the SLM losses (reference keeps them inside
    # WavLMLoss, losses.py:63-72). Threaded through the state — NOT closed
    # over — so the jitted step's HLO doesn't embed ~380 MB of constants.
    # No optimizer; excluded from gradients by construction.
    params_slm: Any = None


class Models(NamedTuple):
    synthesizer: Any  # Synthesizer
    mpd: Any  # MultiPeriodDiscriminator
    dur_disc: Any  # DurationDiscriminator | None
    wavlm_disc: Any  # WavLMDiscriminator | None


def _freeze_mask(tree, frozen: tuple[tuple[str, ...], ...]):
    """Bool pytree: True for leaves under any frozen subtree path."""
    import flax.traverse_util as tu

    flat = tu.flatten_dict(tree)
    mask = {k: any(k[: len(p)] == p for p in frozen) for k in flat}
    return tu.unflatten_dict(mask)


def make_optimizer(
    cfg: TrainConfig,
    clip: float | None,
    frozen: tuple[tuple[str, ...], ...] = (),
) -> optax.GradientTransformation:
    chain = []
    if cfg.bf16_run and clip is not None:
        chain.append(optax.clip_by_global_norm(clip))
    chain.append(
        optax.inject_hyperparams(optax.adamw)(
            learning_rate=cfg.learning_rate,
            b1=cfg.betas[0],
            b2=cfg.betas[1],
            eps=cfg.eps,
            weight_decay=0.01,
        )
    )
    if frozen:
        # zero the final update for frozen leaves (reference excludes them
        # from the optimizer via requires_grad, train_ms.py:204-217); keeps
        # optimizer-state shapes identical whether or not anything is frozen
        chain.append(
            optax.masked(optax.set_to_zero(), lambda t: _freeze_mask(t, frozen))
        )
    return optax.chain(*chain)


def init_train_state(
    models: Models,
    cfg: TrainConfig,
    params_g,
    params_d,
    params_dd,
    params_wd,
    params_slm=None,
) -> TrainState:
    tx_g = make_optimizer(cfg, cfg.grad_clip_g, cfg.frozen_subtrees)
    tx_d = make_optimizer(cfg, cfg.grad_clip_d)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params_g=params_g,
        params_d=params_d,
        params_dd=params_dd,
        params_wd=params_wd,
        opt_g=tx_g.init(params_g),
        opt_d=tx_d.init(params_d),
        opt_dd=tx_d.init(params_dd) if params_dd is not None else None,
        opt_wd=tx_d.init(params_wd) if params_wd is not None else None,
        params_slm=params_slm,
    )


def _set_lr(opt_state, lr):
    """Update the injected learning rate in an optax.chain(...) state."""
    return optax.tree_utils.tree_set(opt_state, learning_rate=lr)


def make_train_step(
    models: Models,
    train_cfg: TrainConfig,
    data_cfg: DataConfig,
    segment_size_frames: int,
    mas_noise_initial: float = 0.01,
    mas_noise_delta: float = 2e-6,
    slm_embed: Optional[Callable] = None,
    slm_feature_fn: Optional[Callable] = None,
    donate: bool = True,
    jit: bool = True,
) -> Callable:
    """Build the jitted train step: (state, batch, rng, lr) -> (state, metrics).

    jit=False returns the raw traceable function instead — callers that need
    to embed the step inside a larger jitted program (e.g. the bench's
    device-side `lax.fori_loop` timing loop, which cancels the per-dispatch
    relay cost) wrap it themselves.

    batch keys: x, x_lengths, spec [b,t,spec_ch], spec_lengths, wave [b,t_samp],
    sid, tone, language, bert, ja_bert, en_bert.

    slm_embed: frozen fn (params_slm, wave[b, t_samples]@44.1k) -> stacked SLM
    hidden states [b, t', layers*hidden] for the WavLM discriminator
    (losses.py:63-153); slm_feature_fn: same but returning the per-layer list
    for the L1 feature loss. Both None disables SLM losses. The WavLM weights
    ride in state.params_slm (see TrainState) — pass them to init_train_state.
    """
    synth, mpd, dur_disc, wavlm_disc = models
    tx_g = make_optimizer(train_cfg, train_cfg.grad_clip_g, train_cfg.frozen_subtrees)
    tx_d = make_optimizer(train_cfg, train_cfg.grad_clip_d)
    hop = data_cfg.hop_length
    seg_frames = segment_size_frames
    # bf16_run mirrors the reference's autocast(bf16) over the discriminator
    # forward too (train_ms.py:458-568): waveform discriminators compute in
    # bf16 (params fp32, cast per-module), losses reduce in fp32.
    disc_dtype = jnp.bfloat16 if train_cfg.bf16_run else jnp.float32

    def _dc(a):
        return a.astype(disc_dtype)

    def gen_forward(params_g, batch, rngs, mas_noise_scale):
        return synth.apply(
            {"params": params_g},
            batch["x"],
            batch["x_lengths"],
            batch["spec"],
            batch["spec_lengths"],
            batch["sid"],
            batch["tone"],
            batch["language"],
            batch["bert"],
            batch["ja_bert"],
            batch["en_bert"],
            mas_noise_scale=mas_noise_scale,
            deterministic=False,
            rngs=rngs,
        )

    def expand_bert(batch, rng):
        """Fast-collate batches carry only the ACTIVE language's BERT
        features (`bert` [b,t,1024]) + `utt_lang` [b]; draw the two
        inactive-language N(0,1) placeholders HERE, on device. The reference
        generates them on the host per item per epoch (data_utils.py:159-168)
        and ships 3x the BERT bytes to the device; the placeholders are pure
        noise, so device RNG is distribution-identical."""
        if "utt_lang" not in batch:
            return batch
        active = batch["bert"]
        noise = jax.random.normal(rng, (3,) + active.shape, active.dtype)
        sel = batch["utt_lang"][:, None, None]
        batch = dict(batch)
        batch["bert"] = jnp.where(sel == 0, active, noise[0])
        batch["ja_bert"] = jnp.where(sel == 1, active, noise[1])
        batch["en_bert"] = jnp.where(sel == 2, active, noise[2])
        return batch

    def step(state: TrainState, batch, rng, lr):
        metrics = {}
        rng = jax.random.fold_in(rng, state.step)
        noise_rng, dropout_rng, bert_rng = jax.random.split(rng, 3)
        rngs = {"noise": noise_rng, "dropout": dropout_rng}
        batch = expand_bert(batch, bert_rng)

        mas_noise_scale = jnp.maximum(
            mas_noise_initial - mas_noise_delta * state.step.astype(jnp.float32), 0.0
        )

        # ---- 1. generator forward (no grads yet) ----
        out = gen_forward(state.params_g, batch, rngs, mas_noise_scale)
        ids_slice = out["ids_slice"]
        y_hat = out["wave_slice"]  # [b, seg_frames*hop]

        mel = spec_to_mel(
            batch["spec"],
            data_cfg.filter_length,
            data_cfg.n_mel_channels,
            data_cfg.sampling_rate,
            data_cfg.mel_fmin,
            data_cfg.mel_fmax,
        )
        y_mel = slice_segments(mel, ids_slice, seg_frames)
        y_slice = slice_segments(
            batch["wave"][..., None], ids_slice * hop, seg_frames * hop
        )[..., 0]

        # ---- 2a. waveform discriminator update (train_ms.py:508-556) ----
        def d_loss_fn(params_d):
            y_d_r, y_d_g, _, _ = mpd.apply({"params": params_d}, _dc(y_slice), _dc(sg(y_hat)))
            loss_disc, r_losses, g_losses = discriminator_loss(y_d_r, y_d_g)
            return loss_disc

        loss_disc, grads_d = jax.value_and_grad(d_loss_fn)(state.params_d)
        upd_d, opt_d = tx_d.update(grads_d, _set_lr(state.opt_d, lr), state.params_d)
        params_d = optax.apply_updates(state.params_d, upd_d)
        metrics["loss/d/total"] = loss_disc
        metrics["grad_norm_d"] = optax.global_norm(grads_d)

        # ---- 2b. duration discriminator update (train_ms.py:514-548) ----
        if dur_disc is not None:
            hx, xm = sg(out["x_hidden"]), sg(out["x_mask"])
            lw_, lw, lw_sdp = sg(out["logw_"]), sg(out["logw"]), sg(out["logw_sdp"])
            gg = sg(out["g"])

            def dd_loss_fn(params_dd):
                r1, g1 = dur_disc.apply({"params": params_dd}, hx, xm, lw_, lw, g=gg)
                r2, g2 = dur_disc.apply({"params": params_dd}, hx, xm, lw_, lw_sdp, g=gg)
                loss, _, _ = discriminator_loss([r1, r2], [g1, g2])
                return loss

            loss_dur_disc, grads_dd = jax.value_and_grad(dd_loss_fn)(state.params_dd)
            upd_dd, opt_dd = tx_d.update(
                grads_dd, _set_lr(state.opt_dd, lr), state.params_dd
            )
            params_dd = optax.apply_updates(state.params_dd, upd_dd)
            metrics["loss/dur_disc/total"] = loss_dur_disc
            metrics["grad_norm_dur"] = optax.global_norm(grads_dd)
        else:
            params_dd, opt_dd = state.params_dd, state.opt_dd

        # ---- 2c. SLM discriminator update (train_ms.py:558-568) ----
        if wavlm_disc is not None and slm_embed is not None:
            emb_real = sg(slm_embed(state.params_slm, y_slice))
            emb_fake = sg(slm_embed(state.params_slm, y_hat))

            def wd_loss_fn(params_wd):
                d_r = wavlm_disc.apply({"params": params_wd}, emb_real)
                d_g = wavlm_disc.apply({"params": params_wd}, emb_fake)
                return (
                    jnp.mean((1.0 - d_r.astype(jnp.float32)) ** 2)
                    + jnp.mean(d_g.astype(jnp.float32) ** 2)
                )

            loss_slm, grads_wd = jax.value_and_grad(wd_loss_fn)(state.params_wd)
            upd_wd, opt_wd = tx_d.update(
                grads_wd, _set_lr(state.opt_wd, lr), state.params_wd
            )
            params_wd = optax.apply_updates(state.params_wd, upd_wd)
            metrics["loss/wd/total"] = loss_slm
            metrics["grad_norm_wd"] = optax.global_norm(grads_wd)
        else:
            params_wd, opt_wd = state.params_wd, state.opt_wd

        # ---- 3. generator update (train_ms.py:570-607), updated discs ----
        def g_loss_fn(params_g):
            o = gen_forward(params_g, batch, rngs, mas_noise_scale)
            yh = o["wave_slice"]
            yh_mel = mel_spectrogram(
                yh.astype(jnp.float32),
                data_cfg.filter_length,
                data_cfg.n_mel_channels,
                data_cfg.sampling_rate,
                data_cfg.hop_length,
                data_cfg.win_length,
                data_cfg.mel_fmin,
                data_cfg.mel_fmax,
            )
            ym = slice_segments(mel, o["ids_slice"], seg_frames)
            ys = slice_segments(
                batch["wave"][..., None], o["ids_slice"] * hop, seg_frames * hop
            )[..., 0]

            y_d_r, y_d_g, fmap_r, fmap_g = mpd.apply(
                {"params": params_d}, _dc(ys), _dc(yh)
            )
            loss_gen, _ = generator_loss(y_d_g)
            loss_fm = feature_loss(fmap_r, fmap_g)
            loss_mel = jnp.mean(jnp.abs(ym - yh_mel)) * train_cfg.c_mel
            loss_dur = jnp.sum(o["l_length"].astype(jnp.float32))
            loss_kl = (
                kl_loss(o["z_p"], o["logs_q"], o["m_p"], o["logs_p"], o["y_mask"])
                * train_cfg.c_kl
            )
            loss_all = loss_gen + loss_fm + loss_mel + loss_dur + loss_kl
            aux = {
                "loss/g/gen": loss_gen,
                "loss/g/fm": loss_fm,
                "loss/g/mel": loss_mel,
                "loss/g/dur": loss_dur,
                "loss/g/kl": loss_kl,
            }

            if dur_disc is not None:
                _, g1 = dur_disc.apply(
                    {"params": params_dd}, o["x_hidden"], o["x_mask"], o["logw_"],
                    o["logw"], g=o["g"],
                )
                _, g2 = dur_disc.apply(
                    {"params": params_dd}, o["x_hidden"], o["x_mask"], o["logw_"],
                    o["logw_sdp"], g=o["g"],
                )
                loss_dur_gen, _ = generator_loss([g1, g2])
                loss_all = loss_all + loss_dur_gen
                aux["loss/g/dur_gen"] = loss_dur_gen

            if wavlm_disc is not None and slm_embed is not None:
                p_slm = sg(state.params_slm)
                if slm_feature_fn is not None:
                    feats_r = slm_feature_fn(p_slm, sg(ys))
                    feats_g = slm_feature_fn(p_slm, yh)
                    loss_lm = sum(
                        jnp.mean(jnp.abs(sg(fr) - fg))
                        for fr, fg in zip(feats_r, feats_g)
                    )
                else:
                    loss_lm = 0.0
                d_g = wavlm_disc.apply(
                    {"params": params_wd}, slm_embed(p_slm, yh)
                )
                loss_lm_gen = jnp.mean((1.0 - d_g.astype(jnp.float32)) ** 2)
                loss_all = loss_all + loss_lm + loss_lm_gen
                aux["loss/g/lm"] = loss_lm
                aux["loss/g/lm_gen"] = loss_lm_gen

            return loss_all, aux

        (loss_gen_all, aux), grads_g = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.params_g
        )
        upd_g, opt_g = tx_g.update(grads_g, _set_lr(state.opt_g, lr), state.params_g)
        params_g = optax.apply_updates(state.params_g, upd_g)
        metrics.update(aux)
        metrics["loss/g/total"] = loss_gen_all
        metrics["grad_norm_g"] = optax.global_norm(grads_g)
        metrics["learning_rate"] = lr

        new_state = state.replace(
            step=state.step + 1,
            params_g=params_g,
            params_d=params_d,
            params_dd=params_dd,
            params_wd=params_wd,
            opt_g=opt_g,
            opt_d=opt_d,
            opt_dd=opt_dd,
            opt_wd=opt_wd,
        )
        return new_state, metrics

    if not jit:
        return step
    return jax.jit(step, donate_argnums=(0,) if donate else ())
