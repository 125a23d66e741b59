"""Training loop (reference: train_ms.py:54-835 run / train_and_evaluate /
evaluate).

One jitted GAN step per batch (vs the reference's four backward passes), data
parallelism via a ("data", "model") mesh with XLA-inserted gradient reductions,
per-epoch exponential LR decay (gamma^epoch, train_ms.py:334-345), TensorBoard
scalars/images/audio on the lead host, orbax checkpoints with retention, and
bootstrap from reference G_/D_/DUR_/WD_*.pth files when present.
"""

from __future__ import annotations

import math
import os
import signal

import jax
import jax.numpy as jnp
import numpy as np

from bert_vits2_tpu.compat.hparams import (
    HParams,
    data_config_from_hparams,
    get_hparams_from_file,
    model_config_from_hparams,
)
from bert_vits2_tpu.data import BucketSampler, FilelistDataset, collate_batch
from bert_vits2_tpu.models import (
    DurationDiscriminator,
    ModelConfig,
    MultiPeriodDiscriminator,
    Synthesizer,
    WavLMDiscriminator,
)
from bert_vits2_tpu.parallel import batch_sharding, make_mesh, replicate
from bert_vits2_tpu.train import checkpoint as ckpt
from bert_vits2_tpu.train.step import (
    DataConfig,
    Models,
    TrainConfig,
    TrainState,
    init_train_state,
    make_train_step,
)
from bert_vits2_tpu.utils import (
    alignment_to_image,
    get_logger,
    spectrogram_to_image,
    summarize,
)
from bert_vits2_tpu.utils.logging import make_writer
from bert_vits2_tpu.utils.profiling import StepTimer, trace
from bert_vits2_tpu.utils.repro import check_git_hash


def train_config_from_hparams(hps: HParams) -> TrainConfig:
    t = hps.train
    return TrainConfig(
        learning_rate=t.learning_rate,
        betas=tuple(t.get("betas", (0.8, 0.99))),
        eps=t.get("eps", 1e-9),
        lr_decay=t.get("lr_decay", 0.99995),
        c_mel=t.get("c_mel", 45.0),
        c_kl=t.get("c_kl", 1.0),
        bf16_run=t.get("bf16_run", False),
        seed=t.get("seed", 1234),
        freeze_zh_bert=t.get("freeze_ZH_bert", False),
        freeze_en_bert=t.get("freeze_EN_bert", False),
        freeze_jp_bert=t.get("freeze_JP_bert", False),
        freeze_emo=t.get("freeze_emo", False),
    )


def build_models(
    mcfg: ModelConfig,
    use_dur_disc: bool = True,
    use_wavlm_disc: bool = False,
) -> Models:
    """Full-size model quartet per configs/config.json (train_ms.py:174-222)."""
    synth = Synthesizer(mcfg)
    mpd = MultiPeriodDiscriminator()
    dd = (
        DurationDiscriminator(
            in_channels=mcfg.hidden_channels,
            filter_channels=256,
            kernel_size=3,
            p_dropout=0.1,
            gin_channels=mcfg.gin_channels,
        )
        if use_dur_disc
        else None
    )
    wd = (
        WavLMDiscriminator(
            slm_hidden=mcfg.slm_hidden,
            slm_layers=mcfg.slm_layers,
            initial_channel=mcfg.slm_initial_channel,
        )
        if use_wavlm_disc
        else None
    )
    return Models(synth, mpd, dd, wd)


def init_params(models: Models, mcfg: ModelConfig, seed: int = 1234,
                slm_embed=None):
    """Initialize all four parameter trees with a tiny dummy batch.

    slm_embed (when the SLM branch is on) pins the WavLM discriminator's
    input channels to the actual embed output rather than the config's
    slm_hidden*slm_layers, so tiny test WavLMs initialize consistently."""
    synth, mpd, dd, wd = models
    b, t_x = 1, 8
    t_y = max(mcfg.segment_size + 4, 16)
    rngs = {
        "params": jax.random.key(seed),
        "noise": jax.random.key(seed + 1),
        "dropout": jax.random.key(seed + 2),
    }
    params_g = synth.init(
        rngs,
        jnp.zeros((b, t_x), jnp.int32),
        jnp.full((b,), t_x, jnp.int32),
        jnp.zeros((b, t_y, mcfg.spec_channels), jnp.float32),
        jnp.full((b,), t_y, jnp.int32),
        jnp.zeros((b,), jnp.int32),
        jnp.zeros((b, t_x), jnp.int32),
        jnp.zeros((b, t_x), jnp.int32),
        jnp.zeros((b, t_x, mcfg.bert_dim), jnp.float32),
        jnp.zeros((b, t_x, mcfg.bert_dim), jnp.float32),
        jnp.zeros((b, t_x, mcfg.bert_dim), jnp.float32),
        deterministic=True,
    )["params"]
    wav = jnp.zeros((b, mcfg.segment_samples), jnp.float32)
    params_d = mpd.init(jax.random.key(seed + 3), wav, wav)["params"]
    params_dd = None
    if dd is not None:
        params_dd = dd.init(
            jax.random.key(seed + 4),
            jnp.zeros((b, t_x, mcfg.hidden_channels), jnp.float32),
            jnp.ones((b, t_x), jnp.float32),
            jnp.ones((b, t_x, 1), jnp.float32),
            jnp.ones((b, t_x, 1), jnp.float32),
            g=jnp.zeros((b, mcfg.gin_channels), jnp.float32),
        )["params"]
    params_wd = None
    if wd is not None:
        if slm_embed is not None:
            emb0 = slm_embed(
                getattr(slm_embed, "params", None),
                jnp.zeros((1, mcfg.segment_samples), jnp.float32),
            )
        else:
            emb0 = jnp.zeros(
                (b, 16, mcfg.slm_hidden * mcfg.slm_layers), jnp.float32
            )
        params_wd = wd.init(jax.random.key(seed + 5), emb0)["params"]
    return params_g, params_d, params_dd, params_wd


class Trainer:
    """End-to-end training driver.

    Usage:
        t = Trainer(config_path, model_dir)
        t.run(epochs=100)
    """

    def __init__(
        self,
        config_path: str,
        model_dir: str,
        use_dur_disc: bool = True,
        use_wavlm_disc: bool = False,
        slm_embed=None,
        slm_feature_fn=None,
        n_model: int = 1,
        models: Models | None = None,
        slm_path: str | None = "auto",
    ):
        self.hps = get_hparams_from_file(config_path)
        if slm_path == "auto":
            # v2.3 trains with the SLM losses UNCONDITIONALLY
            # (train_ms.py:220-222, 344-356): resolve config.json
            # model.slm.model; a declared-but-missing weights dir is a hard
            # error (not a silent no-SLM run) unless slm_path=None.
            slm_path = None
            declared = self.hps.model.get("slm", None)
            if declared is not None and slm_embed is None:
                cand = declared.get("model", "./slm/wavlm-base-plus")
                if os.path.isdir(cand):
                    slm_path = cand
                else:
                    raise FileNotFoundError(
                        f"config declares model.slm.model={cand!r} but no WavLM "
                        "weights found there. Fetch them with `python -m "
                        "bert_vits2_tpu.tools.fetch_assets --slm` (see "
                        "docs/WEIGHTS.md), pass slm_path=<dir>, or disable the "
                        "SLM losses explicitly with --no-slm / slm_path=None."
                    )
        if slm_path is not None and slm_embed is None:
            from bert_vits2_tpu.models.slm import load_wavlm, make_slm_fns

            wl_params, wl_cfg = load_wavlm(slm_path)
            slm_embed, slm_feature_fn = make_slm_fns(wl_params, wl_cfg)
            use_wavlm_disc = True
        if slm_embed is not None:
            use_wavlm_disc = True
        self.model_dir = model_dir
        os.makedirs(model_dir, exist_ok=True)
        self.logger = get_logger(model_dir)
        check_git_hash(model_dir)
        # bf16_run (config.json train.bf16_run) = the reference's
        # autocast(bf16); here it selects the bf16 training compute path for
        # the hot model stages (ModelConfig.train_compute_dtype).
        mcfg_kw = (
            {"train_compute_dtype": "bfloat16"}
            if self.hps.train.get("bf16_run", False)
            else {}
        )
        self.mcfg = model_config_from_hparams(self.hps, **mcfg_kw)
        self.dcfg = data_config_from_hparams(self.hps)
        self.tcfg = train_config_from_hparams(self.hps)
        self.models = models or build_models(self.mcfg, use_dur_disc, use_wavlm_disc)
        self.slm_embed = slm_embed
        self.slm_feature_fn = slm_feature_fn
        # frozen WavLM weights ride in TrainState.params_slm (runtime input,
        # not an HLO constant — see train/step.py TrainState)
        self.slm_params = getattr(slm_embed, "params", None)

        # the data axis must divide the global batch (batch_size per host);
        # gcd keeps tiny test batches working on big virtual meshes
        global_batch = self.hps.train.batch_size * jax.process_count()
        n_data = math.gcd(global_batch, len(jax.devices()) // n_model)
        self.mesh = make_mesh(n_data=n_data, n_model=n_model)
        self.batch_sharding = batch_sharding(self.mesh)
        self.rank = jax.process_index()
        self.num_replicas = jax.process_count()
        self.is_lead = self.rank == 0

        self.writer = make_writer(os.path.join(model_dir, "logs")) if self.is_lead else None
        self.eval_writer = (
            make_writer(os.path.join(model_dir, "logs", "eval")) if self.is_lead else None
        )

        # data
        d = self.hps.data
        self.train_ds = FilelistDataset(
            d.training_files,
            spk2id=d.spk2id.to_dict() if isinstance(d.spk2id, HParams) else d.spk2id,
            sampling_rate=d.sampling_rate,
            filter_length=d.filter_length,
            hop_length=d.hop_length,
            win_length=d.win_length,
            add_blank=d.get("add_blank", True),
            bert_dim=self.mcfg.bert_dim,
        )
        self.val_ds = (
            FilelistDataset(
                d.validation_files,
                spk2id=d.spk2id.to_dict() if isinstance(d.spk2id, HParams) else d.spk2id,
                sampling_rate=d.sampling_rate,
                filter_length=d.filter_length,
                hop_length=d.hop_length,
                win_length=d.win_length,
                add_blank=d.get("add_blank", True),
                bert_dim=self.mcfg.bert_dim,
            )
            if d.get("validation_files") and os.path.isfile(d.validation_files)
            else None
        )
        self.sampler = BucketSampler(
            self.train_ds.lengths(),
            batch_size=self.hps.train.batch_size,
            num_replicas=self.num_replicas,
            rank=self.rank,
            seed=self.tcfg.seed,
        )
        self.logger.info(
            "dataset: %d utterances (%d skipped), %d batches/epoch/host",
            len(self.train_ds), self.train_ds.skipped, len(self.sampler),
        )

        # state
        params = init_params(
            self.models, self.mcfg, self.tcfg.seed, slm_embed=self.slm_embed
        )
        self.global_step = 0
        ck_dir = self.ckpt_dir = os.path.join(model_dir, "ckpt")
        step = ckpt.latest_step(ck_dir)
        state = init_train_state(
            self.models, self.tcfg, *params, params_slm=self.slm_params
        )
        if step is not None:
            state, step = ckpt.restore_train_state(ck_dir, state, step)
            self.global_step = int(step)
            self.logger.info("resumed from orbax step %d", step)
        else:
            pg, pd, pdd, pwd, it = ckpt.bootstrap_from_reference(
                model_dir, params[0], params[1], params[2], params[3]
            )
            if it:
                self.logger.info("bootstrapped from reference checkpoints (iter %d)", it)
            state = init_train_state(
                self.models, self.tcfg, pg, pd, pdd, pwd,
                params_slm=self.slm_params,
            )
        self.state = replicate(self.mesh, state)
        self.start_epoch = self.global_step // max(len(self.sampler), 1)

        self.step_fn = make_train_step(
            self.models,
            self.tcfg,
            self.dcfg,
            self.mcfg.segment_size,
            mas_noise_initial=self.mcfg.mas_noise_scale_initial,
            mas_noise_delta=self.mcfg.noise_scale_delta,
            slm_embed=self.slm_embed,
            slm_feature_fn=self.slm_feature_fn,
        )

    # ---- data ----

    def _device_batch(self, batch_np: dict):
        """Host-local numpy batch -> globally sharded device arrays."""
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(self.batch_sharding, x),
            batch_np,
        )

    @property
    def native_loader(self):
        """Threaded C++ batch loader (native/dataloader.cc), or None."""
        if not hasattr(self, "_native_loader"):
            self._native_loader = None
            try:
                from bert_vits2_tpu.native import BatchLoader, available

                if available():
                    self._native_loader = BatchLoader()
                    self.logger.info("native batch loader active")
            except Exception as e:  # noqa: BLE001
                self.logger.info("native batch loader unavailable: %s", e)
        return self._native_loader

    def epoch_batches(self, epoch: int):
        self.sampler.set_epoch(epoch)
        for bucket_idx, ids in self.sampler:
            # fast path: caches -> padded buffers (native thread pool when
            # available); inactive-language BERT noise is drawn on device by
            # the train step (batch carries `bert`+`utt_lang`)
            from bert_vits2_tpu.data.dataset import load_collated_batch

            yield load_collated_batch(
                self.train_ds,
                ids,
                max_frames=self.sampler.bucket_max_frames(bucket_idx),
                loader=self.native_loader,
            )

    def _prefetch(self, gen, depth: int = 2):
        """Load + collate + device-put ahead of the step in a host thread
        (the DataLoader(num_workers, prefetch=4) role, train_ms.py:127-146)."""
        import queue
        import threading

        q: queue.Queue = queue.Queue(maxsize=depth)
        END = object()

        def worker():
            try:
                for item in gen:
                    q.put(("ok", self._device_batch(item)))
            except Exception as e:  # noqa: BLE001 - reraised on main thread
                q.put(("err", e))
            finally:
                q.put((None, END))

        threading.Thread(target=worker, daemon=True).start()
        while True:
            kind, item = q.get()
            if item is END:
                return
            if kind == "err":
                raise item
            yield item

    # ---- loop ----

    def run(
        self,
        epochs: int | None = None,
        log_interval: int | None = None,
        eval_interval: int | None = None,
        keep_ckpts: int | None = None,
        max_steps: int | None = None,
        profile_at_step: int | None = None,
        profile_steps: int = 5,
    ):
        t = self.hps.train
        epochs = epochs if epochs is not None else t.get("epochs", 1000)
        log_interval = log_interval or t.get("log_interval", 200)
        eval_interval = eval_interval or t.get("eval_interval", 1000)
        keep_ckpts = keep_ckpts or 8
        rng = jax.random.key(self.tcfg.seed)
        timer = StepTimer()
        # preemption handling: TPU VMs get SIGTERM ahead of eviction; save a
        # resumable checkpoint at the next step boundary and exit cleanly
        # (the reference's only recovery story is resume-from-latest).
        stop = {"flag": False}

        def _on_term(signum, frame):  # noqa: ARG001
            stop["flag"] = True

        try:
            prev_term = signal.signal(signal.SIGTERM, _on_term)
        except ValueError:  # not on the main thread (tests)
            prev_term = None
        # audio seconds consumed per step (decoder sees segment slices)
        seg_audio_s = (
            self.hps.train.batch_size
            * self.num_replicas
            * self.mcfg.segment_samples
            / self.dcfg.sampling_rate
        )

        for epoch in range(self.start_epoch, epochs):
            lr = jnp.float32(self.tcfg.learning_rate * self.tcfg.lr_decay**epoch)
            for batch in self._prefetch(self.epoch_batches(epoch)):
                if profile_at_step is not None and self.global_step == profile_at_step:
                    with trace(os.path.join(self.model_dir, "logs", "profile")):
                        for _ in range(profile_steps):
                            self.state, metrics = self.step_fn(
                                self.state, batch, rng, lr
                            )
                            jax.block_until_ready(metrics)
                            self.global_step += 1
                    self.logger.info("wrote device trace at step %d", self.global_step)
                    continue
                self.state, metrics = self.step_fn(self.state, batch, rng, lr)
                timer.tick()
                self.global_step += 1

                if self.global_step % log_interval == 0:
                    # failure detection runs on EVERY process (a non-lead
                    # that kept stepping would hang in collectives after
                    # the lead died), not only on log steps — see the
                    # second check guarding each save below
                    m = self._assert_finite(metrics)
                if self.global_step % log_interval == 0 and self.is_lead:
                    rate = timer.steps_per_sec()
                    self.logger.info(
                        "epoch %d step %d | g=%.3f d=%.3f mel=%.3f | "
                        "%.2f steps/s (train rtf %.1f)",
                        epoch, self.global_step,
                        m.get("loss/g/total", 0), m.get("loss/d/total", 0),
                        m.get("loss/g/mel", 0), rate, timer.rtf(seg_audio_s),
                    )
                    summarize(self.writer, self.global_step,
                              scalars={**m, "steps_per_sec": rate,
                                       "train_rtf": timer.rtf(seg_audio_s)})

                if self.global_step % eval_interval == 0:
                    # re-check right before the save, whatever the
                    # log/eval interval relationship: a NaN step must
                    # never overwrite the last good checkpoint
                    self._assert_finite(metrics)
                    if self.is_lead:
                        self.evaluate()
                    self.save(keep_ckpts)
                if stop["flag"]:
                    self.logger.info("SIGTERM: saving preemption checkpoint")
                    self._assert_finite(metrics)
                    self.save(keep_ckpts)
                    if prev_term is not None:
                        signal.signal(signal.SIGTERM, prev_term)
                    return
                if max_steps is not None and self.global_step >= max_steps:
                    self._assert_finite(metrics)
                    self.save(keep_ckpts)
                    if prev_term is not None:
                        signal.signal(signal.SIGTERM, prev_term)
                    return

    def _assert_finite(self, metrics) -> dict:
        """Failure detection: a NaN/inf loss means the run is already
        unrecoverable — stop BEFORE a save can overwrite a good checkpoint
        with poisoned weights (resume then restarts from the last good one).
        Pulls the metric scalars to host (one sync; called only at
        log/save points)."""
        m = {k: float(np.asarray(v)) for k, v in metrics.items()}
        bad = {k: v for k, v in m.items() if not np.isfinite(v)}
        if bad:
            raise FloatingPointError(
                f"non-finite training metrics at step "
                f"{self.global_step}: {bad}; last good "
                f"checkpoint is unaffected — rerun to resume"
            )
        return m

    def save(self, keep: int = 8):
        # strip the frozen WavLM BEFORE the device->host pull: it is an
        # external asset, not state, and 380 MB over the axon tunnel is slow
        state = self.state
        if state.params_slm is not None:
            state = state.replace(params_slm=None)
        state = jax.tree.map(np.asarray, state)
        ckpt.save_train_state(self.ckpt_dir, self.global_step, state, keep=keep)
        self.logger.info("saved checkpoint at step %d", self.global_step)

    # ---- eval (reference: evaluate(), train_ms.py:742-835) ----

    def evaluate(self, max_items: int = 2, max_frames: int = 1024):
        if self.val_ds is None or len(self.val_ds) == 0:
            return
        synth = self.models.synthesizer
        params_g = jax.tree.map(np.asarray, self.state.params_g)
        hop = self.dcfg.hop_length
        audios, images = {}, {}
        for i in range(min(max_items, len(self.val_ds))):
            it = self.val_ds[i]
            t = len(it["phones"])

            def pad(a, width=None):
                w = [(0, 0)] * a.ndim
                return np.pad(a, w) if width is None else np.pad(a, width)

            for use_sdp, tag in ((True, "sdp"), (False, "dp")):
                wave, attn, _, y_len = synth.apply(
                    {"params": params_g},
                    jnp.asarray(it["phones"][None]),
                    jnp.asarray([t]),
                    jnp.asarray([it["sid"]]),
                    jnp.asarray(it["tones"][None]),
                    jnp.asarray(it["lang"][None]),
                    jnp.asarray(it["bert"][None]),
                    jnp.asarray(it["ja_bert"][None]),
                    jnp.asarray(it["en_bert"][None]),
                    max_frames,
                    sdp_ratio=1.0 if use_sdp else 0.0,
                    method=type(synth).infer,
                    rngs={"noise": jax.random.key(i)},
                )
                n = int(np.asarray(y_len)[0]) * hop
                audios[f"gen/audio_{i}_{tag}"] = np.asarray(wave)[0, :n]
                images[f"gen/attn_{i}_{tag}"] = alignment_to_image(
                    np.asarray(attn)[0, : int(np.asarray(y_len)[0])]
                )
            if self.global_step <= (self.hps.train.get("eval_interval", 1000)):
                audios[f"gt/audio_{i}"] = it["wave"]
                images[f"gt/spec_{i}"] = spectrogram_to_image(it["spec"])
        summarize(
            self.eval_writer,
            self.global_step,
            images=images,
            audios=audios,
            audio_sampling_rate=self.dcfg.sampling_rate,
        )
        self.logger.info("eval at step %d: %d clips", self.global_step, len(audios))
