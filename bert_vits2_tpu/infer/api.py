"""Batched, statically-shaped TTS inference engine (reference: infer.py:107-437).

Reference semantics preserved: get_text (g2p + BERT + blank intersperse +
inactive-language noise), infer with (sdp_ratio, noise_scale, noise_scale_w,
length_scale), skip_start/skip_end boundary trims (3/2 tokens) for seamless
multi-segment concat, infer_multilang.

TPU-native differences: text is padded to bucket lengths and the jitted
synthesis function is cached per (text-bucket, frame-cap) pair — dynamic
output length becomes a device-computed y_length used to trim host-side.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Sequence

import numpy as np

from bert_vits2_tpu.text import clean_text, cleaned_text_to_sequence
from bert_vits2_tpu.text.bert import (
    BERT_DIM,
    AutoBertExtractor,
    RandomBertExtractor,
    expand_word2ph,
)

_LANGS = ("ZH", "JP", "EN")


@functools.lru_cache(maxsize=1)
def default_bert_extractor() -> AutoBertExtractor:
    """Shared default extractor: JaxBertExtractor caches loaded weights and
    jitted encoders PER INSTANCE, so direct get_text callers must share one
    instance or they reload the full BERT checkpoint every call (TTSEngine
    holds its own instance and is unaffected)."""
    return AutoBertExtractor()


def _intersperse(lst, item=0):
    out = [item] * (len(lst) * 2 + 1)
    out[1::2] = lst
    return out


def get_text(
    text: str,
    language: str,
    bert_extractor=None,
    add_blank: bool = True,
    style_text: str | None = None,
    style_weight: float = 0.7,
    noise_seed: int = 0,
    spec=None,
):
    """text -> (phones, tones, lang_ids, bert/ja_bert/en_bert [t, dim]).

    Ref: infer.py:107-149 (g2p, intersperse, BERT at phone level, randn
    placeholders for the two inactive languages). `spec` (a
    compat.versions.VersionSpec) switches to an old version family: its
    symbol table / tone offsets, zero fills instead of randn
    (oldVersion/V200/__init__.py:29-37), and its ja_bert width.

    Default extractor resolves real local BERT weights per language and
    warns loudly before degrading to noise (the reference always runs real
    BERT for the active language, infer.py:120-137).
    """
    bert_extractor = bert_extractor or default_bert_extractor()
    norm_text, phones_s, tones, word2ph = clean_text(text, language)
    if spec is not None and spec.family != "2.3":
        if language not in spec.languages:
            raise ValueError(
                f"version {spec.family} checkpoints only synthesize "
                f"{spec.languages}, not {language}"
            )
        phones, tones, lang_ids = spec.cleaned_text_to_sequence(
            phones_s, tones, language
        )
    else:
        phones, tones, lang_ids = cleaned_text_to_sequence(phones_s, tones, language)
    if add_blank:
        phones = _intersperse(phones)
        tones = _intersperse(tones)
        lang_ids = _intersperse(lang_ids)
        word2ph = [w * 2 for w in word2ph]
        word2ph[0] += 1

    t = len(phones)
    bert = bert_extractor(norm_text, word2ph, language,
                          style_text=style_text, style_weight=style_weight)
    assert bert.shape == (t, BERT_DIM), (bert.shape, t)
    dims = {"ZH": BERT_DIM, "JP": BERT_DIM, "EN": BERT_DIM}
    if spec is not None:
        dims["JP"] = spec.ja_bert_dim
    if spec is None or spec.inactive_fill == "randn":
        rng = np.random.default_rng((noise_seed, t))
        feats = {
            lang: rng.normal(size=(t, dims[lang])).astype(np.float32)
            for lang in _LANGS
            if lang != language
        }
    else:
        feats = {
            lang: np.zeros((t, dims[lang]), np.float32)
            for lang in _LANGS
            if lang != language
        }
    feats[language] = bert.astype(np.float32)
    if feats[language].shape[1] != dims[language]:
        feats[language] = feats[language][:, : dims[language]]
    return (
        np.asarray(phones, np.int32),
        np.asarray(tones, np.int32),
        np.asarray(lang_ids, np.int32),
        feats["ZH"],
        feats["JP"],
        feats["EN"],
    )


class PreparedRequest(NamedTuple):
    """One host-preprocessed utterance, ready to join a batched device call.

    `inputs` is get_text's 6-tuple (phones/tones/lang_ids [t], 3x bert
    [t, dim]) after any boundary trims; `emo` is a single emotion row
    ([1] int codebook index or [1, d] vector) or None. The four knobs ride
    along per request — Synthesizer.infer broadcasts [b]-shaped knobs, so
    heterogeneous requests still share one XLA call.
    """

    inputs: tuple
    sid: int
    emo: np.ndarray | None = None
    sdp_ratio: float = 0.2
    noise_scale: float = 0.667
    noise_scale_w: float = 0.8
    length_scale: float = 1.0
    seed: int = 0


class TTSEngine:
    """Holds (model, params) and a cache of jitted bucket-shaped synthesizers.

    speakers: spk2id dict (config.json data.spk2id) or None for integer sids.
    """

    def __init__(
        self,
        model,
        params,
        spk2id: dict | None = None,
        sampling_rate: int = 44100,
        bert_extractor=None,
        text_buckets: Sequence[int] = (32, 64, 128, 256, 384),
        frames_per_token: int = 6,
        frame_multiple: int = 64,
        version_spec=None,
        emotion_extractor=None,
        mesh=None,
    ):
        """mesh: optional jax.sharding.Mesh for data-parallel batched
        synthesis — params replicate, request batches shard over the
        `data` axis, XLA inserts the collectives (the inference analog of
        the training DP path; BASELINE.md scaling target)."""
        self.model = model
        self.mesh = mesh
        if mesh is not None:
            from bert_vits2_tpu.parallel import replicate

            params = replicate(mesh, params)
        self.params = params
        self.spk2id = spk2id or {}
        self.sampling_rate = sampling_rate
        self.hop_length = model.cfg.hop_length
        # real per-language BERT when local weights exist; loud-warned noise
        # otherwise (ref infer.py:107-137 — noise is only for the INACTIVE
        # languages there)
        self.bert_extractor = bert_extractor or AutoBertExtractor(mesh=mesh)
        self.text_buckets = tuple(sorted(text_buckets))
        self.frames_per_token = frames_per_token
        self.frame_multiple = frame_multiple
        self.version_spec = version_spec
        self.emotion_extractor = emotion_extractor
        self._jitted: dict = {}
        # accounting across run_prepared calls (bench/monitoring):
        # capacity counts every frame the chip synthesized (padded batch x
        # frame cap), delivered counts frames inside real requests' y_len,
        # bytes_h2d counts request tensors shipped host->device
        self.stats = {"frames_capacity": 0, "frames_delivered": 0,
                      "bytes_h2d": 0}
        # fused Pallas MRF weights for the vocoder tail (inference fast
        # path; same parameters, weight-norm resolved). None disables.
        self.mrf_packed = None
        cfg = model.cfg
        import jax as _jax

        # CPU backends run Pallas in interpret mode — slower than XLA there,
        # so the fused path is TPU-only (tests cover it explicitly)
        if (
            _jax.default_backend() != "cpu"
            and getattr(cfg, "resblock", "1") == "1"
            and "params" in params
        ):
            try:
                from bert_vits2_tpu.ops.mrf_pallas import pack_generator_mrf

                self.mrf_packed = pack_generator_mrf(
                    params["params"]["dec"],
                    cfg.resblock_kernel_sizes,
                    cfg.resblock_dilation_sizes,
                    cfg.upsample_rates,
                    cfg.upsample_initial_channel,
                    cfg.infer_compute_dtype,
                )
            except KeyError:
                self.mrf_packed = None
        if self.mesh is not None and self.mrf_packed is not None:
            from bert_vits2_tpu.parallel import replicate

            self.mrf_packed = replicate(self.mesh, self.mrf_packed)

    def _resolve_emotion(self, emotion, reference_audio, batch: int):
        """-> emo array for the model, or None for emotion-less versions.

        V2.1 (oldVersion/V210/__init__.py:54-62): reference audio ->
        wav2vec2 1024-d vector; else integer codebook index (default 0).
        V2.2 (oldVersion/V220/__init__.py:73-78): reference audio -> CLAP
        audio feature; text prompt -> CLAP text feature; 512-d."""
        mode = self.model.cfg.emotion
        if mode == "none":
            return None
        use_extractor = reference_audio is not None or (
            mode == "clap220" and isinstance(emotion, str) and emotion
        )
        if use_extractor:
            if self.emotion_extractor is None:
                from bert_vits2_tpu.text.emotion import default_emotion_extractor

                self.emotion_extractor = default_emotion_extractor(mode)
            vec = self.emotion_extractor(
                reference_audio=reference_audio, prompt=emotion
            )
            return np.broadcast_to(
                np.asarray(vec, np.float32), (batch, len(vec))
            ).copy()
        if mode == "vq210":
            idx = 0 if emotion in (None, "") else int(float(emotion))
            return np.full((batch,), idx, np.int32)
        return np.zeros((batch, 512), np.float32)

    # ---- shape bucketing ----

    def _bucket(self, t: int) -> int:
        for b in self.text_buckets:
            if t <= b:
                return b
        return ((t + 63) // 64) * 64

    def group_key(self, req: "PreparedRequest"):
        """Batching key: requests sharing it can ride one device call.

        Includes the emo tensor's kind (shape tail + dtype) because V2.1
        engines accept either a [b] int32 codebook index or a [b, 1024]
        float vector — different jit graphs that cannot share a batch."""
        emo_kind = (
            None
            if req.emo is None
            else (req.emo.dtype.str, req.emo.shape[1:])
        )
        return (self._bucket(len(req.inputs[0])), emo_kind)

    def _frame_cap(self, t_x: int, length_scale: float) -> int:
        cap = int(t_x * self.frames_per_token * max(length_scale, 1.0))
        m = self.frame_multiple
        return max(m, ((cap + m - 1) // m) * m)

    # ---- packed host<->device transport ----
    #
    # Every per-request tensor rides in exactly TWO contiguous buffers (one
    # int32, one float32) and is sliced back apart INSIDE the jitted call:
    # a batch costs 2 H2D transfers instead of ~13 (phones/tones/langs/3x
    # bert/lens/sids/emo/4 knobs), and run_packed keeps the whole request
    # pile device-resident so every chunk is a device-side row gather — the
    # reference re-ships tensors per infer() call (infer.py:107-149).

    def _emo_kind(self, reqs) -> tuple[int, int]:
        """-> (e_int, e_f): 1/0 codebook-index column, float emo width."""
        emo0 = reqs[0].emo
        if emo0 is None:
            return 0, 0
        a = np.asarray(emo0)
        if np.issubdtype(a.dtype, np.integer):
            return 1, 0
        return 0, int(a.shape[-1])

    def _bert_offsets(self, t_x: int):
        """Per-slot float-buffer layout: the three BERT widths are NOT
        uniform across version families (V1.1 checkpoints take a 768-d
        ja_bert, ModelConfig.ja_bert_dim). -> (dims, offsets[4])."""
        cfg = self.model.cfg
        dims = (cfg.bert_dim, getattr(cfg, "ja_bert_dim", cfg.bert_dim),
                cfg.bert_dim)
        offs = [0]
        for d in dims:
            offs.append(offs[-1] + t_x * d)
        return dims, offs

    def _pack_host(self, reqs: list, t_x: int):
        """-> (ints [b, 3*t_x + 2 + e_int],
               floats [b, sum(t_x*D_j) + 4 + e_f])."""
        b = len(reqs)
        e_int, e_f = self._emo_kind(reqs)
        dims, offs = self._bert_offsets(t_x)
        ints = np.zeros((b, 3 * t_x + 2 + e_int), np.int32)
        floats = np.zeros((b, offs[-1] + 4 + e_f), np.float32)
        for i, r in enumerate(reqs):
            tl = len(r.inputs[0])
            for j in range(3):
                ints[i, j * t_x : j * t_x + tl] = r.inputs[j]
            ints[i, 3 * t_x] = tl
            ints[i, 3 * t_x + 1] = r.sid
            if e_int:
                ints[i, 3 * t_x + 2] = int(np.asarray(r.emo).reshape(-1)[0])
            for j in range(3):
                flat = np.asarray(r.inputs[3 + j], np.float32).reshape(-1)
                floats[i, offs[j] : offs[j] + tl * dims[j]] = flat
            floats[i, offs[-1] : offs[-1] + 4] = (
                r.noise_scale, r.length_scale, r.noise_scale_w, r.sdp_ratio,
            )
            if e_f:
                floats[i, offs[-1] + 4 :] = np.asarray(
                    r.emo, np.float32
                ).reshape(-1)
        return ints, floats

    def _put_pool(self, ints: np.ndarray, floats: np.ndarray):
        import jax
        import jax.numpy as jnp

        if self.mesh is None:
            self.stats["bytes_h2d"] = (
                self.stats.get("bytes_h2d", 0) + ints.nbytes + floats.nbytes
            )
            return jnp.asarray(ints), jnp.asarray(floats)
        from bert_vits2_tpu.parallel import batch_sharding

        # the pool's row dim must split evenly over `data`; zero rows are
        # fine (row gathers only ever address real requests — _pad_idx
        # repeats the last REAL row)
        n_data = self.mesh.shape.get("data", 1)
        pad = -(-ints.shape[0] // n_data) * n_data - ints.shape[0]
        if pad:
            ints = np.pad(ints, ((0, pad), (0, 0)))
            floats = np.pad(floats, ((0, pad), (0, 0)))
        self.stats["bytes_h2d"] = (
            self.stats.get("bytes_h2d", 0) + ints.nbytes + floats.nbytes
        )
        sh = batch_sharding(self.mesh)
        return jax.device_put(ints, sh), jax.device_put(floats, sh)

    def _unpack(self, ibuf, fbuf, idx, t_x: int, e_int: int, e_f: int):
        """Traced: gather rows `idx` and slice the packed layout apart."""
        dims, offs = self._bert_offsets(t_x)
        ii = ibuf[idx]
        ff = fbuf[idx]
        x, tone, lang = (ii[:, j * t_x : (j + 1) * t_x] for j in range(3))
        lens = ii[:, 3 * t_x]
        sids = ii[:, 3 * t_x + 1]
        berts = [
            ff[:, offs[j] : offs[j + 1]].reshape(-1, t_x, dims[j])
            for j in range(3)
        ]
        k0 = offs[-1]
        knobs = {
            "noise_scale": ff[:, k0],
            "length_scale": ff[:, k0 + 1],
            "noise_scale_w": ff[:, k0 + 2],
            "sdp_ratio": ff[:, k0 + 3],
        }
        if e_int:
            emo = ii[:, 3 * t_x + 2]
        elif e_f:
            emo = ff[:, k0 + 4 :]
        else:
            emo = None
        return x, lens, sids, tone, lang, berts, emo, knobs

    def _predict_fn(self, t_x: int, e_int: int, e_f: int) -> Callable:
        """Jitted duration-only pass (enc_p+sdp+dp) per text bucket — the
        cheap first half of length-aware packing."""
        key = ("predict", t_x, e_int, e_f)
        if key not in self._jitted:
            import jax

            model = self.model
            unpack = self._unpack

            @jax.jit
            def fn(params, ibuf, fbuf, idx, rng):
                x, lens, sids, tone, lang, berts, emo, knobs = unpack(
                    ibuf, fbuf, idx, t_x, e_int, e_f
                )
                return model.apply(
                    params, x, lens, sids, tone, lang, *berts, emo=emo,
                    length_scale=knobs["length_scale"],
                    noise_scale_w=knobs["noise_scale_w"],
                    sdp_ratio=knobs["sdp_ratio"],
                    method=type(model).predict_durations,
                    rngs={"noise": rng},
                )

            self._jitted[key] = fn
        return self._jitted[key]

    def _synth_fn(self, t_x: int, max_frames: int, e_int: int,
                  e_f: int) -> Callable:
        key = (t_x, max_frames, e_int, e_f)
        if key not in self._jitted:
            import jax

            model = self.model
            unpack = self._unpack

            @jax.jit
            def fn(params, mrf_packed, ibuf, fbuf, idx, rng):
                x, lens, sids, tone, lang, berts, emo, knobs = unpack(
                    ibuf, fbuf, idx, t_x, e_int, e_f
                )
                return model.apply(
                    params, x, lens, sids, tone, lang, *berts, max_frames,
                    emo=emo, noise_scale=knobs["noise_scale"],
                    length_scale=knobs["length_scale"],
                    noise_scale_w=knobs["noise_scale_w"],
                    sdp_ratio=knobs["sdp_ratio"], mrf_packed=mrf_packed,
                    method=type(model).infer, rngs={"noise": rng},
                )

            self._jitted[key] = fn
        return self._jitted[key]

    # ---- public API ----

    def warmup(
        self,
        batch_sizes: Sequence[int] = (1, 4, 16),
        buckets: Sequence[int] | None = None,
        length_scale: float = 1.0,
    ) -> int:
        """Pre-compile the (batch, bucket, worst-case frame-cap) grid plus
        the duration-predict pass per bucket. Returns the number of graphs
        compiled. Serving pads batches to powers of two (run_prepared), so
        a handful of sizes covers all arrival counts. Note: run_prepared
        picks TIGHTER caps from predicted durations (multiples of
        frame_multiple), so steady-state serving compiles those lazily on
        first sight — warmup bounds the worst case, it does not cover every
        cap."""
        import jax
        import jax.numpy as jnp

        cfg = self.model.cfg
        if cfg.emotion == "vq210":
            e_int, e_f = 1, 0
        elif cfg.emotion == "clap220":
            e_int, e_f = 0, 512
        else:
            e_int, e_f = 0, 0
        buckets = list(buckets or self.text_buckets)
        n = 0
        for t_x in buckets:
            mf = self._frame_cap(t_x, length_scale)
            fn = self._synth_fn(t_x, mf, e_int, e_f)
            self._predict_fn(t_x, e_int, e_f)  # compiles on first call
            _, offs = self._bert_offsets(t_x)
            for b in batch_sizes:
                ibuf = jnp.zeros((b, 3 * t_x + 2 + e_int), jnp.int32)
                ibuf = ibuf.at[:, 3 * t_x].set(t_x)  # x_lengths
                fbuf = jnp.zeros((b, offs[-1] + 4 + e_f), jnp.float32)
                fbuf = fbuf.at[:, offs[-1] : offs[-1] + 4].set(0.5)
                out = fn(
                    self.params, self.mrf_packed, ibuf, fbuf,
                    jnp.arange(b, dtype=jnp.int32), jax.random.key(0),
                )
                jax.block_until_ready(out)
                n += 1
        return n

    def resolve_speaker(self, speaker) -> int:
        if isinstance(speaker, str):
            return int(self.spk2id[speaker])
        return int(speaker)

    def infer(
        self,
        text: str,
        speaker,
        language: str = "ZH",
        sdp_ratio: float = 0.2,
        noise_scale: float = 0.667,
        noise_scale_w: float = 0.8,
        length_scale: float = 1.0,
        style_text: str | None = None,
        style_weight: float = 0.7,
        skip_start: bool = False,
        skip_end: bool = False,
        emotion=None,
        reference_audio=None,
        seed: int = 0,
    ) -> np.ndarray:
        """Synthesize one utterance -> float32 waveform [n_samples].

        Ref: infer.py:151-332 (incl. the 3/2-token boundary trims).
        emotion/reference_audio condition V2.1/V2.2 checkpoints (int codebook
        index or wav path / CLAP text prompt); ignored for other versions.
        """
        req = self.prepare(
            text, speaker, language=language, sdp_ratio=sdp_ratio,
            noise_scale=noise_scale, noise_scale_w=noise_scale_w,
            length_scale=length_scale, style_text=style_text,
            style_weight=style_weight, skip_start=skip_start,
            skip_end=skip_end, emotion=emotion,
            reference_audio=reference_audio, seed=seed,
        )
        return self.run_prepared([req])[0]

    def prepare(
        self,
        text: str | None,
        speaker,
        language: str = "ZH",
        segments: Sequence[tuple[str, str]] | None = None,
        sdp_ratio: float = 0.2,
        noise_scale: float = 0.667,
        noise_scale_w: float = 0.8,
        length_scale: float = 1.0,
        style_text: str | None = None,
        style_weight: float = 0.7,
        skip_start: bool = False,
        skip_end: bool = False,
        emotion=None,
        reference_audio=None,
        seed: int = 0,
    ) -> PreparedRequest:
        """Host-side half of a synthesis call (g2p + BERT + trims + emotion).

        Pass `segments=[(text, lang), ...]` instead of `text` for a
        mixed-language utterance (its per-segment features are concatenated
        into one request, ref infer.py:335-437). The result can be run alone
        or batched with other requests via `run_prepared` — this split is
        what the serving micro-batcher builds on.
        """
        if segments is None:
            inputs = get_text(text, language, self.bert_extractor,
                              style_text=style_text, style_weight=style_weight,
                              spec=self.version_spec)
            if skip_start:
                inputs = tuple(a[3:] for a in inputs)
            if skip_end:
                inputs = tuple(a[:-2] for a in inputs)
        else:
            parts = []
            n = len(segments)
            for i, (seg_text, lang) in enumerate(segments):
                seg_inputs = get_text(seg_text, lang, self.bert_extractor,
                                      style_text=style_text,
                                      style_weight=style_weight,
                                      spec=self.version_spec)
                if i > 0 or skip_start:  # trim all but the first boundary
                    seg_inputs = tuple(a[3:] for a in seg_inputs)
                if i < n - 1 or skip_end:
                    seg_inputs = tuple(a[:-2] for a in seg_inputs)
                parts.append(seg_inputs)
            inputs = tuple(np.concatenate([p[j] for p in parts], axis=0)
                           for j in range(6))
        emo = self._resolve_emotion(emotion, reference_audio, 1)
        return PreparedRequest(
            inputs=inputs, sid=self.resolve_speaker(speaker), emo=emo,
            sdp_ratio=float(sdp_ratio), noise_scale=float(noise_scale),
            noise_scale_w=float(noise_scale_w),
            length_scale=float(length_scale), seed=int(seed),
        )

    def _check_one_kind(self, reqs):
        kinds = {self.group_key(r)[1] for r in reqs}
        if len(kinds) > 1:
            raise ValueError(
                "requests mix emotion input kinds "
                f"{sorted(map(str, kinds))}; batch requests with the same "
                "group_key (codebook index vs reference-audio vector are "
                "different graphs)"
            )

    def _pad_idx(self, idx: list[int]) -> np.ndarray:
        """Pad the batch dim to a power of two (repeating the last row) so
        serve-time batches hit a small set of compiled batch shapes instead
        of one XLA compile per arrival count 1..max_batch; with a mesh, the
        batch must additionally split evenly over the `data` axis."""
        n_pad = 1 << max(len(idx) - 1, 0).bit_length()
        if self.mesh is not None:
            n_data = self.mesh.shape.get("data", 1)
            n_pad = -(-n_pad // n_data) * n_data
        return np.asarray(list(idx) + [idx[-1]] * (n_pad - len(idx)),
                          np.int32)

    def pack_requests(self, reqs: Sequence[PreparedRequest]):
        """Pack a request pile into a device-resident pool: ONE pair of H2D
        transfers for the whole pile; predict/synthesis calls then address
        rows by index (device-side gather). -> (pool, t_x, (e_int, e_f))."""
        self._check_one_kind(reqs)
        t_x = self._bucket(max(len(r.inputs[0]) for r in reqs))
        ints, floats = self._pack_host(list(reqs), t_x)
        return self._put_pool(ints, floats), t_x, self._emo_kind(reqs)

    def _predict_rows(self, pool, rows: list[int], seed: int) -> np.ndarray:
        """Duration pass over pool rows -> predicted frames [len(rows)]."""
        import jax

        (ibuf, fbuf), t_x, (e_int, e_f) = pool
        idx = self._pad_idx(list(rows))
        fn = self._predict_fn(t_x, e_int, e_f)
        frames = fn(self.params, ibuf, fbuf, idx, jax.random.key(seed))
        return np.asarray(frames)[: len(rows)]

    def predict_frames(
        self,
        reqs: Sequence[PreparedRequest],
        pool=None,
    ) -> np.ndarray:
        """Predicted output frames per request [n] via the duration-only
        pass (exact: same rng stream as the synthesis call). `pool` (from
        pack_requests over these reqs) skips re-shipping the tensors."""
        self._check_one_kind(reqs)
        if pool is None:
            pool = self.pack_requests(reqs)
        return self._predict_rows(pool, list(range(len(reqs))), reqs[0].seed)

    def run_prepared(
        self,
        reqs: Sequence[PreparedRequest],
        predicted_frames: np.ndarray | None = None,
        return_waves: bool = True,
        pool=None,
        pool_rows: Sequence[int] | None = None,
    ) -> list[np.ndarray]:
        """Synthesize prepared requests in ONE batched device call.

        All requests are padded to a shared (text bucket, frame cap); knobs
        become per-item [b] arrays. Returns trimmed float32 waveforms in
        request order. (The reference loops infer() per segment,
        hiyoriUI.py:320-339 — here a paragraph's sentences and concurrent
        HTTP requests ride one XLA call.)

        The frame cap comes from the PREDICTED durations (length-aware: the
        duration pass is <2% of synthesis cost and exact), bounded above by
        the worst-case tokens*frames_per_token heuristic; pass
        `predicted_frames` (from predict_frames) to skip re-prediction.

        `pool`/`pool_rows` (from pack_requests over a SUPERSET pile) make
        the call a pure device-side row gather — zero H2D for the chunk;
        `reqs` must then be [pile[i] for i in pool_rows].
        """
        import jax

        self._check_one_kind(reqs)
        n_req = len(reqs)
        if pool is None:
            pool = self.pack_requests(reqs)
            pool_rows = range(n_req)
        if predicted_frames is None:
            predicted_frames = self._predict_rows(
                pool, list(pool_rows), reqs[0].seed
            )
        (ibuf, fbuf), t_x, (e_int, e_f) = pool
        idx = self._pad_idx(list(pool_rows))
        # cap: predicted max, rounded up to the frame multiple, never above
        # the worst-case bound (a degenerate duration model cannot OOM us)
        m = self.frame_multiple
        cap = -(-int(max(predicted_frames.max(), 1)) // m) * m
        max_frames = min(
            max(cap, m),
            self._frame_cap(t_x, max(r.length_scale for r in reqs)),
        )
        fn = self._synth_fn(t_x, max_frames, e_int, e_f)
        wave, _, _, y_len = fn(
            self.params, self.mrf_packed, ibuf, fbuf, idx,
            jax.random.key(reqs[0].seed),
        )
        y_len = np.asarray(y_len)
        self.stats["frames_capacity"] += len(idx) * max_frames
        self.stats["frames_delivered"] += int(
            np.minimum(y_len[:n_req], max_frames).sum()
        )
        if not return_waves:
            # benchmarking/monitoring: leave the waveforms on device (the
            # y_len fetch above already forced execution); return lengths
            # in samples. Over this image's dev tunnel a [b, cap*512] f32
            # waveform is tens of MB per call — dominating any timing.
            return [
                min(int(y_len[i]), max_frames) * self.hop_length
                for i in range(n_req)
            ]
        wave = np.asarray(wave)
        return [
            wave[i, : min(int(y_len[i]), max_frames) * self.hop_length]
            for i in range(n_req)
        ]

    def plan_packed(self, frames: np.ndarray, max_batch: int):
        """Length-sorted chunk plan: [(rows, frame_cap), ...] — the pure
        scheduling half of run_packed, reusable by the bench's device-basis
        measurement. `frames` are per-request predicted frame counts."""
        order = sorted(range(len(frames)), key=lambda i: -int(frames[i]))
        plan = []
        m = self.frame_multiple
        for lo in range(0, len(order), max_batch):
            rows = order[lo : lo + max_batch]
            cap = -(-int(max(int(frames[rows[0]]), 1)) // m) * m
            plan.append((rows, max(cap, m)))
        return plan

    def run_packed(
        self,
        reqs: Sequence[PreparedRequest],
        max_batch: int = 16,
        return_waves: bool = True,
    ) -> list[np.ndarray]:
        """Length-aware batched synthesis: predict every request's frame
        count, sort by it, and cut the batch into <=max_batch chunks so
        each chunk's frame cap hugs its own longest item — short utterances
        stop paying for the longest one in the pile (delivered throughput,
        VERDICT r3 item 5). Returns waveforms in request order.

        The pile ships to the device ONCE (pack_requests); the whole-pile
        prediction orders the requests, and each chunk re-predicts through
        the same pool so its cap is exact for the chunk's own batch layout
        (the SDP noise stream is positional)."""
        self._check_one_kind(reqs)
        pool = self.pack_requests(reqs)
        frames = self.predict_frames(reqs, pool=pool)
        waves: dict[int, np.ndarray] = {}
        for rows, _ in self.plan_packed(frames, max_batch):
            out = self.run_prepared(
                [reqs[i] for i in rows], return_waves=return_waves,
                pool=pool, pool_rows=rows,
            )
            waves.update(zip(rows, out))
        return [waves[i] for i in range(len(reqs))]

    def infer_multilang(
        self,
        segments: Sequence[tuple[str, str]],
        speaker,
        sdp_ratio: float = 0.2,
        noise_scale: float = 0.667,
        noise_scale_w: float = 0.8,
        length_scale: float = 1.0,
        seed: int = 0,
    ) -> np.ndarray:
        """Mixed-language synthesis: concat per-segment features (with
        boundary trims) into ONE model call. Ref: infer.py:335-437."""
        req = self.prepare(
            None, speaker, segments=segments, sdp_ratio=sdp_ratio,
            noise_scale=noise_scale, noise_scale_w=noise_scale_w,
            length_scale=length_scale, seed=seed,
        )
        return self.run_prepared([req])[0]

    def infer_batch(
        self,
        texts: Sequence[str],
        speakers: Sequence,
        language="ZH",
        sdp_ratio: float = 0.2,
        noise_scale: float = 0.667,
        noise_scale_w: float = 0.8,
        length_scale: float = 1.0,
        seed: int = 0,
        max_batch: int = 16,
    ) -> list:
        """Batched synthesis: utterances share device calls with frame caps
        taken from their PREDICTED durations — piles larger than max_batch
        are length-sorted and chunked (run_packed) so short texts never pad
        to the longest one's frames. (The reference loops infer() per
        segment, hiyoriUI.py:320-339.) Returns trimmed float32 waveforms.

        `language` and the four knobs accept either one value for the whole
        batch or a per-item sequence.
        """
        n = len(texts)

        def per_item(v, cast):
            if isinstance(v, (str, int, float)):
                return [cast(v)] * n
            return [cast(x) for x in v]

        langs = per_item(language, str)
        knobs = {
            "sdp_ratio": per_item(sdp_ratio, float),
            "noise_scale": per_item(noise_scale, float),
            "noise_scale_w": per_item(noise_scale_w, float),
            "length_scale": per_item(length_scale, float),
        }
        reqs = [
            self.prepare(
                texts[i], speakers[i], language=langs[i], seed=seed,
                **{k: v[i] for k, v in knobs.items()},
            )
            for i in range(n)
        ]
        if len(reqs) <= max_batch:
            return self.run_prepared(reqs)
        return self.run_packed(reqs, max_batch=max_batch)
