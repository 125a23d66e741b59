"""Benchmark: synthesis + training throughput on one chip.

Driver contract: the LAST complete JSON line on stdout is the result. To make
that robust against external timeouts (round 2 died mid-train-compile with
zero output, BENCH_r02.json rc=124), this file is split into

  - an ORCHESTRATOR (main, no jax import) that runs each stage in its own
    subprocess with a hard process-group-kill timeout and re-prints the full
    cumulative JSON line after EVERY stage, and
  - STAGES (--stage quick|headline|train|sweep) that do the jax work and
    print their own partial result as a JSON line.

Stage order is by value-per-second under a cold compilation cache (the
committed-cache experiment failed: XLA:CPU AOT entries are machine-feature
locked, and the remote TPU train-step compile is multi-minute):

  quick     small synthesis shape, fastest compile -> guarantees a number
  headline  peak batched synthesis (b=16 x 1024 frames) + MFU
  train     full-geometry fused GAN step (bf16, SLM on)
  sweep     batch x frame-cap capacity grid (first to be sacrificed)

Primary metric is PEAK batched synthesis throughput in audio-seconds per
wall-second per chip, accounted at bucket capacity — every padded frame is
genuinely synthesized (static shapes), so this is the chip's work rate.
Alongside it the same JSON reports the honest serving numbers:

  delivered_audio_s_per_s  sum(y_lengths)-based throughput at a realistic
                           ~3.5 frames/token speech rate (no trained
                           checkpoint ships in this image, so durations are
                           length_scale-calibrated to match real speech)
  padding_efficiency       delivered / capacity for the headline shape
  mfu_model_pct            analytic model FLOPs / wall / peak(chip)
  train                    steps/s and utterance audio-s/s consumed
                           (reference hot loop train_ms.py:422-607)

North-star baseline is 10x realtime per chip (BASELINE.md):
vs_baseline = peak / 10.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1500"))
T0 = time.monotonic()

# bf16 peak TFLOP/s per chip by device_kind substring
PEAK_TFLOPS = [
    ("v6", 918.0), ("trillium", 918.0),
    ("v5p", 459.0), ("v5 p", 459.0),
    ("v5e", 197.0), ("v5 lite", 197.0), ("v5litepod", 197.0),
    ("v4", 275.0),
]


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def budget_left() -> float:
    return BUDGET_S - (time.monotonic() - T0)


def peak_tflops(device_kind: str) -> float | None:
    k = device_kind.lower()
    for sub, v in PEAK_TFLOPS:
        if sub in k:
            return v
    return None


# --------------------------------------------------------------------------
# orchestrator
# --------------------------------------------------------------------------

def emit(out: dict) -> None:
    """Print the full cumulative result as one JSON line (driver contract:
    last JSON line wins, so every emit must be complete and parseable)."""
    value = out.get("value", 0.0)
    print(json.dumps({
        "metric": "audio_seconds_per_sec_per_chip",
        "value": value,
        "unit": "audio-s/s/chip (peak, bucket capacity)",
        "vs_baseline": round(value / 10.0, 3),
        "notes": (
            "peak counts every synthesized bucket frame (static shapes); "
            "delivered runs the length-aware packed serving path with "
            "duration-predicted frame caps. D2H waveform transfer excluded "
            "(axon dev tunnel, not PCIe). Wall numbers pay the relay's "
            "per-dispatch round trip (relay_rtt_ms, varies sub-ms..0.4s "
            "between runs); *_rtt_corrected are the device work rates a "
            "local deployment gets."
        ),
        **{k: v for k, v in out.items() if k != "value"},
    }), flush=True)


def run_stage(stage: str, timeout_s: float, extra: list[str] | None = None,
              _cmd: list[str] | None = None, _min_timeout: float = 30.0):
    """Run one bench stage in its own process group with a hard timeout.

    Returns the stage's parsed JSON dict, or {"skipped"/"error": ...}.
    Subprocess isolation means a hung/multi-minute XLA compile can be killed
    without losing already-emitted results, and sequential stages never
    contend for the single TPU chip. _cmd/_min_timeout are test hooks.
    """
    if timeout_s < _min_timeout:
        return {"skipped": f"bench budget exhausted ({budget_left():.0f}s left)"}
    cmd = _cmd or [sys.executable, os.path.abspath(__file__), "--stage", stage]
    cmd += extra or []
    log(f"[bench] stage {stage} (timeout {timeout_s:.0f}s) ...")
    t0 = time.monotonic()
    # stage stdout goes to a TEMP FILE, not a pipe: stages emit partial
    # JSON lines as they go (e.g. train's wall numbers before the device-
    # loop compile), and a kill mid-stage must not lose what was already
    # measured (VERDICT r4: train_device killed at its cap -> whole story
    # lost; a PIPE's buffered data is unrecoverable after TimeoutExpired)
    import tempfile

    killed = False
    with tempfile.TemporaryFile() as out_f:
        p = subprocess.Popen(cmd, stdout=out_f, stderr=sys.stderr,
                             start_new_session=True, cwd=REPO)
        try:
            p.wait(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            try:
                os.killpg(p.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
            p.wait()
            killed = True
            log(f"[bench] stage {stage} KILLED at {timeout_s:.0f}s")
        out_f.seek(0)
        out_b = out_f.read()
    dt = time.monotonic() - t0
    if not killed and p.returncode != 0:
        return {"error": f"{stage} subprocess rc={p.returncode}"}
    for line in reversed(out_b.decode(errors="replace").strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                d = json.loads(line)
                if killed:
                    d["stage_killed_at_s"] = int(timeout_s)
                    log(f"[bench] stage {stage}: salvaged partial result")
                else:
                    log(f"[bench] stage {stage} done in {dt:.0f}s")
                return d
            except json.JSONDecodeError:
                continue
    if killed:
        return {"skipped": f"{stage} exceeded {int(timeout_s)}s stage budget"}
    return {"error": f"{stage} produced no JSON line"}


def main() -> None:
    out: dict = {}

    # -- train_compile overlap: the train stage's two compiles are multi-
    # minute on a cold cache and were what killed the round-4 device-side
    # number. Compilation happens on the remote compile service (verified:
    # a second process can attach + execute concurrently over the relay),
    # so warm the persistent cache in the BACKGROUND while quick/headline
    # own the chip for timing. ---------------------------------------------
    tc = None
    tc_sig = tc_out_path = None
    if budget_left() > 420 and os.environ.get("BENCH_NO_OVERLAP") != "1":
        import tempfile

        log("[bench] spawning train_compile in background ...")
        tc_sig = os.path.join(
            tempfile.gettempdir(), f"bench_chip_free_{os.getpid()}")
        if os.path.exists(tc_sig):
            os.unlink(tc_sig)
        tc_out_path = os.path.join(
            tempfile.gettempdir(), f"bench_train_bg_{os.getpid()}.jsonl")
        tc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--stage", "train_compile", "--signal", tc_sig],
            stdout=open(tc_out_path, "wb"), stderr=sys.stderr,
            start_new_session=True, cwd=REPO,
        )

    # -- quick: smallest useful shape; guarantees the driver gets a number --
    q = run_stage("quick", min(budget_left() - 60, 900))
    if "value" in q:
        out.update(q)
        out["quick_shape"] = out.pop("shape", None)
        emit(out)
    else:
        out["quick"] = q
        log(f"[bench] quick stage gave no value: {q}")

    # -- headline: peak shape + MFU. Reserve room for the (cache-warm,
    # ~3 min) train stage behind it; stage_headline banks partial JSON
    # lines as it goes, so a budget kill here still salvages the capacity
    # and packed-serving numbers measured so far. --------------------------
    reserve = 300 if tc is not None else 120
    h = run_stage("headline", min(budget_left() - reserve, 1100))
    if "value" in h:
        out.update(h)
        out["headline_shape"] = out.pop("shape", None)
        # device-loop capacities are relay-immune and keyed BY SHAPE;
        # promote the best one to the headline value when it beats the
        # relay-taxed wall number, attributing the shape correctly
        # (ADVICE r4: the old code promoted the 64x512 peak while
        # headline_shape still said 16x1024)
        dl = out.get("device_loop") or {}
        best = max(dl.items(), key=lambda kv: kv[1] or 0.0, default=None)
        if best and best[1] and best[1] > out.get("value", 0):
            out["value"] = best[1]
            out["headline_shape"] = best[0]
            out["value_basis"] = "device-loop (wall was relay-bound)"
        emit(out)
    else:
        out["headline"] = h
        emit(out)

    # -- train: full-geometry fused GAN step. Preferred path: the background
    # process (which already paid setup + trace + compile during quick/
    # headline) measures on the chip-free signal. Fallback: the foreground
    # stage, hard-capped and partial-banking. -------------------------------
    bg_train = None
    if tc is not None:
        # the chip is free now — signal the background train process to run
        # the measurements itself over its OWN traced/lowered executables
        # (a fresh foreground process would pay multi-minute re-tracing the
        # leftover budget does not have), and wait for it
        with open(tc_sig, "w") as f:
            f.write("go\n")
        wait_s = max(budget_left() - 120, 0)
        log(f"[bench] chip free; waiting for background train "
            f"(<= {wait_s:.0f}s) ...")
        try:
            tc.wait(timeout=wait_s)
        except subprocess.TimeoutExpired:
            try:
                os.killpg(tc.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
            tc.wait()
            log("[bench] background train killed (budget)")
        try:
            with open(tc_out_path) as f:
                for line in f.read().strip().splitlines():
                    line = line.strip()
                    if line.startswith("{"):
                        try:
                            bg_train = json.loads(line)
                        except json.JSONDecodeError:
                            continue
        except OSError:
            pass
        if bg_train is not None and "steps_per_s" in bg_train:
            log("[bench] background train measurements landed")
            out["train"] = bg_train
            emit(out)
    if not (isinstance(out.get("train"), dict)
            and "steps_per_s" in out["train"]):
        # foreground fallback (background crashed / was killed before
        # measuring / overlap disabled); its caches may still be warm
        out["train"] = run_stage("train", min(budget_left() - 90, 1100))
        if "steps_per_s" not in out["train"] and budget_left() > 500:
            # the remote compile service stalls sporadically; one retry
            # often lands on a healthy window (executables are
            # persistent-cached)
            log("[bench] retrying train stage ...")
            retry = run_stage("train", min(budget_left() - 90, 900))
            if "steps_per_s" in retry:
                out["train"] = retry
        emit(out)

    # -- train_device fallback: only when the inline device-loop didn't
    # land (e.g. its compile was what got the train stage killed) ----------
    if (isinstance(out.get("train"), dict)
            and "steps_per_s" in out["train"]
            and "steps_per_s_device" not in out["train"]):
        # cold-cache loop compile is ~15 min remotely; with a warm
        # persistent cache this stage is ~1 min
        td = run_stage("train_device", min(budget_left() - 75, 1400))
        if "steps_per_s_device" in td:
            out["train"].update(td)
            fl = out["train"].get("step_flops")
            peak = peak_tflops(out.get("device_kind", ""))
            if fl and peak:
                tf = fl * td["steps_per_s_device"] / 1e12
                out["train"]["tflops_per_s_device"] = round(tf, 2)
                out["train"]["hw_flops_pct_device"] = round(
                    100.0 * tf / peak, 2)
        else:
            out["train"]["train_device"] = td
        emit(out)

    # -- sweep: first to be sacrificed -------------------------------------
    sweep_budget = budget_left() - 45
    if sweep_budget > 120:
        s = run_stage("sweep", sweep_budget,
                      extra=["--sweep-budget", str(int(sweep_budget - 30))])
        out["sweep"] = s.get("sweep", s)
        if "sweep_delivered" in s:
            out["sweep_delivered"] = s["sweep_delivered"]
        if "sweep_rtt_corrected" in s:
            out["sweep_rtt_corrected"] = s["sweep_rtt_corrected"]
            best_c = max(
                (v for v in s["sweep_rtt_corrected"].values()
                 if isinstance(v, (int, float))),
                default=None,
            )
            if best_c and best_c > out.get("value_rtt_corrected", 0.0):
                out["value_rtt_corrected"] = best_c
        if isinstance(out["sweep"], dict):
            # the metric is PEAK capacity: take the best measured shape
            # (serving picks its own batch/bucket; 32x512 routinely beats
            # the 16x1024 headline shape)
            best = max(
                ((v, k) for k, v in out["sweep"].items()
                 if isinstance(v, (int, float))),
                default=None,
            )
            if best and best[0] > out.get("value", 0.0):
                out["value"] = best[0]
                out["peak_shape"] = best[1]
        emit(out)


# --------------------------------------------------------------------------
# stage implementations (each runs in its own subprocess)
# --------------------------------------------------------------------------

def _jax_setup():
    import jax

    # persistent compilation cache: repeat runs skip multi-minute compiles.
    # Keyed per machine (tools/_timing.cache_dir): XLA:CPU AOT entries from
    # a different host's CPU flags load with SIGILL risk.
    try:
        from tools._timing import cache_dir

        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", cache_dir()),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception as e:  # noqa: BLE001 - cache is an optimization only
        log(f"compilation cache unavailable: {e}")
    return jax


def _tree_cache_path(name: str) -> str:
    from tools._timing import cache_dir

    d = cache_dir()
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, name)


def _load_tree_cache(name: str):
    """Load a nested dict-of-arrays tree saved by _save_tree_cache, or
    None. Init trees here are deterministic functions of seed 0, so the
    cache never goes stale for a given model geometry — the filename is
    the contract (bump it if the geometry changes)."""
    import numpy as np

    path = _tree_cache_path(name)
    if not os.path.exists(path):
        return None
    try:
        from flax.traverse_util import unflatten_dict

        with np.load(path) as z:
            flat = {tuple(k.split("\x1f")): z[k] for k in z.files}
        return unflatten_dict(flat)
    except Exception as e:  # noqa: BLE001 - cache is an optimization
        log(f"tree cache {name} unreadable ({e}); re-initializing")
        return None


def _save_tree_cache(name: str, tree) -> None:
    import numpy as np

    try:
        from flax.traverse_util import flatten_dict

        flat = {"\x1f".join(k): np.asarray(v)
                for k, v in flatten_dict(tree).items()}
        np.savez(_tree_cache_path(name), **flat)
    except Exception as e:  # noqa: BLE001
        log(f"tree cache {name} not saved: {e}")


def _fast_init(init_fn, *args, seed: int = 0, **kwargs):
    """Random params with the exact STRUCTURE of init_fn's output, built
    from jax.eval_shape — tracing only, no forward compute. flax's real
    init runs a full eager forward, which on this 2-vCPU host costs
    minutes per stage subprocess; for benchmarking the values only need to
    be finite and well-scaled (random weights are FLOP-identical, the same
    contract every stage here already uses). Leaf rules: weight-norm g /
    LayerNorm gamma -> 1; bias/beta/log-scales -> 0; everything else
    N(0, 0.02)."""
    import jax
    import numpy as np
    from jax.tree_util import tree_map_with_path

    shapes = jax.eval_shape(init_fn, *args, **kwargs)
    rng = np.random.default_rng(seed)

    def leaf_name(path) -> str:
        for k in reversed(path):
            if hasattr(k, "key"):
                return str(k.key)
        return ""

    def make(path, sd):
        name = leaf_name(path)
        if name in ("g", "gamma", "scale"):
            return np.ones(sd.shape, sd.dtype)
        if name in ("bias", "beta", "logs", "m"):
            return np.zeros(sd.shape, sd.dtype)
        return (rng.standard_normal(sd.shape) * 0.02).astype(sd.dtype)

    return tree_map_with_path(make, shapes)


class _InferBench:
    """Shared infer-bench harness: full V2.3 model, bf16 serving dtype,
    fused Pallas MRF vocoder tail (ops/mrf_pallas.py)."""

    def __init__(self):
        import dataclasses

        jax = _jax_setup()
        import jax.numpy as jnp

        from __graft_entry__ import _full_config, _text_batch
        from bert_vits2_tpu.models import Synthesizer
        from bert_vits2_tpu.ops.mrf_pallas import pack_generator_mrf

        self.jax, self.jnp = jax, jnp
        self.dev = jax.devices()[0]
        cfg = dataclasses.replace(_full_config(),
                                  infer_compute_dtype="bfloat16")
        self.cfg = cfg
        self.model = Synthesizer(cfg)
        self.sr, self.hop = 44100, cfg.hop_length
        self.t_x = 128
        self._text_batch = _text_batch
        self.batches: dict[int, dict] = {}

        b0 = 16
        batch = _text_batch(cfg, b0, self.t_x)
        self.batches[b0] = batch
        spec = jnp.zeros((b0, 32, cfg.spec_channels), jnp.float32)
        init_rngs = {"params": jax.random.key(0), "noise": jax.random.key(1),
                     "dropout": jax.random.key(2)}
        # structure-exact random init via eval_shape (_fast_init): a real
        # eager flax init runs the full forward on this 2-vCPU host
        # (minutes) or dispatches thousands of tiny ops over the axon relay.
        # Cached on disk so only the first stage subprocess pays even the
        # tracing cost.
        params = _load_tree_cache("bench_infer_params.npz")
        if params is None:
            params = _fast_init(lambda: self.model.init(
                init_rngs, batch["x"], batch["x_lengths"], spec,
                jnp.asarray([32] * b0), batch["sid"], batch["tone"],
                batch["language"], batch["bert"], batch["ja_bert"],
                batch["en_bert"], deterministic=True))
            _save_tree_cache("bench_infer_params.npz", params)
        self.params = jax.device_put(params, self.dev)
        self.mrf_packed = jax.device_put(
            pack_generator_mrf(
                params["params"]["dec"], cfg.resblock_kernel_sizes,
                cfg.resblock_dilation_sizes, cfg.upsample_rates,
                cfg.upsample_initial_channel, cfg.infer_compute_dtype),
            self.dev)

    def measure_rtt(self) -> float:
        """Median sync round trip of a trivial device op — the per-dispatch
        cost this image's axon relay adds to EVERY call. Varies run to run
        (sub-ms to ~0.4 s observed); reported so wall numbers can be
        reconciled across relay conditions."""
        import numpy as np

        jax, jnp = self.jax, self.jnp
        tiny = jax.jit(lambda x: x + 1.0)
        xt = jax.device_put(jnp.zeros((8,), jnp.float32), self.dev)
        np.asarray(tiny(xt))  # compile
        ts = []
        for _ in range(10):
            t0 = time.perf_counter()
            np.asarray(tiny(xt))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    def measure_h2d_bw(self) -> float:
        """Host->device throughput (bytes/s) of this image's dev tunnel —
        tens of MB/s here vs ~16 GB/s on a real deployment's PCIe, so input
        shipping dominates any serving-path wall time."""
        import numpy as np

        jax = self.jax
        x = np.zeros((8 << 20,), np.float32)  # 32 MB
        jax.block_until_ready(jax.device_put(x, self.dev))  # warm path
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(jax.device_put(x, self.dev))
            ts.append(time.perf_counter() - t0)
        return x.nbytes / sorted(ts)[1]

    def make_synth(self, max_frames: int, length_scale: float):
        from bert_vits2_tpu.models import Synthesizer

        model = self.model

        @self.jax.jit
        def synth(params, batch, rng, mrf_packed):
            wave, _, _, y_lengths = model.apply(
                params, batch["x"], batch["x_lengths"], batch["sid"],
                batch["tone"], batch["language"], batch["bert"],
                batch["ja_bert"], batch["en_bert"], max_frames,
                length_scale=length_scale, mrf_packed=mrf_packed,
                method=Synthesizer.infer, rngs={"noise": rng})
            return wave, y_lengths

        return synth

    def run_shape_device(self, b: int, max_frames: int,
                         length_scale: float) -> float:
        """Relay-immune capacity: n synthesis calls inside ONE jitted
        lax.fori_loop (traced trip count — single compile), difference-
        timed. -> audio-s/s at bucket capacity, pure device time."""
        import numpy as np

        jax, jnp = self.jax, self.jnp
        from bert_vits2_tpu.models import Synthesizer

        if b not in self.batches:
            self.batches[b] = self._text_batch(self.cfg, b, self.t_x)
        bt = self.batches[b]
        model = self.model

        @jax.jit
        def loop(params, batch, rng, mrf_packed, n):
            def body(i, acc):
                wave, _, _, y_lengths = model.apply(
                    params, batch["x"], batch["x_lengths"], batch["sid"],
                    batch["tone"], batch["language"], batch["bert"],
                    batch["ja_bert"], batch["en_bert"], max_frames,
                    length_scale=length_scale, mrf_packed=mrf_packed,
                    method=Synthesizer.infer,
                    rngs={"noise": jax.random.fold_in(rng, i)})
                return acc + jnp.sum(wave[:, ::4096].astype(jnp.float32))

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        rng = jax.random.key(3)

        def t(n):
            t0 = time.perf_counter()
            np.asarray(loop(self.params, bt, rng, self.mrf_packed,
                            jnp.int32(n)))
            return time.perf_counter() - t0

        n1, n2 = 2, 8
        np.asarray(loop(self.params, bt, rng, self.mrf_packed,
                        jnp.int32(n1)))  # compile
        t1 = min(t(n1) for _ in range(2))
        t2 = min(t(n2) for _ in range(2))
        dt = max((t2 - t1) / (n2 - n1), 1e-6)
        return b * max_frames * self.hop / self.sr / dt

    def run_shape(self, b: int, max_frames: int, length_scale: float,
                  iters: int):
        """-> (capacity audio-s/s, delivered audio-s/s, dt, compiled|None)."""
        import numpy as np

        jax, jnp = self.jax, self.jnp
        if b not in self.batches:
            self.batches[b] = self._text_batch(self.cfg, b, self.t_x)
        bt = self.batches[b]
        fn = self.make_synth(max_frames, length_scale)
        rng = jax.random.key(3)
        wave, y_len = fn(self.params, bt, rng, self.mrf_packed)  # compile
        y_len_h = np.minimum(np.asarray(y_len), max_frames)
        t0 = time.perf_counter()
        for i in range(iters):
            wave, y_len = fn(self.params, bt, jax.random.fold_in(rng, i),
                             self.mrf_packed)
        # drain with a SCALAR transfer: the waveform itself is tens of MB,
        # which over the axon dev tunnel takes seconds and swamps device
        # time (PCIe on a real deployment makes it negligible)
        np.asarray(jnp.sum(wave.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / iters
        capacity = b * max_frames * self.hop / self.sr / dt
        delivered = float(y_len_h.sum()) * self.hop / self.sr / dt
        compiled = None
        try:
            compiled = fn.lower(self.params, bt, rng,
                                self.mrf_packed).compile()
        except Exception:  # noqa: BLE001 - cost analysis is best-effort
            pass
        return capacity, delivered, dt, compiled


def stage_quick() -> dict:
    """Small shape, fastest compile — the guaranteed-number stage."""
    bench = _InferBench()
    b, mf = 8, 512
    log(f"quick shape ({b} x {bench.t_x} tokens x {mf} frames) ...")
    capacity, delivered, dt, _ = bench.run_shape(b, mf, 3.5, 8)
    rtt = bench.measure_rtt()
    dt_dev = max(dt - rtt, dt * 0.05)
    return {
        "value": round(capacity, 3),
        "value_rtt_corrected": round(capacity * dt / dt_dev, 3),
        "relay_rtt_ms": round(rtt * 1e3, 1),
        "delivered_audio_s_per_s": round(delivered, 3),
        "padding_efficiency": round(delivered / capacity, 4),
        "shape": f"{b}x{mf}",
        "device_kind": bench.dev.device_kind,
    }


def _packed_serving_run(bench, n_req: int = 64, max_batch: int = 16,
                        iters: int = 2, base: dict | None = None) -> dict:
    """Length-aware packed serving measurement (TTSEngine.run_packed):
    a heterogeneous pile of requests (token lengths ~U[32, t_x]), predicted
    durations pick per-chunk frame caps, chunks are length-sorted. This is
    the DELIVERED number a deployment buys — unlike the fixed-shape
    capacity loop, padding waste is real work lost (VERDICT r3 item 5).

    Two bases (VERDICT r4 weak #1 — the wall number alone was drowned by
    this image's dev tunnel):
      wall        real run_packed calls: the pile ships once per iteration
                  (TWO fused H2D buffers), then per-chunk device calls
      device      the SAME chunk schedule (identical row sets and frame
                  caps) baked into one jitted program over the device-
                  resident pool, fori_loop-difference timed — zero relay
                  dispatch, zero H2D; what local dispatch gets
    """
    import numpy as np

    from bert_vits2_tpu.infer.api import PreparedRequest, TTSEngine

    cfg = bench.cfg
    jax, jnp = bench.jax, bench.jnp
    # one text bucket: text-dim padding is cheap (enc_p is <2% of FLOPs);
    # the frame caps carry the packing savings. Keeps the stage to ~1
    # predict + ~4 synth compiles inside the headline budget.
    engine = TTSEngine(
        bench.model, bench.params,
        text_buckets=(bench.t_x,), frames_per_token=6,
    )
    rng = np.random.default_rng(7)
    reqs = []
    for i in range(n_req):
        t = int(rng.integers(32, bench.t_x + 1))
        inputs = (
            rng.integers(1, cfg.n_vocab, t).astype(np.int32),
            rng.integers(0, cfg.num_tones, t).astype(np.int32),
            rng.integers(0, cfg.num_languages, t).astype(np.int32),
            rng.normal(size=(t, cfg.bert_dim)).astype(np.float32),
            rng.normal(size=(t, cfg.bert_dim)).astype(np.float32),
            rng.normal(size=(t, cfg.bert_dim)).astype(np.float32),
        )
        reqs.append(PreparedRequest(
            inputs=inputs, sid=int(rng.integers(0, cfg.n_speakers)),
            length_scale=3.5,
        ))
    # host-side pack cost, measured alone: every run_packed call re-packs
    # the pile into the two transport buffers (~100 MB of numpy copies on
    # this 2-vCPU host) — a real per-batch serving cost that the rtt+bytes
    # correction model was silently attributing to the device (VERDICT r4
    # weak #1's unexplained residual)
    t0p = time.perf_counter()
    t_x0 = engine._bucket(max(len(r.inputs[0]) for r in reqs))
    engine._pack_host(list(reqs), t_x0)
    pack_s = time.perf_counter() - t0p
    # compile + warm (waveforms stay on device: a [16, cap*512] f32 wave is
    # tens of MB and this image's dev tunnel would dominate the timing; a
    # deployment's PCIe D2H is negligible — same accounting as the
    # capacity metric's scalar drain)
    lens = engine.run_packed(reqs, max_batch=max_batch, return_waves=False)
    engine.stats = {"frames_capacity": 0, "frames_delivered": 0,
                    "bytes_h2d": 0}
    n_chunks = -(-n_req // max_batch)
    t0 = time.perf_counter()
    for _ in range(iters):
        lens = engine.run_packed(reqs, max_batch=max_batch,
                                 return_waves=False)
    dt = (time.perf_counter() - t0) / iters
    delivered_s = sum(lens) / bench.sr
    eff = (engine.stats["frames_delivered"]
           / max(engine.stats["frames_capacity"], 1))
    rtt = bench.measure_rtt()
    bw = bench.measure_h2d_bw()
    bytes_per_iter = engine.stats["bytes_h2d"] / iters
    # wall time over the dev tunnel pays: one pile-predict call, then per
    # chunk one predict + one synth call — each call being a dispatch AND a
    # blocking result fetch (~2 round trips) — plus the 2 pool device_puts
    # and shipping the packed pile's bytes once (PCIe does the same bytes
    # in ~10 ms). Subtract the measured costs for the serving rate a local
    # deployment gets; delivered_audio_s_per_s_device below is the direct
    # measurement this estimate is checked against.
    n_calls = 1 + 2 * n_chunks
    overhead = rtt * (2 * n_calls + 2) + bytes_per_iter / bw + pack_s
    dt_dev = max(dt - overhead, dt * 0.02)
    out = {
        "delivered_audio_s_per_s": round(delivered_s / dt, 3),
        "delivered_audio_s_per_s_local_est": round(delivered_s / dt_dev, 3),
        "padding_efficiency": round(eff, 4),
        "relay_rtt_ms": round(rtt * 1e3, 1),
        "h2d_MB_per_s": round(bw / 1e6, 1),
        "h2d_MB_per_iter": round(bytes_per_iter / 1e6, 1),
        "host_pack_s_per_iter": round(pack_s, 3),
        "workload": f"{n_req} reqs x U[32,{bench.t_x}] tokens, "
                    f"max_batch {max_batch}, length-sorted chunks",
    }

    # partial: wall numbers are banked before the schedule-graph compile
    # (a budget kill mid-compile must not lose them)
    print(json.dumps({**(base or {}), **out}), flush=True)

    # ---- device-basis: same schedule, one jitted program, loop-timed ----
    pool = engine.pack_requests(reqs)
    frames = engine.predict_frames(reqs, pool=pool)
    plan = engine.plan_packed(frames, max_batch)
    (ibuf, fbuf), t_x, (e_int, e_f) = pool
    ls_bound = engine._frame_cap(t_x, 3.5)
    idxs = tuple(jnp.asarray(engine._pad_idx(rows)) for rows, _ in plan)
    caps = [min(cap, ls_bound) for _, cap in plan]
    model = bench.model

    pred_fn = engine._predict_fn(t_x, e_int, e_f)
    all_idx = jnp.asarray(engine._pad_idx(list(range(n_req))))

    def schedule(params, mrf, ibuf, fbuf, idxs, rng):
        # pile predict (the scheduling pass) + every chunk synth, exactly
        # the run_packed policy with the measured plan baked in
        tot = pred_fn(params, ibuf, fbuf, all_idx,
                      rng).astype(jnp.float32).sum() * 1e-9
        for i, (idx, cap) in enumerate(zip(idxs, caps)):
            x, lens_, sids, tone, lang, berts, emo, knobs = engine._unpack(
                ibuf, fbuf, idx, t_x, e_int, e_f
            )
            wave, _, _, y_len = model.apply(
                params, x, lens_, sids, tone, lang, *berts, cap,
                emo=emo, noise_scale=knobs["noise_scale"],
                length_scale=knobs["length_scale"],
                noise_scale_w=knobs["noise_scale_w"],
                sdp_ratio=knobs["sdp_ratio"], mrf_packed=mrf,
                method=type(model).infer,
                rngs={"noise": jax.random.fold_in(rng, i)},
            )
            tot = tot + jnp.sum(wave[:, ::8192].astype(jnp.float32))
        return tot

    @jax.jit
    def loop(params, mrf, ibuf, fbuf, idxs, rng, n):
        def body(i, acc):
            return acc + schedule(params, mrf, ibuf, fbuf, idxs,
                                  jax.random.fold_in(rng, i))

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    try:
        log("packed serving device-loop ...")
        key = jax.random.key(9)

        def t(n):
            t0 = time.perf_counter()
            np.asarray(loop(bench.params, bench.mrf_packed, ibuf, fbuf,
                            idxs, key, jnp.int32(n)))
            return time.perf_counter() - t0

        np.asarray(loop(bench.params, bench.mrf_packed, ibuf, fbuf, idxs,
                        key, jnp.int32(1)))  # compile
        n1, n2 = 1, 3
        t1 = min(t(n1) for _ in range(2))
        t2 = min(t(n2) for _ in range(2))
        dt_loop = max((t2 - t1) / (n2 - n1), 1e-6)
        cap_frames = sum(len(ix) * cap for ix, cap in zip(idxs, caps))
        del_frames = sum(
            int(np.minimum(frames[list(rows)], cap).sum())
            for (rows, _), cap in zip(plan, caps)
        )
        out["delivered_audio_s_per_s_device"] = round(
            del_frames * bench.hop / bench.sr / dt_loop, 3)
        out["padding_efficiency_device"] = round(
            del_frames / max(cap_frames, 1), 4)
        out["device_schedule"] = (
            f"{len(plan)} chunks, caps {caps}, b {[len(ix) for ix in idxs]}"
        )
    except Exception as e:  # noqa: BLE001 - the remote compile service can
        # refuse the multi-shape schedule graph; wall numbers stand alone
        log(f"packed serving device-loop failed: {e}")
        out["device_schedule_error"] = str(e)[:200]
    return out


def stage_headline() -> dict:
    """Peak shape (b=16 x 1024-frame cap) + the two MFU accountings +
    the packed-serving delivered measurement."""
    bench = _InferBench()
    b, t_x, mf = 16, bench.t_x, 1024
    log(f"headline shape ({b} x {t_x} tokens x {mf} frames) ...")
    capacity, _, dt, compiled = bench.run_shape(b, mf, 3.5, 12)
    rtt = bench.measure_rtt()
    # each dispatch over the axon relay pays ~rtt even when enqueued
    # asynchronously (observed: the same shape ran 1001 audio-s/s wall on
    # a sub-ms-rtt day and ~345 on a ~0.35 s-rtt day); the corrected
    # number is the device work rate a local deployment gets
    dt_dev = max(dt - rtt, dt * 0.05)
    out = {
        "value": round(capacity, 3),
        "value_rtt_corrected": round(capacity * dt / dt_dev, 3),
        "relay_rtt_ms": round(rtt * 1e3, 1),
        "shape": f"{b}x{mf}",
        "device_kind": bench.dev.device_kind,
    }
    # relay-immune device-loop capacity, keyed by shape (one extra compile
    # each, persistent-cached; non-fatal — the remote compile service
    # sometimes drops large requests). 64x512 is the measured peak shape
    # (sweep); measuring it here means the peak survives even when the
    # budget never reaches the sweep stage. The orchestrator promotes the
    # best of these to `value` WITH its own shape (ADVICE r4).
    out["device_loop"] = {}
    for shape in ((b, mf), (64, 512)):
        try:
            log(f"device-loop capacity {shape[0]}x{shape[1]} ...")
            cap_dev = bench.run_shape_device(shape[0], shape[1], 3.5)
            out["device_loop"][f"{shape[0]}x{shape[1]}"] = round(cap_dev, 3)
        except Exception as e:  # noqa: BLE001
            log(f"device-loop capacity failed: {e}")
            out["device_loop_error"] = str(e)[:200]
    print(json.dumps(out), flush=True)  # partial: capacity numbers banked
    log("packed serving workload ...")
    # non-fatal: retry once, then report the error without losing the
    # capacity numbers above
    for attempt in (1, 2):
        try:
            out.update(_packed_serving_run(bench, base=out))
            break
        except Exception as e:  # noqa: BLE001
            log(f"packed serving attempt {attempt} failed: {e}")
            out["packed_error"] = str(e)[:200]
    print(json.dumps(out), flush=True)  # partial: packed numbers banked
    # MFU two ways:
    #  - mfu_model_pct: ANALYTIC model FLOPs (true useful work; counts the
    #    Pallas MRF kernels, excludes structural zeros) / wall / peak
    #  - hw_flops_pct:  XLA cost-analysis FLOPs of the compiled graph
    #    (hardware work XLA scheduled; excludes Pallas kernel FLOPs,
    #    includes time-fold zero padding) — kept for trend continuity
    peak = peak_tflops(bench.dev.device_kind)
    model_fl = analytic_infer_flops(bench.cfg, b, t_x, mf)
    out["model_tflop_per_call"] = round(model_fl / 1e12, 3)
    if peak:
        out["mfu_model_pct"] = round(100.0 * model_fl / dt / 1e12 / peak, 2)
        out["mfu_model_pct_rtt_corrected"] = round(
            100.0 * model_fl / dt_dev / 1e12 / peak, 2)
    try:
        flops = compiled.cost_analysis()["flops"]
        tflops_s = flops / dt / 1e12
        out["infer_tflops_per_s"] = round(tflops_s, 2)
        if peak:
            out["hw_flops_pct"] = round(100.0 * tflops_s / peak, 2)
    except Exception as e:  # noqa: BLE001
        log(f"cost_analysis unavailable: {e}")
    return out


def stage_sweep(sweep_budget: float) -> dict:
    """Batch x frame-cap capacity grid; per-shape budget guard."""
    t0 = time.monotonic()
    bench = _InferBench()
    sweep: dict[str, float | None] = {}
    delivered: dict[str, float | None] = {}
    corrected: dict[str, float | None] = {}
    rtt = None
    # highest-capacity shapes first: they anchor the peak and the curve
    # (64x512 is the measured peak; the driver budget may only reach the
    # first few shapes)
    shapes = [(64, 512), (64, 256), (32, 512), (16, 1024), (8, 512),
              (32, 1024), (16, 512), (8, 1024), (4, 1024), (16, 256),
              (8, 256), (4, 512), (32, 256), (4, 256)]
    for b, mf in shapes:
        if sweep_budget - (time.monotonic() - t0) < 90:
            sweep[f"{b}x{mf}"] = None  # skipped: bench budget
            continue
        cap, dl, dt, _ = bench.run_shape(b, mf, 3.5, 8)
        if rtt is None:
            rtt = bench.measure_rtt()
        sweep[f"{b}x{mf}"] = round(cap, 1)
        delivered[f"{b}x{mf}"] = round(dl, 1)
        corrected[f"{b}x{mf}"] = round(cap * dt / max(dt - rtt, dt * 0.05), 1)
        log(f"sweep {b}x{mf}: {cap:.1f} capacity / {dl:.1f} delivered")
        # cumulative partial after every shape: a budget kill mid-compile
        # keeps everything measured so far
        print(json.dumps(
            {"sweep": sweep, "sweep_delivered": delivered,
             "sweep_rtt_corrected": corrected,
             "relay_rtt_ms": round((rtt or 0.0) * 1e3, 1)}), flush=True)
    return {"sweep": sweep, "sweep_delivered": delivered,
            "sweep_rtt_corrected": corrected,
            "relay_rtt_ms": round((rtt or 0.0) * 1e3, 1)}


def analytic_infer_flops(cfg, b, t_x, frames):
    from bert_vits2_tpu.utils.flops import analytic_infer_flops as f

    return f(cfg, b, t_x, frames)


def _train_setup():
    """Shared train-bench setup -> dict of everything the train stages need.

    Full geometry (reference train_ms.py:422-607): batch 16 x 512 spec
    frames, bf16, dur-disc + SLM losses on (WavLM geometry equals
    wavlm-base-plus; random weights are FLOP-identical to the frozen
    original)."""
    import dataclasses

    import numpy as np

    jax = _jax_setup()
    import jax.numpy as jnp

    from bert_vits2_tpu.models import WavLMDiscriminator
    from bert_vits2_tpu.models.slm import WavLMConfig, WavLMJax, make_slm_fns
    from bert_vits2_tpu.train import (
        DataConfig,
        Models,
        TrainConfig,
        init_train_state,
        make_train_step,
    )
    from bert_vits2_tpu.train.trainer import build_models, init_params
    from __graft_entry__ import _full_config

    dev = jax.devices()[0]
    cfg = dataclasses.replace(_full_config(), train_compute_dtype="bfloat16")
    data_cfg = DataConfig()
    train_cfg = TrainConfig(bf16_run=True)
    models = build_models(cfg, use_dur_disc=True, use_wavlm_disc=True)

    wl_cfg = WavLMConfig()  # wavlm-base-plus geometry
    cached = _load_tree_cache("bench_train_params.npz")
    with jax.default_device(jax.devices("cpu")[0]):
        if cached is not None:
            wl_params = cached["wl"]
        else:
            # structure-exact random init, tracing only (_fast_init) — the
            # eager flax inits here were the bulk of the train stage's cold
            # setup minutes
            wl_params = _fast_init(
                lambda: WavLMJax(wl_cfg).init(
                    jax.random.key(5), jnp.zeros((1, 6400))),
                seed=5,
            )["params"]
        models = Models(
            models.synthesizer, models.mpd, models.dur_disc,
            WavLMDiscriminator(
                slm_hidden=wl_cfg.hidden_size,
                slm_layers=wl_cfg.num_layers + 1,
                initial_channel=cfg.slm_initial_channel,
            ),
        )
        slm_embed, slm_feature_fn = make_slm_fns(wl_params, wl_cfg)
        if cached is not None:
            params = tuple(cached[k] for k in ("g", "d", "dd", "wd"))
        else:
            params = tuple(_fast_init(
                lambda: init_params(models, cfg, slm_embed=slm_embed)
            ))
            _save_tree_cache("bench_train_params.npz", {
                "wl": wl_params,
                **dict(zip(("g", "d", "dd", "wd"), params)),
            })
    params = jax.device_put(params, dev)
    # WavLM weights + resampler kernel ride in state.params_slm (runtime
    # inputs, not HLO constants — see TrainState.params_slm)
    slm_params_dev = jax.device_put(slm_embed.params, dev)

    b, t_x, t_y = 16, 128, 512
    hop, sr = data_cfg.hop_length, data_cfg.sampling_rate
    rng = np.random.default_rng(0)
    batch = dict(
        x=jnp.asarray(rng.integers(1, cfg.n_vocab, (b, t_x))),
        x_lengths=jnp.asarray([t_x] * b),
        spec=jnp.asarray(rng.normal(size=(b, t_y, cfg.spec_channels)) * 0.1,
                         jnp.float32),
        spec_lengths=jnp.asarray([t_y] * b),
        wave=jnp.asarray(rng.uniform(-0.5, 0.5, (b, t_y * hop)), jnp.float32),
        sid=jnp.asarray(rng.integers(0, cfg.n_speakers, (b,))),
        tone=jnp.asarray(rng.integers(0, cfg.num_tones, (b, t_x))),
        language=jnp.asarray(rng.integers(0, cfg.num_languages, (b, t_x))),
        bert=jnp.asarray(rng.normal(size=(b, t_x, cfg.bert_dim)), jnp.float32),
        ja_bert=jnp.asarray(rng.normal(size=(b, t_x, cfg.bert_dim)),
                            jnp.float32),
        en_bert=jnp.asarray(rng.normal(size=(b, t_x, cfg.bert_dim)),
                            jnp.float32),
    )
    batch = jax.device_put(batch, dev)

    state = init_train_state(models, train_cfg, *params,
                             params_slm=slm_params_dev)
    # commit EVERY leaf (incl. scalar counters) to the chip: a state with
    # mixed committed/uncommitted leaves gives the first call a different
    # jit signature than the stepped state -> a silent second multi-minute
    # XLA compile that poisons the timing loop
    state = jax.device_put(state, dev)
    def make_step(**kw):
        return make_train_step(
            models, train_cfg, data_cfg, cfg.segment_size,
            slm_embed=slm_embed, slm_feature_fn=slm_feature_fn,
            donate=False, **kw,
        )

    return {
        "jax": jax, "jnp": jnp, "np": np, "dev": dev,
        "state": state, "batch": batch, "make_step": make_step,
        "b": b, "t_y": t_y, "hop": hop, "sr": sr,
    }


def _make_loop(s):
    """The jitted n-step device loop. Factored so stage_train_compile can
    AOT-compile the IDENTICAL jaxpr ahead of time (same HLO -> same
    persistent-cache key) while quick/headline own the chip."""
    jax, jnp = s["jax"], s["jnp"]
    raw = s["make_step"](jit=False)

    @jax.jit
    def loop(state, batch, key, lr, n):
        # n is a TRACED trip count (one compile covers every n; a second
        # static-n variant would double the multi-minute remote compile)
        def body(i, carry):
            st, _ = carry
            st2, m = raw(st, batch, jax.random.fold_in(key, i), lr)
            return (st2, m["loss/g/total"])

        return jax.lax.fori_loop(0, n, body, (state, jnp.float32(0.0)))

    return loop


def _train_device_loop(s, fallback: bool = False) -> dict:
    """DEVICE-side train-step time: n steps inside one jitted lax.fori_loop
    (state threaded through the carry, so steps run back-to-back on chip);
    the n2-n1 difference cancels the fixed dispatch + D2H-sync cost. This is
    the step time a deployment with local dispatch gets — the wall number in
    stage_train additionally pays the axon dev relay's per-dispatch round
    trip, which at ~100-ms step times dominates it (VERDICT r3 item 3)."""
    jax, jnp, np = s["jax"], s["jnp"], s["np"]
    state, batch = s["state"], s["batch"]
    lr = jnp.float32(2e-4)
    key = jax.random.key(11)
    loop = _make_loop(s)

    def t(n):
        t0 = time.perf_counter()
        _, loss = loop(state, batch, key, lr, jnp.int32(n))
        np.asarray(loss)
        return time.perf_counter() - t0

    n1, n2 = 2, 6
    method = "lax.fori_loop difference (tools/_timing.py method)"
    try:
        log("compiling device-loop train step ...")
        np.asarray(loop(state, batch, key, lr, jnp.int32(n1))[1])  # compile
        np.asarray(loop(state, batch, key, lr, jnp.int32(n2))[1])  # warm
        t1 = min(t(n1) for _ in range(2))
        t2 = min(t(n2) for _ in range(2))
        dt = (t2 - t1) / (n2 - n1)
    except Exception as e:  # noqa: BLE001 - remote compile service can
        # refuse the loop-wrapped graph ("response body closed"); fall back
        # to per-call sync time minus the measured relay round trip
        if not fallback:
            raise
        log(f"device-loop compile failed ({e}); falling back to "
            "call-sync minus measured RTT")
        method = "per-call sync minus measured relay RTT (loop compile failed)"
        step_fn = s["make_step"]()
        st, m = step_fn(state, batch, key, lr)
        jax.block_until_ready(m["loss/g/total"])

        def t_call():
            t0 = time.perf_counter()
            _, mm = step_fn(state, batch, key, lr)
            jax.block_until_ready(mm["loss/g/total"])
            return time.perf_counter() - t0

        tiny = jax.jit(lambda x: x + 1)
        xt = jax.device_put(jnp.zeros((8,), jnp.float32), s["dev"])
        jax.block_until_ready(tiny(xt))

        def t_rtt():
            t0 = time.perf_counter()
            jax.block_until_ready(tiny(xt))
            return time.perf_counter() - t0

        calls = sorted(t_call() for _ in range(6))
        rtts = sorted(t_rtt() for _ in range(8))
        dt = max(calls[len(calls) // 2] - rtts[len(rtts) // 2], 1e-6)
    b, t_y, hop, sr = s["b"], s["t_y"], s["hop"], s["sr"]
    # per-step FLOPs come from the wall measurement's AOT executable (the
    # loop's trip count is traced, so its own cost analysis can't count
    # per-step); the caller derives hw_flops_pct_device from step_flops
    return {
        "steps_per_s_device": round(1.0 / dt, 3),
        "utt_audio_s_per_s_device": round(b * t_y * hop / sr / dt, 1),
        "timing": method,
    }


def stage_train() -> dict:
    """Foreground train stage (fallback when the background train_compile
    process did not get to measure): wall-clock timing, device estimate,
    then the on-device fori_loop — all via _train_measure, which banks a
    partial JSON line after every piece so a budget kill loses nothing
    already measured (VERDICT r4 item 1)."""
    s = _train_setup()
    jax = s["jax"]
    lr = s["jnp"].float32(2e-4)
    log("compiling train step ...")
    # AOT-compile so the executable's cost analysis is readable afterwards
    # (same persistent-cache key as the traced call would use)
    compiled = s["make_step"]().lower(
        s["state"], s["batch"], jax.random.key(11), lr).compile()
    # _make_loop is lazy (jax.jit traces at first call, inside
    # _train_measure, AFTER the wall numbers are banked)
    return _train_measure(s, compiled, _make_loop(s), {})


def stage_train_device() -> dict:
    """Standalone fallback for the device-loop timing (used by the
    orchestrator only when stage_train's inline attempt didn't land)."""
    s = _train_setup()
    return _train_device_loop(s, fallback=True)


def stage_train_compile(signal_path: str | None = None) -> dict:
    """The train stage's setup + two multi-minute compiles, run WITHOUT
    touching the chip: AOT lower().compile() populates the persistent
    compilation cache (and _train_setup writes the init-params npz cache),
    so the orchestrator runs this CONCURRENTLY with quick/headline —
    compilation happens on the remote compile service, only executions
    contend for the TPU.

    With `signal_path`, this process then WAITS for the orchestrator to
    touch that file (chip free: quick/headline done) and runs the full
    train measurement itself — wall, cost analysis, device estimate,
    device loop — reusing its own traced/lowered executables. Re-tracing
    in a fresh foreground process costs multi-minutes that the leftover
    budget does not have (VERDICT r4 item 1: the cold loop compile killed
    the round-4 device-side number; round-5 measurement: even cache-warm,
    per-process trace+lower is ~810 s on this host)."""
    s = _train_setup()
    jax, jnp = s["jax"], s["jnp"]
    state, batch = s["state"], s["batch"]
    key = jax.random.key(11)
    lr = jnp.float32(2e-4)
    out = {"ok": True}
    t0 = time.monotonic()
    log("train_compile: compiling straight-line step ...")
    compiled = s["make_step"]().lower(state, batch, key, lr).compile()
    out["step_compile_s"] = round(time.monotonic() - t0, 1)
    print(json.dumps(out), flush=True)  # partial: step cache is banked
    t0 = time.monotonic()
    log("train_compile: compiling device loop ...")
    loop = _make_loop(s)
    loop.lower(state, batch, key, lr, jnp.int32(2)).compile()
    out["loop_compile_s"] = round(time.monotonic() - t0, 1)
    if signal_path is None:
        return out
    print(json.dumps(out), flush=True)
    log("train_compile: compiles done; waiting for chip-free signal ...")
    # orphan guard: if the orchestrator died (driver SIGKILL), stop waiting
    # once its whole budget window (+ grace) must have elapsed
    deadline = T0 + BUDGET_S + 300
    while not os.path.exists(signal_path):
        if time.monotonic() > deadline:
            out["no_signal"] = "orchestrator never freed the chip"
            return out
        time.sleep(2.0)
    log("train_compile: chip free — measuring")
    return _train_measure(s, compiled, loop, out)


def _train_measure(s, compiled, loop, out: dict) -> dict:
    """Wall + cost-analysis + device-estimate + device-loop measurements
    over already-compiled executables (shared by stage_train and the
    background train_compile process). Banks partial JSON after each
    piece."""
    jax, jnp, np = s["jax"], s["jnp"], s["np"]
    state, batch = s["state"], s["batch"]
    key = jax.random.key(11)
    lr = jnp.float32(2e-4)
    state2, metrics = compiled(state, batch, key, lr)
    jax.block_until_ready(metrics)
    n = 8
    t0 = time.perf_counter()
    st = state2
    for i in range(n):
        st, metrics = compiled(st, batch, jax.random.fold_in(key, i), lr)
    jax.block_until_ready(metrics)
    dt = (time.perf_counter() - t0) / n
    b, t_y, hop, sr = s["b"], s["t_y"], s["hop"], s["sr"]
    out.update({
        "steps_per_s": round(1.0 / dt, 3),
        "utt_audio_s_per_s": round(b * t_y * hop / sr / dt, 1),
        "batch": b, "spec_frames": t_y, "bf16": True, "slm": True,
        "loss_g_total": round(float(np.asarray(metrics["loss/g/total"])), 3),
    })
    peak = peak_tflops(s["dev"].device_kind)
    try:
        out["step_flops"] = compiled.cost_analysis()["flops"]
        tflops_s = out["step_flops"] / dt / 1e12
        out["tflops_per_s"] = round(tflops_s, 2)
        if peak:
            out["hw_flops_pct"] = round(100.0 * tflops_s / peak, 2)
    except Exception as e:  # noqa: BLE001
        log(f"train cost_analysis unavailable: {e}")
    print(json.dumps(out), flush=True)  # partial: wall numbers banked
    try:
        tiny = jax.jit(lambda x: x + 1)
        xt = jax.device_put(jnp.zeros((8,), jnp.float32), s["dev"])
        jax.block_until_ready(tiny(xt))

        def t_call():
            t0 = time.perf_counter()
            _, mm = compiled(state2, batch, key, lr)
            jax.block_until_ready(mm["loss/g/total"])
            return time.perf_counter() - t0

        def t_rtt():
            t0 = time.perf_counter()
            jax.block_until_ready(tiny(xt))
            return time.perf_counter() - t0

        calls = sorted(t_call() for _ in range(5))
        rtts = sorted(t_rtt() for _ in range(8))
        dt_est = max(calls[len(calls) // 2] - rtts[len(rtts) // 2], 1e-6)
        out["steps_per_s_device_est"] = round(1.0 / dt_est, 3)
        if out.get("step_flops") and peak:
            out["hw_flops_pct_device_est"] = round(
                100.0 * out["step_flops"] / dt_est / 1e12 / peak, 2)
        print(json.dumps(out), flush=True)
    except Exception as e:  # noqa: BLE001
        log(f"device estimate failed: {e}")

    def t_loop(n):
        t0 = time.perf_counter()
        _, loss = loop(state, batch, key, lr, jnp.int32(n))
        np.asarray(loss)
        return time.perf_counter() - t0

    try:
        n1, n2 = 2, 6
        np.asarray(loop(state, batch, key, lr, jnp.int32(n1))[1])  # warm
        np.asarray(loop(state, batch, key, lr, jnp.int32(n2))[1])
        t1 = min(t_loop(n1) for _ in range(2))
        t2 = min(t_loop(n2) for _ in range(2))
        dt_dev = (t2 - t1) / (n2 - n1)
        out["steps_per_s_device"] = round(1.0 / dt_dev, 3)
        out["utt_audio_s_per_s_device"] = round(b * t_y * hop / sr / dt_dev, 1)
        out["timing"] = "lax.fori_loop difference (tools/_timing.py method)"
        if out.get("step_flops") and peak:
            tf = out["step_flops"] / dt_dev / 1e12
            out["tflops_per_s_device"] = round(tf, 2)
            out["hw_flops_pct_device"] = round(100.0 * tf / peak, 2)
    except Exception as e:  # noqa: BLE001
        log(f"device loop failed: {e}")
        out["train_device_error"] = str(e)[:200]
    return out


if __name__ == "__main__":
    if "--stage" in sys.argv:
        stage = sys.argv[sys.argv.index("--stage") + 1]
        if stage == "quick":
            res = stage_quick()
        elif stage == "headline":
            res = stage_headline()
        elif stage == "train":
            res = stage_train()
        elif stage == "train_device":
            res = stage_train_device()
        elif stage == "train_compile":
            sig = None
            if "--signal" in sys.argv:
                sig = sys.argv[sys.argv.index("--signal") + 1]
            res = stage_train_compile(sig)
        elif stage == "sweep":
            sb = 600.0
            if "--sweep-budget" in sys.argv:
                sb = float(sys.argv[sys.argv.index("--sweep-budget") + 1])
            res = stage_sweep(sb)
        else:
            raise SystemExit(f"unknown stage {stage}")
        print(json.dumps(res), flush=True)
    else:
        main()
