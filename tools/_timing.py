"""Device-side loop timing for perf tools on the axon TPU relay.

Host-loop timing is unusable here: each dispatch crosses an HTTP tunnel
(~ms), swamping sub-10ms stages (a host-loop difference method measured
negative times). Instead the target fn runs n times inside ONE jitted
lax.fori_loop, perturbing the first float input by the loop index so XLA
cannot hoist the loop-invariant body; the n2-n1 difference cancels the
fixed call + D2H-sync cost, leaving pure device time per iteration.
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np


def cache_dir() -> str:
    """Per-machine persistent-cache path.

    XLA:CPU AOT entries are machine-feature locked: loading an entry
    compiled on a host with different CPU flags logs 'could lead to
    SIGILL' and can crash. The driver may run each round on a different
    machine, so key the cache dir by a hash of the host CPU flags — TPU
    entries still amortize across runs within a round."""
    import hashlib
    import os

    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        flags = ""
    tag = hashlib.sha1(flags.encode()).hexdigest()[:10]
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache", tag)


def setup_cache():
    """Point jax at the repo's persistent compilation cache (remote
    compiles are multi-minute and the relay connection sometimes drops —
    a warm cache makes reruns resumable)."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir())
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # noqa: BLE001
        pass


def device_timeit(fn, *args, n1: int = 4, n2: int = 16) -> float:
    import jax
    import jax.numpy as jnp

    args = list(args)
    pi = next((i for i, a in enumerate(args)
               if hasattr(a, "dtype") and jnp.issubdtype(a.dtype,
                                                         jnp.floating)),
              None)

    @partial(jax.jit, static_argnames=("n",))
    def loop(args, n):
        def body(i, acc):
            a = list(args)
            if pi is not None:
                a[pi] = a[pi] + (i.astype(a[pi].dtype)
                                 * jnp.asarray(1e-30, a[pi].dtype))
            else:
                # i < n <= 16, so i >> 30 adds zero without being provably
                # loop-invariant
                a[0] = a[0] + (i >> 30).astype(a[0].dtype)
            out = fn(*a)
            leaf = jax.tree.leaves(out)[0]
            return acc + leaf.reshape(-1)[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def t(n):
        t0 = time.perf_counter()
        np.asarray(loop(tuple(args), n))
        return time.perf_counter() - t0

    np.asarray(loop(tuple(args), n1))  # compile
    np.asarray(loop(tuple(args), n2))
    t1 = min(t(n1) for _ in range(2))
    t2 = min(t(n2) for _ in range(2))
    return (t2 - t1) / (n2 - n1)
