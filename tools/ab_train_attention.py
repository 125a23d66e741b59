"""A/B: full fused GAN train step with Pallas banded-attention VJP vs the
dense XLA attention path, measured back-to-back with the same on-device
fori_loop difference method (tools/_timing.py; bench.py train_device stage).

The kernel microbenchmark (docs/KERNELS.md) shows the fused fwd+bwd winning
1.8x at the flow shape in isolation; this answers whether the FULL step wins
— custom_vjp boundaries block XLA fusion/remat choices around the kernel, so
the isolated win does not automatically survive composition.

Usage: python tools/ab_train_attention.py  (TPU; ~15 min per cold compile)
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from bench import _train_device_loop, _train_setup, peak_tflops  # noqa: E402
from bert_vits2_tpu.ops.attention_pallas import force_lax_attention  # noqa: E402


def main() -> None:
    s = _train_setup()
    out = {}
    peak = peak_tflops(s["dev"].device_kind)
    for name in ("fused", "dense"):
        if name == "dense":
            ctx = force_lax_attention()
        else:
            import contextlib

            ctx = contextlib.nullcontext()
        with ctx:
            # tracing happens inside (first loop call); _FORCE_LAX is read
            # at trace time, so the context must wrap the measurement
            print(f"[ab] measuring {name} ...", file=sys.stderr, flush=True)
            r = _train_device_loop(s, fallback=False)
        out[name] = r
        print(json.dumps({name: r}), flush=True)
    f = out["fused"]["steps_per_s_device"]
    d = out["dense"]["steps_per_s_device"]
    out["fused_over_dense"] = round(f / d, 4)
    if peak:
        flops = 6.86e12  # bench step_flops (cost analysis, fused variant)
        out["note"] = (
            f"hw pct at {flops/1e12:.2f} TFLOP/step: "
            f"fused {100*flops*f/1e12/peak:.2f} dense {100*flops*d/1e12/peak:.2f}"
        )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
