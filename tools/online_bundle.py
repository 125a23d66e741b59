"""First-online-run bundle: every network-gated validation in one command.

This image has zero egress, so four validations are staged but have never
produced their numbers (VERDICT r4 missing #1-3). On the first run WITH
network, run:

    python tools/online_bundle.py            # everything
    python tools/online_bundle.py --no-fetch # only what is already on disk

Steps (each skips cleanly offline and reports why):
  1. fetch_assets --fetch      BERT trio + WavLM weights (docs/WEIGHTS.md)
  2. pip install pypinyin onnxruntime   (unless --no-pip)
  3. demo_real_ckpt            trained-checkpoint mel parity vs the torch
                               reference + delivered audio-s/s with TRAINED
                               durations (BASELINE.md north-star row 2)
  4. zh_divergence             word-level reading divergence vs pypinyin
                               over the vendored ~2k-sentence corpus
  5. onnx conformance          onnxruntime actually loads + runs the
                               exported graphs (tests/test_onnx_conformance
                               flips from numpy-evaluator to ort when
                               importable)

Prints ONE combined JSON object; also saved to ONLINE_BUNDLE.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_step(name: str, cmd: list[str], timeout: int = 1800) -> dict:
    """Run a step, return its last JSON line (or rc/stderr tail)."""
    print(f"[bundle] {name}: {' '.join(cmd)}", file=sys.stderr, flush=True)
    try:
        p = subprocess.run(
            cmd, cwd=REPO, capture_output=True, text=True, timeout=timeout
        )
    except subprocess.TimeoutExpired:
        return {"error": f"timed out after {timeout}s"}
    for line in reversed(p.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return {
        "rc": p.returncode,
        "tail": (p.stdout + p.stderr)[-500:],
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--no-fetch", action="store_true",
                    help="skip asset downloads (use what is on disk)")
    ap.add_argument("--no-pip", action="store_true",
                    help="do not pip-install pypinyin/onnxruntime")
    ap.add_argument("--ckpt", default=None,
                    help="explicit G_*.pth for the real-checkpoint demo")
    args = ap.parse_args(argv)
    py = sys.executable
    out: dict = {}

    if not args.no_fetch:
        out["fetch_assets"] = run_step(
            "fetch_assets",
            [py, "-m", "bert_vits2_tpu.tools.fetch_assets", "--fetch"],
        )
    if not args.no_pip:
        pip = subprocess.run(
            [py, "-m", "pip", "install", "--quiet", "pypinyin",
             "onnxruntime"],
            cwd=REPO, capture_output=True, text=True, timeout=900,
        )
        out["pip"] = {"rc": pip.returncode,
                      "tail": (pip.stdout + pip.stderr)[-300:]}

    demo_cmd = [py, "tools/demo_real_ckpt.py"]
    if args.ckpt:
        demo_cmd += ["--ckpt", args.ckpt]
    elif not args.no_fetch:
        demo_cmd += ["--fetch"]
    out["real_ckpt"] = run_step("demo_real_ckpt", demo_cmd, timeout=3600)

    out["zh_divergence"] = run_step(
        "zh_divergence", [py, "tools/zh_divergence.py"]
    )

    # onnxruntime conformance: the dedicated suite consumes the exported
    # graphs through ort when it is importable (else the in-repo evaluator)
    have_ort = subprocess.run(
        [py, "-c", "import onnxruntime"], capture_output=True
    ).returncode == 0
    conf = subprocess.run(
        [py, "-m", "pytest", "tests/test_onnx_conformance.py",
         "tests/test_onnx.py", "-q", "--no-header"],
        cwd=REPO, capture_output=True, text=True, timeout=3600,
    )
    out["onnx"] = {
        "runtime": "onnxruntime" if have_ort else
                   "in-repo evaluator (onnxruntime not importable)",
        "rc": conf.returncode,
        "tail": conf.stdout.strip().splitlines()[-1] if conf.stdout else "",
    }

    line = json.dumps(out, ensure_ascii=False)
    print(line)
    with open(os.path.join(REPO, "ONLINE_BUNDLE.json"), "w") as f:
        f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
