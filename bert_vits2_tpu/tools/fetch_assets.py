"""Pretrained-asset bootstrap: verify (and, when online, fetch) the BERT /
WavLM / emotion weights the framework conditions on.

The reference silently downloads these at `import text` time
(reference text/__init__.py:33-63 check_bert_models + utils.py:37-62
download_checkpoint) — side-effectful imports that fail deep inside a
training run when offline. Here bootstrap is an explicit CLI:

    python -m bert_vits2_tpu.tools.fetch_assets            # report status
    python -m bert_vits2_tpu.tools.fetch_assets --fetch    # download missing
    python -m bert_vits2_tpu.tools.fetch_assets --slm --fetch

Layout (relative to --root, default "."):

    bert/chinese-roberta-wwm-ext-large/      ZH BERT  (text/chinese_bert.py:15)
    bert/deberta-v2-large-japanese-char-wwm/ JA BERT  (text/japanese_bert.py:16)
    bert/deberta-v3-large/                   EN BERT  (text/english_bert_mock.py:15)
    slm/wavlm-base-plus/                     SLM disc (losses.py:66)
    emotional/wav2vec2-large-robust-12-ft-emotion-msp-dim/  V2.1 emotion
    emotional/clap-htsat-fused/              V2.2 CLAP emotion

Exit status 0 when every *requested* group is present, 1 otherwise, so it
can gate CI / launch scripts.
"""

from __future__ import annotations

import argparse
import os
import sys

WEIGHT_FILES = ("model.safetensors", "pytorch_model.bin", "flax_model.msgpack")

# group -> [(subdir, hf repo_id, extra required files)]
MANIFEST = {
    "bert": [
        ("bert/chinese-roberta-wwm-ext-large",
         "hfl/chinese-roberta-wwm-ext-large", ("vocab.txt",)),
        ("bert/deberta-v2-large-japanese-char-wwm",
         "ku-nlp/deberta-v2-large-japanese-char-wwm", ()),
        ("bert/deberta-v3-large", "microsoft/deberta-v3-large",
         ("spm.model",)),
    ],
    "slm": [
        ("slm/wavlm-base-plus", "microsoft/wavlm-base-plus", ()),
    ],
    "emotion": [
        ("emotional/wav2vec2-large-robust-12-ft-emotion-msp-dim",
         "audeering/wav2vec2-large-robust-12-ft-emotion-msp-dim", ()),
        ("emotional/clap-htsat-fused", "laion/clap-htsat-fused", ()),
    ],
}


def check_asset(root: str, subdir: str, extra: tuple = ()) -> tuple[bool, str]:
    """-> (ok, human-readable status)."""
    path = os.path.join(root, subdir)
    if not os.path.isdir(path):
        return False, "missing directory"
    if not os.path.isfile(os.path.join(path, "config.json")):
        return False, "no config.json"
    missing = [f for f in extra if not os.path.isfile(os.path.join(path, f))]
    if missing:
        return False, f"missing {','.join(missing)}"
    if not any(os.path.isfile(os.path.join(path, w)) for w in WEIGHT_FILES):
        return False, f"no weights ({' / '.join(WEIGHT_FILES)})"
    return True, "ok"


def fetch_asset(root: str, subdir: str, repo_id: str) -> tuple[bool, str]:
    """Download via huggingface_hub when available; never raises."""
    try:
        from huggingface_hub import snapshot_download
    except ImportError:
        return False, "huggingface_hub not installed"
    try:
        snapshot_download(
            repo_id,
            local_dir=os.path.join(root, subdir),
            allow_patterns=[
                "*.json", "*.txt", "*.model", "model.safetensors",
                "pytorch_model.bin", "spm.model",
            ],
        )
        return True, "downloaded"
    except Exception as e:  # noqa: BLE001 - offline/no-auth are expected
        return False, f"download failed: {e}"


def fetch_base_checkpoint(
    root: str,
    repo_id: str = "Stardust-minus/Bert-VITS2",
    filename: str = "Bert-VITS2_2.3/G_0.pth",
    dest: str = "pretrained",
) -> tuple[bool, str]:
    """Download the community V2.3 BASE generator checkpoint (the reference
    project's fine-tuning starting point) and verify it STRUCTURALLY — the
    state dict must contain the V2.3 synthesizer submodules — because a
    byte hash cannot be pinned from an offline image. Never raises.

    Used by tools/demo_real_ckpt.py --fetch; any V2.3-compatible G_*.pth
    placed under <root>/pretrained/ works equally well.
    """
    try:
        from huggingface_hub import hf_hub_download
    except ImportError:
        return False, "huggingface_hub not installed"
    try:
        path = hf_hub_download(repo_id, filename,
                               local_dir=os.path.join(root, dest))
    except Exception as e:  # noqa: BLE001 - offline/no-auth are expected
        return False, f"download failed: {e}"
    try:
        from bert_vits2_tpu.compat.torch_import import load_torch_checkpoint

        ckpt = load_torch_checkpoint(path)
        keys = set(ckpt["model"])
        wanted_prefixes = ("enc_p.", "dec.", "flow.", "sdp.", "dp.")
        missing = [p for p in wanted_prefixes
                   if not any(k.startswith(p) for k in keys)]
        if missing:
            return False, f"{path}: not a V2.x generator (no {missing})"
    except Exception as e:  # noqa: BLE001
        return False, f"{path}: failed structural check: {e}"
    return True, f"downloaded + verified {path}"


def run(root: str, groups: list[str], fetch: bool) -> int:
    ok_all = True
    for group in groups:
        for subdir, repo_id, extra in MANIFEST[group]:
            ok, status = check_asset(root, subdir, extra)
            if not ok and fetch:
                fetched, fstatus = fetch_asset(root, subdir, repo_id)
                if fetched:
                    ok, status = check_asset(root, subdir, extra)
                    status = f"{status} (downloaded)"
                else:
                    status = f"{status}; {fstatus}"
            mark = "OK " if ok else "MISS"
            print(f"[{mark}] {subdir:55s} {status}")
            if not ok:
                ok_all = False
                print(f"       -> huggingface.co/{repo_id} "
                      f"(place files under {os.path.join(root, subdir)})")
    return 0 if ok_all else 1


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--root", default=".", help="asset root (default: cwd)")
    p.add_argument("--fetch", action="store_true",
                   help="attempt download of missing assets (needs network + "
                        "huggingface_hub)")
    p.add_argument("--bert", action="store_true", help="only the BERT trio")
    p.add_argument("--slm", action="store_true", help="only WavLM (SLM loss)")
    p.add_argument("--emotion", action="store_true",
                   help="only V2.1/V2.2 emotion extractors")
    args = p.parse_args(argv)
    groups = [g for g in ("bert", "slm", "emotion")
              if getattr(args, g)] or list(MANIFEST)
    return run(args.root, groups, args.fetch)


if __name__ == "__main__":
    sys.exit(main())
