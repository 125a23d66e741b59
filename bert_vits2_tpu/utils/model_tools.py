"""Release-artifact and voice-mixing utilities on generator param trees
(reference: compress_model.py:23-63, utils.py:428-456 mix_model).

These operate on flax param pytrees (the output of Synthesizer.init /
checkpoint import), staying framework-native: a compressed release is an .npz
of flattened leaves, importable by infer.loader.
"""

from __future__ import annotations

import numpy as np


def _flatten(params, prefix="") -> dict:
    out = {}
    for k, v in params.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def _unflatten(flat: dict) -> dict:
    out: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def compress_params(params_g: dict, half: bool = False) -> dict:
    """Strip the posterior encoder (training-only; models.py:1026 infer never
    touches enc_q) and optionally cast to fp16. Returns a new tree."""
    flat = _flatten(params_g)
    kept = {k: np.asarray(v) for k, v in flat.items() if "enc_q" not in k.split("/")}
    if half:
        kept = {
            k: v.astype(np.float16) if np.issubdtype(v.dtype, np.floating) else v
            for k, v in kept.items()
        }
    return _unflatten(kept)


def save_release(path: str, params_g: dict, half: bool = False) -> None:
    """Write a compressed inference-only artifact (.npz)."""
    flat = _flatten(compress_params(params_g, half))
    np.savez(path, **flat)


def load_release(path: str) -> dict:
    """Load an .npz release back into a param tree (no enc_q — infer-only)."""
    with np.load(path) as z:
        return _unflatten({k: z[k] for k in z.files})


def mix_params(
    params_a: dict,
    params_b: dict,
    voice_ratio: tuple[float, float] = (0.5, 0.5),
    tone_ratio: tuple[float, float] = (0.5, 0.5),
) -> dict:
    """Weighted interpolation of two voices: enc_p leaves (prosody/tone) mix
    with tone_ratio, everything else with voice_ratio. Keys only in B are
    copied (utils.py:451-453)."""
    fa, fb = _flatten(params_a), _flatten(params_b)
    out = {}
    for k, va in fa.items():
        if k not in fb:
            out[k] = np.asarray(va)
            continue
        r = tone_ratio if k.startswith("enc_p") or "/enc_p/" in k else voice_ratio
        out[k] = np.asarray(va) * r[0] + np.asarray(fb[k]) * r[1]
    for k, vb in fb.items():
        if k not in out:
            out[k] = np.asarray(vb)
    return _unflatten(out)
