"""PyTorch → flax checkpoint import for reference Bert-VITS2 V2.3 checkpoints.

Reads the reference's native checkpoint dicts ({"model": state_dict,
"iteration", "optimizer", "learning_rate"} — utils.py:123-141) and converts
every tensor to this framework's parameter tree. Layout rules:

- Conv1d          torch [out, in, k]      -> flax [k, in, out]
- ConvTranspose1d torch [in, out, k]      -> flax [k, in, out]
- Conv2d          torch [out, in, kh, kw] -> flax [kh, kw, in, out]
- Linear          torch [out, in]         -> flax [in, out]
- Embedding       torch [n, d]            -> flax [n, d]
- weight_norm (v, g): v as above; g [c,1,1] -> [c]
- LSTM (DurationDiscriminator, models.py:41): torch fused [4h, *] gate order
  (i, f, g, o) -> per-gate flax Dense kernels; ih+hh biases sum into the
  h-side bias (mathematically identical).

Flip layers are stateless, so torch flow lists skip indices (flow.flows.0,2,4,6);
flax numbers only parameterized couplings densely (flows_0..3). The rename pass
handles that plus named-module differences (sdp.flows.0 -> sdp/flow_ea, MPD
discriminators.N -> disc_s / disc_p<period>).
"""

from __future__ import annotations

import re
from typing import Callable

import numpy as np
import jax

__all__ = [
    "load_torch_checkpoint",
    "convert_state_dict",
    "import_generator_checkpoint",
    "import_mpd_checkpoint",
    "import_dur_disc_checkpoint",
    "import_wavlm_disc_checkpoint",
]

_STRIP_PREFIXES = ("module.", "_orig_mod.")


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference .pth checkpoint on CPU -> dict with numpy tensors.

    Returns {"model": {key: np.ndarray}, "iteration": int|None,
    "learning_rate": float|None}. Optimizer state is dropped (torch Adam state
    is not transferable to optax shapes; resume LR/step are).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt else ckpt
    model = {}
    for k, v in sd.items():
        for p in _STRIP_PREFIXES:
            if k.startswith(p):
                k = k[len(p):]
        model[k] = v.float().numpy() if hasattr(v, "numpy") else np.asarray(v)
    return {
        "model": model,
        "iteration": ckpt.get("iteration") if isinstance(ckpt, dict) else None,
        "learning_rate": ckpt.get("learning_rate") if isinstance(ckpt, dict) else None,
    }


def _flatten(params) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(str(p.key) for p in path)
        flat[name] = leaf
    return flat


def _unflatten(flat: dict):
    tree: dict = {}
    for name, leaf in flat.items():
        node = tree
        parts = name.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf
    return tree


def _canon(parts: list[str]) -> list[str]:
    """Merge torch list indices into the previous name: a.0.b -> a_0/b."""
    out: list[str] = []
    for p in parts:
        if p.isdigit() and out:
            out[-1] = out[-1] + "_" + p
        else:
            out.append(p)
    return out


def _dense_renumber(key: str, site: str) -> str:
    """flow.flows.{2k}[.rest] -> flow.flows.{k} (Flip layers hold no params)."""
    m = re.match(rf"^{re.escape(site)}\.(\d+)(\..*)?$", key)
    if not m:
        return key
    idx = int(m.group(1))
    return f"{site}.{idx // 2}{m.group(2) or ''}"


def _sdp_renumber(key: str, site: str, ea_name: str) -> str:
    """sdp flow lists: idx 0 is ElementwiseAffine (-> named module), odd
    indices 2k+1 are ConvFlows (-> dense k); even >0 are Flips (no params)."""
    m = re.match(rf"^{re.escape(site)}\.(\d+)(\..*)?$", key)
    if not m:
        return key
    idx, rest = int(m.group(1)), m.group(2) or ""
    head = site.rsplit(".", 1)[0] if "." in site else ""
    prefix = head + "." if head else ""
    if idx == 0:
        return f"{prefix}{ea_name}{rest}"
    tail = site.rsplit(".", 1)[-1]
    return f"{prefix}{tail}.{(idx - 1) // 2}{rest}"


def synthesizer_rename(key: str) -> str:
    """Reference SynthesizerTrn (models.py:811) key -> framework module path."""
    key = _dense_renumber(key, "flow.flows")
    key = _sdp_renumber(key, "sdp.flows", "flow_ea")
    key = _sdp_renumber(key, "sdp.post_flows", "post_flow_ea")
    # V2.1/V2.2 emotion conditioning (oldVersion/V210/models.py:347-356,
    # V220/models.py:380-402): vector_quantize_pytorch codebooks and the
    # CLAP residual-MLP in-net.
    key = key.replace("._codebook.embed", ".codebook")
    key = key.replace("in_feature_net.3.mlp.", "in_feature_net.3.mlp_")
    return key


def mpd_rename(periods=(2, 3, 5, 7, 11)) -> Callable[[str], str]:
    def rename(key: str) -> str:
        m = re.match(r"^discriminators\.(\d+)(\..*)?$", key)
        if not m:
            return key
        idx, rest = int(m.group(1)), m.group(2) or ""
        name = "disc_s" if idx == 0 else f"disc_p{periods[idx - 1]}"
        return f"{name}{rest}"

    return rename


def dur_disc_rename(key: str) -> str:
    key = key.replace("output_layer.0.", "output_layer.")
    return key


_LSTM_GATES = ("i", "f", "g", "o")
# flax OptimizedLSTMCell dense names per gate: input-side i*, hidden-side h*
_LSTM_IN = {"i": "ii", "f": "if", "g": "ig", "o": "io"}
_LSTM_H = {"i": "hi", "f": "hf", "g": "hg", "o": "ho"}


def _convert_lstm(sd: dict, flat: dict, torch_prefix: str, fwd: str, bwd: str):
    """Expand torch fused-LSTM tensors into per-gate flax Dense params."""
    out = {}
    for suffix, flax_rnn in (("", fwd), ("_reverse", bwd)):
        w_ih = sd[f"{torch_prefix}.weight_ih_l0{suffix}"]
        w_hh = sd[f"{torch_prefix}.weight_hh_l0{suffix}"]
        b = (
            sd[f"{torch_prefix}.bias_ih_l0{suffix}"]
            + sd[f"{torch_prefix}.bias_hh_l0{suffix}"]
        )
        h = w_hh.shape[1]
        for gi, gate in enumerate(_LSTM_GATES):
            sl = slice(gi * h, (gi + 1) * h)
            out[f"{flax_rnn}/cell/{_LSTM_IN[gate]}/kernel"] = w_ih[sl].T
            out[f"{flax_rnn}/cell/{_LSTM_H[gate]}/kernel"] = w_hh[sl].T
            out[f"{flax_rnn}/cell/{_LSTM_H[gate]}/bias"] = b[sl]
    for k, v in out.items():
        if k not in flat:
            raise KeyError(f"LSTM target {k} not in flax params")
        if flat[k].shape != v.shape:
            raise ValueError(f"LSTM {k}: {v.shape} vs flax {flat[k].shape}")
    return out


def convert_state_dict(
    sd: dict,
    flax_params,
    rename: Callable[[str], str] | None = None,
    convt_markers: tuple[str, ...] = ("/ups_",),
    lstm_sites: tuple[tuple[str, str, str], ...] = (),
    strict: bool = True,
):
    """Convert a torch state_dict into the given flax param tree's structure.

    flax_params: the target tree (e.g. model.init(...)['params']) — used for
    names, shapes, and to detect Dense-vs-Conv for k=1 convolutions.
    lstm_sites: (torch_prefix, flax_fwd_name, flax_bwd_name) triples.
    Returns (params_tree, report) where report lists unconverted keys.
    """
    had_wrapper = isinstance(flax_params, dict) and set(flax_params) == {"params"}
    target = flax_params["params"] if had_wrapper else flax_params
    flat = _flatten(target)
    new = {}
    report = {"unmatched": [], "unused_flax": None}

    lstm_prefixes = tuple(site[0] + "." for site in lstm_sites)
    for torch_prefix, fwd, bwd in lstm_sites:
        new.update(_convert_lstm(sd, flat, torch_prefix, fwd, bwd))

    for tk, w in sd.items():
        if tk.startswith(lstm_prefixes):
            continue
        w = np.asarray(w)
        key = rename(tk) if rename else tk
        parts = _canon(key.split("."))
        stem, leaf = "/".join(parts[:-1]), parts[-1]

        path, val = None, None
        if leaf == "weight_g":
            path = f"{stem}/g"
            if path in flat:
                val = w.reshape(flat[path].shape)
        elif leaf == "weight_v":
            path = f"{stem}/v"
            if path in flat:
                if w.ndim == 3:
                    is_convt = any(m in "/" + path for m in convt_markers)
                    val = np.transpose(w, (2, 0, 1) if is_convt else (2, 1, 0))
                elif w.ndim == 4:
                    val = np.transpose(w, (2, 3, 1, 0))
        elif leaf == "weight":
            if f"{stem}/embedding" in flat:
                path, val = f"{stem}/embedding", w
            elif f"{stem}/scale" in flat:  # torch nn.LayerNorm -> flax scale
                path, val = f"{stem}/scale", w
            elif f"{stem}/kernel" in flat:
                path = f"{stem}/kernel"
                fshape = flat[path].shape
                if w.ndim == 3 and len(fshape) == 2:
                    val = w[:, :, 0].T  # torch k=1 conv -> flax Dense
                elif w.ndim == 3:
                    is_convt = any(m in "/" + path for m in convt_markers)
                    val = np.transpose(w, (2, 0, 1) if is_convt else (2, 1, 0))
                elif w.ndim == 4:
                    val = np.transpose(w, (2, 3, 1, 0))
                elif w.ndim == 2:
                    val = w.T
                else:
                    val = w
        else:
            path = f"{stem}/{leaf}"
            if path in flat:
                val = w.reshape(flat[path].shape) if w.shape != flat[path].shape else w

        if path is None or path not in flat or val is None:
            report["unmatched"].append(tk)
            continue
        if val.shape != flat[path].shape:
            raise ValueError(
                f"{tk} -> {path}: converted shape {val.shape} != flax {flat[path].shape}"
            )
        new[path] = val.astype(np.asarray(flat[path]).dtype if hasattr(flat[path], "dtype") else np.float32)

    unused = sorted(set(flat) - set(new))
    report["unused_flax"] = unused
    if strict and report["unmatched"]:
        raise KeyError(f"unconverted torch keys: {report['unmatched'][:10]} "
                       f"(+{max(0, len(report['unmatched']) - 10)} more)")
    if strict and unused:
        raise KeyError(f"flax params without source: {unused[:10]} "
                       f"(+{max(0, len(unused) - 10)} more)")
    # keep any flax leaves that had no torch source (non-strict mode)
    merged = dict(flat)
    merged.update(new)
    tree = _unflatten(merged)
    if had_wrapper:
        tree = {"params": tree}
    return tree, report


def import_generator_checkpoint(path: str, flax_params, strict: bool = True):
    """G_*.pth -> Synthesizer params (+ iteration).

    Old-version back-compat (utils.py:90-109): BERT projections absent from
    the checkpoint (ja_bert_proj on <2.0, en_bert_proj on <2.3) are ZEROED so
    the extra conditioning contributes nothing, instead of staying at random
    init; other missing keys keep their init and are listed in the report.
    """
    ckpt = load_torch_checkpoint(path)
    sd = {k: v for k, v in ckpt["model"].items() if not k.startswith("enc_q.")
          or _has_enc_q(flax_params)}
    # vector_quantize_pytorch EMA buffers are training state, not weights
    _VQ_BUFFERS = (".initted", ".cluster_size", ".embed_avg")
    sd = {k: v for k, v in sd.items()
          if not ("_codebook" in k and k.endswith(_VQ_BUFFERS))}
    params, report = convert_state_dict(
        sd, flax_params, rename=synthesizer_rename, strict=strict
    )
    if not strict and report["unused_flax"]:
        flat = _flatten(params.get("params", params) if isinstance(params, dict) else params)
        zeroed = []
        for key in report["unused_flax"]:
            if "bert_proj" in key and key in flat:
                flat[key] = np.zeros_like(np.asarray(flat[key]))
                zeroed.append(key)
        if zeroed:
            report["zeroed"] = zeroed
            tree = _unflatten(flat)
            params = {"params": tree} if (isinstance(params, dict) and set(params) == {"params"}) else tree
    return params, ckpt["iteration"], report


def _has_enc_q(flax_params) -> bool:
    target = flax_params.get("params", flax_params)
    return "enc_q" in target


def import_mpd_checkpoint(path: str, flax_params, periods=(2, 3, 5, 7, 11),
                          strict: bool = True):
    """D_*.pth -> MultiPeriodDiscriminator params (+ iteration)."""
    ckpt = load_torch_checkpoint(path)
    params, report = convert_state_dict(
        ckpt["model"], flax_params, rename=mpd_rename(periods), strict=strict
    )
    return params, ckpt["iteration"], report


def import_dur_disc_checkpoint(path: str, flax_params, strict: bool = True):
    """DUR_*.pth -> DurationDiscriminator params (+ iteration)."""
    ckpt = load_torch_checkpoint(path)
    params, report = convert_state_dict(
        ckpt["model"],
        flax_params,
        rename=dur_disc_rename,
        lstm_sites=(("LSTM", "lstm_fwd", "lstm_bwd"),),
        strict=strict,
    )
    return params, ckpt["iteration"], report


def import_wavlm_disc_checkpoint(path: str, flax_params, strict: bool = True):
    """WD_*.pth -> WavLMDiscriminator params (+ iteration)."""
    ckpt = load_torch_checkpoint(path)
    params, report = convert_state_dict(ckpt["model"], flax_params, strict=strict)
    return params, ckpt["iteration"], report
