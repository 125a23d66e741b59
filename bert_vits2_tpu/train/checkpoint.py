"""Sharded checkpoints + reference-checkpoint bootstrap (SURVEY.md §5).

Orbax for native sharded TrainState checkpoints (the TPU replacement for
utils.save_checkpoint's G_/D_/WD_/DUR_*.pth quartet, utils.py:123-141), with
the reference's retention policy (keep_ckpts, utils.py:271-317) and a
bootstrap path that initializes params from imported PyTorch checkpoints.
"""

from __future__ import annotations

import os
import re
from typing import Any

import jax
import numpy as np


def _mgr(directory: str, keep: int | None):
    import orbax.checkpoint as ocp

    options = ocp.CheckpointManagerOptions(
        max_to_keep=keep, create=True, enable_async_checkpointing=False
    )
    return ocp.CheckpointManager(os.path.abspath(directory), options=options)


def save_train_state(directory: str, step: int, state, keep: int = 8) -> None:
    """Save the full fused TrainState (all four nets + opts) at `step`.

    params_slm (frozen external WavLM weights) is dropped — it is an input
    asset, not training state (the reference likewise never checkpoints the
    frozen wavlm, train_ms.py:695-725)."""
    import orbax.checkpoint as ocp

    if getattr(state, "params_slm", None) is not None:
        state = state.replace(params_slm=None)
    if jax.process_count() == 1:
        # single host: pull to host numpy first (fast path; also strips
        # device commitment so the entry is topology-agnostic)
        state = jax.tree.map(np.asarray, state)
    # multi-process: leave the sharded jax.Arrays in place — orbax gathers
    # each process's addressable shards collectively; np.asarray on a
    # non-fully-addressable array would throw (reference's torch.save has
    # no analog: it only ever runs on rank 0 with full host copies)
    with _mgr(directory, keep) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()


def latest_step(directory: str) -> int | None:
    if not os.path.isdir(directory):
        return None
    with _mgr(directory, None) as mgr:
        return mgr.latest_step()


def restore_train_state(directory: str, state_template, step: int | None = None):
    """Restore into the template's structure/shardings. Returns (state, step).

    params_slm is never stored (see save_train_state): it is stripped from
    the template for the restore and re-attached from the template after."""
    import orbax.checkpoint as ocp

    params_slm = getattr(state_template, "params_slm", None)
    if params_slm is not None:
        state_template = state_template.replace(params_slm=None)
    with _mgr(directory, None) as mgr:
        step = step if step is not None else mgr.latest_step()
        if step is None:
            return None, None
        restored = mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )
    if params_slm is not None:
        restored = restored.replace(params_slm=params_slm)
    return restored, step


def bootstrap_from_reference(
    ckpt_dir: str,
    params_g,
    params_d=None,
    params_dd=None,
    params_wd=None,
):
    """Initialize params from the newest reference G_/D_/DUR_/WD_*.pth found in
    ckpt_dir (the reference's resume glob, utils.py:163-167). Missing files
    leave the given init params unchanged. Returns (params..., iteration)."""
    from bert_vits2_tpu.compat import (
        import_dur_disc_checkpoint,
        import_generator_checkpoint,
        import_mpd_checkpoint,
        import_wavlm_disc_checkpoint,
    )

    def newest(prefix):
        if not os.path.isdir(ckpt_dir):
            return None
        cands = [
            f for f in os.listdir(ckpt_dir)
            if re.fullmatch(rf"{prefix}_\d+\.pth", f)
        ]
        if not cands:
            return None
        return os.path.join(
            ckpt_dir, max(cands, key=lambda f: int(re.findall(r"\d+", f)[0]))
        )

    iteration = 0
    p = newest("G")
    if p:
        params_g, it, _ = import_generator_checkpoint(p, params_g, strict=False)
        iteration = it or 0
    p = newest("D")
    if p and params_d is not None:
        params_d, _, _ = import_mpd_checkpoint(p, params_d, strict=False)
    p = newest("DUR")
    if p and params_dd is not None:
        params_dd, _, _ = import_dur_disc_checkpoint(p, params_dd, strict=False)
    p = newest("WD")
    if p and params_wd is not None:
        params_wd, _, _ = import_wavlm_disc_checkpoint(p, params_wd, strict=False)
    return params_g, params_d, params_dd, params_wd, iteration
