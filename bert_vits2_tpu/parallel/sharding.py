"""Tensor-parallel partition specs for the synthesizer / train state.

The reference's only distribution strategy is DDP data parallelism
(train_ms.py:250-258). Here the `model` mesh axis additionally shards the
transformer blocks (text encoder + transformer-coupling flow) Megatron-style
and the WaveNet posterior stacks channel-wise:

- attention q/k/v projections + FFN first conv: column-parallel
  (output features sharded, each shard computes its slice of heads/filters);
- attention output + FFN second conv: row-parallel (input features sharded,
  XLA inserts the reduce over `model`);
- WN `in_layers` / `cond_layer`: column-parallel over the gated channels;
  `res_skip_layers`: row-parallel.

Everything else (embeddings, LayerNorms, vocoder, duration predictors,
discriminators) stays replicated — those layers are small or reshape-heavy,
and the transformer/WN stacks are where the parameters and FLOPs live.

These are GSPMD *layout* annotations, not a manual parallel algorithm: the
model code is unchanged and XLA inserts the collectives, so any rule here is
semantics-preserving by construction. A dimension that does not divide the
`model` axis size falls back to replicated.

Optimizer state shards with its parameters: the optax AdamW mu/nu trees
mirror the param tree, and the rules match on the path *suffix*, so the same
spec function applies to the whole TrainState.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bert_vits2_tpu.parallel.mesh import MODEL_AXIS


def _path_str(path) -> str:
    return "/".join(
        str(k.key) if hasattr(k, "key") else str(getattr(k, "name", k))
        for k in path
    )


def tp_spec(path, leaf, n_model: int, axis: str = MODEL_AXIS):
    """PartitionSpec for one leaf of a params / optimizer-state tree."""
    if n_model <= 1 or not hasattr(leaf, "ndim") or leaf.ndim == 0:
        return P()
    joined = _path_str(path)
    name = joined.rsplit("/", 1)[-1]

    def col(dim_axis: int):
        # shard the output-features dim (last) of kernel/v, and the matching
        # 1-d g/bias vectors
        if name in ("kernel", "v") and leaf.shape[-1] % n_model == 0:
            spec = [None] * leaf.ndim
            spec[-1] = axis
            return P(*spec)
        if name in ("bias", "g") and leaf.ndim == 1 and leaf.shape[0] % n_model == 0:
            return P(axis)
        return P()

    def row():
        # shard the input-features dim (second-to-last) of kernel/v; bias and
        # g follow the (unsharded) output dim, so they stay replicated
        if (
            name in ("kernel", "v")
            and leaf.ndim >= 2
            and leaf.shape[-2] % n_model == 0
        ):
            spec = [None] * leaf.ndim
            spec[-2] = axis
            return P(*spec)
        return P()

    # transformer blocks (attn_layers_* / ffn_layers_* inside any Encoder:
    # text encoder and transformer-coupling flow)
    if "/conv_q/" in joined or "/conv_k/" in joined or "/conv_v/" in joined:
        return col(-1)
    if "/conv_o/" in joined:
        return row()
    if "ffn_layers_" in joined and "/conv_1/" in joined:
        return col(-1)
    if "ffn_layers_" in joined and "/conv_2/" in joined:
        return row()

    # WaveNet stacks (posterior encoder / residual coupling / SDP post-conv)
    if "in_layers_" in joined or "/cond_layer/" in joined:
        return col(-1)
    if "res_skip_layers_" in joined:
        return row()

    return P()


def tp_shard_tree(mesh: Mesh, tree, axis: str = MODEL_AXIS):
    """device_put every leaf with its TP spec (replicated where no rule hits).

    Works on params trees and whole TrainStates (optimizer mu/nu mirror the
    param paths). With a 1-sized `model` axis this degrades to replicate().
    """
    n_model = mesh.shape.get(axis, 1)

    def put(path, leaf):
        if leaf is None:
            return None
        return jax.device_put(
            leaf, NamedSharding(mesh, tp_spec(path, leaf, n_model, axis))
        )

    return jax.tree_util.tree_map_with_path(put, tree)


def tp_specs(tree, n_model: int, axis: str = MODEL_AXIS):
    """The spec tree itself (for orbax restore targets / inspection)."""
    return jax.tree_util.tree_map_with_path(
        lambda p, l: tp_spec(p, l, n_model, axis), tree
    )
