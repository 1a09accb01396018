"""Pair-axis-sharded multi-pair matching (net-new TPU design, SURVEY §5).

Cambridge-style multi-pair retrieval matches the SAME query image against
``pair_topk`` reference point sets (reference loops pairs on host,
``nerfmatch_evaluator.py:150-230``; this repo runs them device-resident
under ``lax.map``).  Pairs are independent, so on a mesh the K axis shards
over ``data``: every device lax.maps over its K/d local pairs with the
query's image features closed over (replicated), and the stacked (K, B, M)
match outputs come back pair-sharded with no collectives at all.

Complements :mod:`.point_sharding` (which shards the POINT axis of one
merged matching problem): pair sharding wins when K pairs stay separate
matching problems (per-pair dual-softmax normalization, the reference's
multi-pair semantics); point sharding wins when the pairs merge into one
big point cloud (``NeRFMatchMultiPair``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def map_pairs_sharded(mesh, one_pair, args_k, axis: str = "data"):
    """``lax.map(one_pair, args_k)`` with the leading pair axis sharded.

    ``args_k``: pytree of arrays with leading dim K.  K is padded to a
    multiple of the mesh axis size by repeating the first pair (the padded
    outputs are sliced away), so any ``pair_topk`` works on any mesh.
    Values ``one_pair`` closes over (image features, params) are replicated
    into every shard by ``shard_map``'s closure capture.
    """
    n_dev = mesh.shape[axis]
    K = jax.tree_util.tree_leaves(args_k)[0].shape[0]
    K_pad = -(-K // n_dev) * n_dev

    def pad(x):
        if K_pad == K:
            return x
        return jnp.concatenate(
            [x, jnp.broadcast_to(x[:1], (K_pad - K, *x.shape[1:]))], axis=0)

    padded = jax.tree_util.tree_map(pad, args_k)
    sharded = jax.shard_map(
        lambda a: jax.lax.map(one_pair, a), mesh=mesh,
        in_specs=(P(axis),), out_specs=P(axis), check_vma=False)
    out = sharded(padded)
    return jax.tree_util.tree_map(lambda x: x[:K], out)
