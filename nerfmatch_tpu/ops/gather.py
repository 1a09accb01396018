"""TPU-friendly differentiable row gathers.

The transpose of a row gather is a scatter-add, which XLA serializes on TPU
(one update per index) — in the c2f matcher train step the fine-window /
point-feature selections (reference ``nerfmatch/nerfmatch.py`` fine
preprocessing) would otherwise dominate the backward pass.  Here the
backward is expressed as a one-hot matmul ``one_hot(idx).T @ g`` which runs
on the MXU in one shot; the forward stays a plain (fast) gather.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _take_rows(table, idx, n_rows: int):
    return jnp.take(table, idx, axis=0)


def _take_rows_fwd(table, idx, n_rows):
    return jnp.take(table, idx, axis=0), idx


def _take_rows_bwd(n_rows, idx, g):
    onehot = jax.nn.one_hot(idx, n_rows, dtype=jnp.float32)
    g_table = jnp.einsum("ln,lc->nc", onehot, g.astype(jnp.float32),
                         precision=jax.lax.Precision.HIGHEST)
    return g_table.astype(g.dtype), None


_take_rows.defvjp(_take_rows_fwd, _take_rows_bwd)


def take_rows(table, idx):
    """``table[idx]`` for a 2-D ``table (N, C)`` and int ``idx (L,)``.

    Differentiable w.r.t. ``table``; backward is an MXU matmul instead of a
    scatter-add.
    """
    return _take_rows(table, idx, table.shape[0])


def take_rows_b(table_b, b_ids, r_ids):
    """Batched variant: ``table_b[b_ids, r_ids]`` for ``table_b (B, M, C)``."""
    B, M, C = table_b.shape
    return take_rows(table_b.reshape(B * M, C), b_ids * M + r_ids)
