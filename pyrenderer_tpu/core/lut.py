"""Row-table fetches tuned for TPU.

`table[idx]` gathers are slow on TPU (~4.5 ms per 1M rows on v5e regardless
of table size); a one-hot matmul runs the same fetch on the MXU in ~2.8 ms
and is EXACT: the one-hot operand is exactly 0/1, so each output element is
a single unscaled table value — no accumulation error even at f32.
Gradients w.r.t. the table flow through the matmul (indices are integers and
inherently detached).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fetch_rows(table, idx):
    """out[i, :] = table[idx[i], :] via one-hot matmul. table: (T, K), idx: (N,)."""
    t = table.shape[0]
    oh = jax.nn.one_hot(idx, t, dtype=table.dtype)
    return jnp.dot(oh, table, precision=jax.lax.Precision.HIGHEST)
