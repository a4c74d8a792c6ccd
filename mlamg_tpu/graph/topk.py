"""Top-k node selection (jitted).

Role of the reference's argsort-based ``topk_vec`` (ns/model/agg_interp.py:14-22)
and the quickselect variant (ns/lib/helpers.py:281-329).  On TPU this is just
``jax.lax.top_k`` — O(n log k), fused, static-shaped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def topk_indices(x: jax.Array, k: int) -> jax.Array:
    """Indices of the k largest entries of 1-D ``x`` (static k)."""
    x = x.reshape(-1)
    _, idx = jax.lax.top_k(x, k)
    return idx


def topk_mask(x: jax.Array, k: int) -> jax.Array:
    """Binary (n,) vector with 1.0 at the k largest entries of ``x``.

    Matches the reference's ``topk_vec`` semantics (ties broken by order of
    ``lax.top_k``, which takes the earliest index — same as a stable argsort).
    """
    x = x.reshape(-1)
    idx = topk_indices(x, k)
    return jnp.zeros(x.shape, x.dtype).at[idx].set(1.0)
