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


def soft_topk_mask(x: jax.Array, k: int, sigma: float = 1.0) -> jax.Array:
    """Differentiable top-k relaxation: sigmoid((x - t_k) / sigma) where t_k
    is the midpoint between the k-th and (k+1)-th largest scores.

    The continuous-relaxation experiment of the reference's diff_top_k demo
    (demos/diff_top_k.py:115-122): as sigma -> 0 this approaches
    :func:`topk_mask`; gradients flow to every score.  The threshold is
    treated as locally constant (stop_gradient), giving the straight-through
    style estimator the demo trains with.
    """
    x = x.reshape(-1)
    vals, _ = jax.lax.top_k(x, min(k + 1, x.shape[0]))
    if k < x.shape[0]:
        thresh = (vals[k - 1] + vals[k]) / 2.0
    else:
        thresh = vals[-1] - 1.0
    thresh = jax.lax.stop_gradient(thresh)
    return jax.nn.sigmoid((x - thresh) / sigma)
