"""Differentiable relaxation of the FullAggNet AMG pipeline.

The torch reference cannot train its flagship model by gradient descent:
the forward pass runs a hard top-k and a C++ Bellman-Ford, so it falls
back to a genetic algorithm over 16k weights (ns/ga/parga.py,
utils/train_dataset.py:120-138).  This module is the jax answer: a soft
surrogate of the exact same pipeline whose value converges to the
discrete forward as the temperatures go to zero, and through which
``amg_loss`` (the differentiable two-level convergence factor,
ns/model/loss.py:32-96) backpropagates into all three sub-networks:

- **PNet**: exact gradients (P values enter the loss directly).
- **CNet**: gradients along shortest-path trees — the (n, k) multi-source
  Bellman-Ford distance matrix is computed by vectorized min-plus
  relaxation (``multi_source_bf``), which is piecewise differentiable in
  the edge weights, and the hard per-node argmin assignment is replaced
  by a softmax over centers (``soft_assignment``).
- **AggNet**: gradients through center *inclusion weights* — each chosen
  center's soft top-k mask value enters the assignment logits, so scores
  of useful centers are pushed up and scores of harmful ones down (the
  center *set* updates between steps as the scores reorder).

Scale invariance: the discrete pipeline's BF assignment is invariant to
positive scaling of the C matrix, so training normalizes C to unit mean
edge weight — this changes nothing in the hard forward while giving the
assignment temperature a fixed, grid-independent meaning.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from mlamg_tpu.ops.sparse import CSR
from mlamg_tpu.ops.matmul import spmm
from mlamg_tpu.graph.topk import topk_indices, soft_topk_mask
from mlamg_tpu.graph.bellman_ford import bellman_ford, nearest_center_to_agg
from mlamg_tpu.models.graphdata import graph_from_matrix_basic, graph_from_matrix
from mlamg_tpu.models.loss import amg_loss

_BIG = 1e6  # finite "infinity": keeps arithmetic NaN-free under autodiff


@dataclasses.dataclass(frozen=True)
class SoftConfig:
    """Temperatures and loop counts of the relaxation."""

    bf_iters: int = 32  # min-plus sweeps (≥ weighted-graph hop diameter)
    tau_assign: float = 0.08  # softmax temperature of the (n,k) assignment
    topk_sigma: float = 0.5  # soft top-k sharpness for center weights
    center_weight: float = 1.0  # λ multiplying log(mask) in the logits
    num_loops: int = 5  # amg_loss power-iteration loops
    test_vectors: int = 32
    omega: float = 2.0 / 3.0
    ridge: float = 1e-4  # relative coarse-diagonal ridge (degeneracy guard)
    # Straight-through estimator: forward with the HARD nearest-center
    # assignment (the exact discrete pipeline's P), backward through the
    # soft relaxation.  The loss value then measures the real P — without
    # this the optimizer exploits assignment blending (a temperature-soft P
    # has wider support and better convergence than any hard P it rounds
    # to, so soft progress stops translating into discrete progress).
    straight_through: bool = True


def multi_source_bf(C: CSR, centers: jax.Array, num_iters: int) -> jax.Array:
    """(n, k) shortest-path distances from every node to each center.

    Vectorized min-plus Bellman-Ford: iteration j relaxes *all* edges for
    *all* k sources at once (segment-min over edge targets).  Unlike the
    scalar :func:`~mlamg_tpu.graph.bellman_ford.bellman_ford` (which tracks
    only the nearest center), the full matrix is what the soft assignment
    needs.  Differentiable a.e. w.r.t. ``C.data`` — gradients flow along
    the (unique) shortest-path tree of each (node, center) pair.

    Cost: O(num_iters * nnz * k) VPU work, static shapes. Training grids
    are tiny (n ≤ 512), so this is microseconds on an accelerator.
    """
    n = C.shape[0]
    k = centers.shape[0]
    row, col, w = C.row, C.col, C.data
    live = row < n
    w = jnp.where(live, w, _BIG)
    rsafe = jnp.minimum(row, n - 1)
    csafe = jnp.where(live, col, n)  # segment sentinel

    D0 = jnp.full((n, k), _BIG, w.dtype).at[centers, jnp.arange(k)].min(0.0)

    def body(D, _):
        cand = D[rsafe] + w[:, None]  # (E, k)
        best_in = jax.ops.segment_min(cand, csafe, num_segments=n + 1)[:n]
        return jnp.minimum(D, best_in), None

    D, _ = jax.lax.scan(jax.checkpoint(body), D0, None, length=num_iters)
    return D


def soft_assignment(
    D: jax.Array, log_center_weight: jax.Array, tau: float
) -> jax.Array:
    """(n, k) soft aggregate-membership from distances + center weights.

    W[i, j] = softmax_j(-D[i, j] / tau + log_center_weight[j]); as tau -> 0
    this is the hard nearest-center one-hot (the discrete pipeline's
    ``nearest_center_to_agg``).  Unreachable (i, j) pairs get exactly zero;
    fully unreachable rows (disconnected padding nodes) get a zero row.
    """
    logits = -D / tau + log_center_weight[None, :]
    dead = D >= _BIG / 2
    logits = jnp.where(dead, -jnp.inf, logits)
    mx = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.where(dead, 0.0, jnp.exp(logits - jnp.where(jnp.isfinite(mx), mx, 0.0)))
    return e / jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-30)


def _soft_parts(mdl, A: CSR, k: int, pad=None):
    """FullAggNet sub-network outputs for the soft pipeline (run via
    ``net.apply(params, A, k, pad, method=_soft_parts)``).

    Mirrors FullAggNet.__call__ (models/agg_interp.py:181-210) but returns
    the raw heads; the discrete aggregation used for PNet's cluster-
    adjacency feature is taken under stop_gradient (it is an input
    *feature*, not a learned quantity).
    """
    n_real = None if pad is None else pad[0]
    g = graph_from_matrix_basic(A, n_real=n_real,
                                rel_strength=mdl.rel_strength)
    _, scores = mdl.AggNetM(g, k, pad=pad)
    centers = topk_indices(scores, k)
    _, bf_edges = mdl.CNet(g)
    c_data = jnp.where(A.mask, bf_edges[:, 0], 0.0)

    # hard aggregation (stop-grad) for the PNet input features only
    C_hard = A.with_data(jax.lax.stop_gradient(c_data))
    _, nearest = bellman_ford(C_hard, centers)
    agg_id = nearest_center_to_agg(centers, nearest)

    g2 = graph_from_matrix(A, agg_id, n_real=n_real)
    _, p_edges = mdl.PNet(g2)
    return scores, centers, c_data, p_edges[:, 0], agg_id


def soft_interpolation(
    net,
    params,
    A: CSR,
    k: int,
    cfg: SoftConfig,
    pad=None,
):
    """Differentiable P (dense (n, k)) from the soft pipeline.

    Returns (P_soft, aux) where aux carries the discrete byproducts
    (centers, agg_id) for monitoring.
    """
    scores, centers, c_data, phat, agg_id = net.apply(
        params, A, k, pad, method=_soft_parts
    )

    # scale-invariant C normalization (see module docstring)
    live = A.mask
    c_abs = jnp.abs(c_data)
    mean_c = jnp.sum(jnp.where(live, c_abs, 0.0)) / jnp.maximum(
        jnp.sum(live), 1
    )
    c_norm = c_abs / jnp.maximum(mean_c, 1e-30)
    C = A.with_data(jnp.where(live, c_norm, 0.0))

    D = multi_source_bf(C, centers, cfg.bf_iters)

    # center inclusion weights: soft top-k mask values of the chosen centers
    m = soft_topk_mask(scores, k, sigma=cfg.topk_sigma)[centers]
    log_m = cfg.center_weight * jnp.log(m + 1e-9)
    W = soft_assignment(D, log_m, cfg.tau_assign)
    if cfg.straight_through:
        # hard forward = the exact discrete BF assignment already computed
        # in _soft_parts (including its smallest-center-id tie-breaking —
        # argmin over D would disagree on tied distances, which are common
        # while CNet's ReLU head still outputs zeros); backward flows
        # through the soft W
        assigned = agg_id < k
        W_hard = jax.nn.one_hot(
            jnp.where(assigned, agg_id, 0), k, dtype=W.dtype
        ) * assigned[:, None]
        W = W + jax.lax.stop_gradient(W_hard - W)

    # P = P_hat @ W: P_hat has A's pattern with PNet values; padding rows
    # (identity block) get value 1.0 exactly as _phat_times_agg does.
    pdata = phat
    if pad is not None:
        n = A.shape[0]
        rsafe = jnp.minimum(A.row, n - 1)
        pdata = jnp.where(live & (rsafe >= pad[0]), 1.0, pdata)
    Phat = A.with_data(jnp.where(live, pdata, 0.0))
    P_soft = spmm(Phat, W)  # (n, k) dense
    return P_soft, dict(centers=centers, agg_id=agg_id, assignment=W)


def soft_conv_loss(
    net,
    params,
    A: CSR,
    k: int,
    test_vecs: jax.Array,
    cfg: SoftConfig,
    pad=None,
    colors: jax.Array | None = None,
    num_colors: int = 0,
):
    """Differentiable two-level convergence factor of the soft pipeline.

    ``test_vecs`` should be zero on padding rows (the padding block is then
    exactly invisible: identity rows relax to zero and the disconnected
    coarse block receives zero residual).

    With ``colors``/``num_colors`` the error smoother is multicolor
    Gauss-Seidel — matching the measured cycle of the GA fitness and
    evaluate_dataset (mg/smoothers.py) — instead of weighted Jacobi.
    """
    P_soft, aux = soft_interpolation(net, params, A, k, cfg, pad=pad)

    smooth_fn = None
    if colors is not None and num_colors > 0:
        d = A.diagonal()
        Dinv = 1.0 / jnp.where(d != 0, d, 1.0)

        def smooth_fn(x):
            for c in range(num_colors):
                r = -spmm(A, x)
                upd = x + Dinv[:, None] * r
                x = jnp.where((colors == c)[:, None], upd, x)
            return x

    conv = amg_loss(
        P_soft,
        A,
        test_vecs,
        tot_num_loop=cfg.num_loops,
        omega=cfg.omega,
        ridge=cfg.ridge,
        smooth_fn=smooth_fn,
    )
    return conv, aux
