"""Aggregation + interpolation networks (the reference's model family,
ns/model/agg_interp.py:80-486, rebuilt as jit-end-to-end Flax modules).

``FullAggNet`` is the flagship: one fully-jitted forward pass runs

    node scores (AggNet: iterated TAGConv+MLP + top-k)          -> centers
    Bellman-Ford edge weights (CNet MPNN)                       -> C matrix
    on-device Bellman-Ford                                      -> aggregates
    interpolation smoother P-hat (PNet MPNN on 2-feature graph) -> P = P-hat Agg

The reference leaves the pipeline un-differentiable (discrete top-k + C++
Bellman-Ford, trained by GA); here the *whole* pipeline — including BF —
is one XLA program, so a GA generation's entire population can be evaluated
as a single vmapped computation on the MXU/VPU (see mlamg_tpu.ga).

Static-shape contract: n, nnz_pad, and k are static per problem bucket;
``k = ceil(alpha * n)`` is computed by the caller (``forward`` helper).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from mlamg_tpu.ops.sparse import CSR
from mlamg_tpu.graph.topk import topk_mask, topk_indices
from mlamg_tpu.graph.bellman_ford import (
    bellman_ford,
    bellman_ford_pull,
    nearest_center_to_agg,
)
from mlamg_tpu.models.graphdata import (
    GraphData,
    graph_from_matrix_basic,
    graph_from_matrix,
    gather_src,
    gather_dst,
)
from mlamg_tpu.models.gnn import MLP, InstanceNorm, TAGConv, NNConv, EdgeModel


class MPNN(nn.Module):
    """Residual message-passing stack with edge-feature updates
    (reference agg_interp.py:80-148): NNConv node updates + edge MLPs,
    instance-normalized, with an input lift, ``num_internal_conv`` internal
    blocks, and scalar node/edge heads."""

    dim: int
    num_internal_conv: int = 4
    input_edge_features: int = 1

    @nn.compact
    def __call__(self, g: GraphData):
        x = g.x  # (n, 1)
        e = g.edge_attr  # (E, Fe)
        nm = g.node_mask

        # input block
        h = NNConv(1, self.dim, name="node_conv_in")(
            g, InstanceNorm()(x, nm), jnp.abs(e)
        )
        x = nn.relu(h) + x  # broadcast (n,1) -> (n,dim)
        e_new = EdgeModel(self.dim, 2, name="edge_conv_in")(
            gather_src(g, x), gather_dst(g, x), e
        )
        e = nn.relu(e_new) + e  # broadcast to (E, 2)

        # internal residual blocks
        for i in range(self.num_internal_conv):
            h = NNConv(self.dim, self.dim, name=f"node_conv_{i}")(
                g, InstanceNorm()(x, nm), e
            )
            x = nn.relu(h) + x
            e_new = EdgeModel(self.dim, 2, name=f"edge_conv_{i}")(
                gather_src(g, x), gather_dst(g, x), e
            )
            e = nn.relu(e_new) + e

        # output heads (positive bias init keeps the single-unit ReLU heads
        # alive at init — see gnn.EdgeModel.out_bias_init)
        x = nn.relu(
            NNConv(self.dim, 1, name="node_conv_out")(g, InstanceNorm()(x, nm), e)
        )
        e = nn.relu(
            EdgeModel(self.dim, 1, name="edge_conv_out", out_bias_init=0.1)(
                gather_src(g, x), gather_dst(g, x), e
            )
        )
        return x, e


def pad_aware_scores(scores: jax.Array, k: int, pad=None) -> jax.Array:
    """Score masking for shape-bucket padding.

    With ``pad = (n_real, k_real)`` (traced scalars), the k-entry top-k must
    select exactly ``k_real`` *real* nodes; the remaining ``k - k_real``
    slots are pinned to designated padding nodes (ids n_real ..
    n_real + k - k_real), whose aggregates stay disconnected from the real
    block and cannot affect the solve.  Without ``pad`` this is identity.
    """
    if pad is None:
        return scores
    n_real, k_real = pad
    nid = jnp.arange(scores.shape[0])
    big = jnp.asarray(1e30, scores.dtype)
    pad_hot = (nid >= n_real) & (nid < n_real + (k - k_real))
    return jnp.where(nid < n_real, scores, jnp.where(pad_hot, big, -big))


class AggBinarizationLayer(nn.Module):
    """[InstanceNorm -> TAGConv -> ReLU -> MLP] x num_conv -> top-k
    (reference agg_interp.py:151-230)."""

    dim: int
    num_conv: int = 6

    @nn.compact
    def __call__(self, g: GraphData, x: jax.Array, k: int, pad=None):
        # conv weights: last edge feature — |a_ij| normally, the
        # row-normalized strength when rel_strength is on (scale-invariant
        # anisotropy signal; identical to [:, 0] with a 1-feature graph)
        ew = g.edge_attr[:, -1]
        for i in range(self.num_conv):
            out_dim = self.dim
            head = 1 if i == self.num_conv - 1 else self.dim
            x = InstanceNorm()(x, g.node_mask)
            x = TAGConv(out_dim, name=f"tag_{i}")(g, x, ew)
            x = nn.relu(x)
            x = MLP([self.dim] * 4 + [head], name=f"mlp_{i}")(x)
        scores = pad_aware_scores(x[:, 0], k, pad)
        return topk_mask(scores, k)[:, None], scores


class AggNet(nn.Module):
    """Iterated binarization (reference agg_interp.py:233-254)."""

    dim: int
    iterations: int = 2
    num_conv: int = 6

    @nn.compact
    def __call__(self, g: GraphData, k: int, return_intermediate: bool = False,
                 pad=None):
        x = g.x
        scores = None
        masks = []
        for i in range(self.iterations):
            x, scores = AggBinarizationLayer(
                self.dim, self.num_conv, name=f"layer_{i}"
            )(g, x, k, pad=pad)
            masks.append(x[:, 0])
        if return_intermediate:
            # role of the reference's all_intermediate_topk (agg_interp.py:248-254)
            return masks
        return x[:, 0], scores


class FullAggNet(nn.Module):
    """AggNet + CNet (BF weights) + PNet (interpolation smoother)
    — reference agg_interp.py:369-486."""

    dim: int = 64
    num_conv: int = 2
    iterations: int = 4
    # static max row degree of A's (symmetric) pattern: enables the
    # gather-only pull-mode Bellman-Ford (see graph/bellman_ford.py) —
    # the push form's per-sweep segment_min scatter dominates the whole
    # forward on TPU.  None falls back to push mode.
    bf_width: Optional[int] = None
    # append the row-normalized strength edge feature to the AggNet/CNet
    # input graph (see graphdata.graph_from_matrix_basic) — scale-invariant
    # strong-direction signal for anisotropic operators.  Changes parameter
    # shapes; recorded in checkpoint net_config.
    rel_strength: bool = False

    def setup(self):
        self.PNet = MPNN(self.dim, num_internal_conv=4, input_edge_features=2)
        self.AggNetM = AggNet(self.dim, iterations=self.iterations, num_conv=self.num_conv)
        self.CNet = MPNN(self.dim, num_internal_conv=5, input_edge_features=1)

    def _bf(self, C, centers):
        if self.bf_width is not None:
            return bellman_ford_pull(C, centers, width=self.bf_width)
        return bellman_ford(C, centers)

    def basic_graph(self, A: CSR, n_real=None):
        return graph_from_matrix_basic(
            A, n_real=n_real, ell_width=self.bf_width,
            rel_strength=self.rel_strength,
        )

    def agg_only(self, A: CSR, k: int):
        g = self.basic_graph(A)
        node_mask, scores = self.AggNetM(g, k)
        centers = topk_indices(scores, k)
        _, bf_edges = self.CNet(g)
        C = A.with_data(jnp.where(A.mask, bf_edges[:, 0], 0.0))
        _, nearest = self._bf(C, centers)
        return nearest_center_to_agg(centers, nearest)

    def int_only(self, A: CSR, agg_id: jax.Array, k: int) -> CSR:
        g2 = graph_from_matrix(A, agg_id)
        _, p_edges = self.PNet(g2)
        return _phat_times_agg(A, p_edges[:, 0], agg_id, k)

    def __call__(self, A: CSR, k: int, pad=None):
        """Full pipeline. Returns (agg_id, P (CSR n x k), C, centers, scores).

        ``pad = (n_real, k_real)`` enables shape-bucket padding: A holds a
        real grid in its leading n_real rows plus identity padding rows;
        exactly k_real centers land on real nodes (see pad_aware_scores) and
        padding rows get unit P entries so the coarse operator stays
        block-diagonal and nonsingular.
        """
        n = A.shape[0]
        n_real = None if pad is None else pad[0]
        g = self.basic_graph(A, n_real=n_real)

        # 1. node scores -> centers
        node_mask, scores = self.AggNetM(g, k, pad=pad)
        centers = topk_indices(scores, k)

        # 2. learned Bellman-Ford weights on A's pattern
        _, bf_edges = self.CNet(g)
        C = A.with_data(jnp.where(A.mask, bf_edges[:, 0], 0.0))

        # 3. aggregate assignment by on-device BF
        _, nearest = self._bf(C, centers)
        agg_id = nearest_center_to_agg(centers, nearest)

        # 4. interpolation smoother on the 2-feature graph
        g2 = graph_from_matrix(A, agg_id, n_real=n_real, ell_width=self.bf_width)
        _, p_edges = self.PNet(g2)
        P = _phat_times_agg(A, p_edges[:, 0], agg_id, k, n_real=n_real)
        return agg_id, P, C, centers, node_mask


class AggOnlyNet(nn.Module):
    """Learned aggregation + classical Jacobi-SA smoothing
    (reference agg_interp.py:257-294)."""

    dim: int = 64
    num_conv: int = 6
    iterations: int = 2
    bf_width: Optional[int] = None  # see FullAggNet.bf_width
    rel_strength: bool = False  # see FullAggNet.rel_strength

    def setup(self):
        self.AggNetM = AggNet(self.dim, iterations=self.iterations, num_conv=self.num_conv)
        self.CNet = MPNN(self.dim, num_internal_conv=5, input_edge_features=1)

    def __call__(self, A: CSR, k: int, pad=None):
        from mlamg_tpu.mg.interp import smoothed_aggregation

        g = graph_from_matrix_basic(
            A, n_real=None if pad is None else pad[0], ell_width=self.bf_width,
            rel_strength=self.rel_strength,
        )
        node_mask, scores = self.AggNetM(g, k, pad=pad)
        centers = topk_indices(scores, k)
        _, bf_edges = self.CNet(g)
        C = A.with_data(jnp.where(A.mask, bf_edges[:, 0], 0.0))
        if self.bf_width is not None:
            _, nearest = bellman_ford_pull(C, centers, width=self.bf_width)
        else:
            _, nearest = bellman_ford(C, centers)
        agg_id = nearest_center_to_agg(centers, nearest)
        P = smoothed_aggregation(A, agg_id, k)
        return agg_id, P, C, centers, node_mask


def _phat_times_agg(A: CSR, phat_data: jax.Array, agg_id: jax.Array, k: int,
                    n_real=None) -> CSR:
    """P = P_hat @ Agg without an SpGEMM: P_hat has A's pattern and Agg is a
    column selection, so P is A's pattern with columns remapped to aggregate
    ids (duplicates within a row sum implicitly in every product).

    With shape-bucket padding (``n_real``), padding rows get value 1.0: the
    padding block of P^T A P is then a unit diagonal regardless of the PNet
    output (a ReLU-zero there would make the coarse LU singular and poison
    the whole padded solve with NaNs).
    """
    n = A.shape[0]
    live = A.mask
    new_col = agg_id[A.col].astype(jnp.int32)
    assigned = new_col < k
    row = jnp.where(live & assigned, A.row, n)
    col = jnp.where(live & assigned, new_col, 0)
    data = jnp.where(live & assigned, phat_data, 0.0)
    if n_real is not None:
        rsafe = jnp.minimum(A.row, n - 1)
        is_pad_row = rsafe >= n_real
        data = jnp.where(live & assigned & is_pad_row, 1.0, data)
    return CSR(data, row, col, A.indptr, (n, k), A.nnz)


def make_forward(model: nn.Module, alpha: float):
    """Host helper: returns f(params, A) with k = ceil(alpha * n) resolved
    statically from A's (static) shape — the jit boundary of the pipeline."""

    def f(params, A: CSR):
        k = int(np.ceil(alpha * A.shape[0]))
        return model.apply(params, A, k)

    return f
