"""Flax GNN building blocks on segment ops.

TPU re-designs of the torch_geometric layers the reference builds on:
TAGConv (K-hop polynomial of the normalized weighted adjacency — pure
SpMV/matmul work, cf. the reference's own numpy ``MatConv`` demo proving
the family reduces to A-polynomials, demos/matconv.py:53-71), an
edge-conditioned convolution in the spirit of NNConv (ns/model/agg_interp.py:85),
edge MLPs (smallEdgeModel, agg_interp.py:37-56), and graph InstanceNorm.

Everything is jit/vmap-safe with static shapes; message passing is
gather -> VPU math -> segment-sum.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from mlamg_tpu.models.graphdata import GraphData, gather_src, gather_dst, scatter_to_dst


class MLP(nn.Module):
    """Dense stack with ReLU between layers (and optionally after the last)."""

    features: Sequence[int]
    act_last: bool = True

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f)(x)
            if i < len(self.features) - 1 or self.act_last:
                x = nn.relu(x)
        return x


class InstanceNorm(nn.Module):
    """Graph-wise feature normalization (role of tg.nn.norm.InstanceNorm,
    affine=False): zero mean / unit variance over the node axis.

    With ``mask`` (shape-bucket padding), statistics run over real nodes
    only so padded grids reproduce the unpadded outputs on real nodes —
    and padding-node outputs are zeroed.  Without the zeroing, padding
    activations are *amplified* by rsqrt(var) each call (they don't
    contribute to var, so nothing bounds them); across a deep residual
    MPNN they overflow f32 and the masked variance becomes 0 * inf = NaN,
    poisoning the real outputs too."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, mask=None):
        if mask is None:
            mean = jnp.mean(x, axis=0, keepdims=True)
            var = jnp.var(x, axis=0, keepdims=True)
            return (x - mean) * jax.lax.rsqrt(var + self.eps)
        m = mask.astype(x.dtype)[:, None]
        cnt = jnp.maximum(jnp.sum(m), 1.0)
        mean = jnp.sum(x * m, axis=0, keepdims=True) / cnt
        d = (x - mean) * m
        var = jnp.sum(d * d, axis=0, keepdims=True) / cnt
        return d * jax.lax.rsqrt(var + self.eps)


class LayerNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.eps)(x)


def _sym_norm_weights(g: GraphData, edge_weight: jax.Array) -> jax.Array:
    """D^-1/2 W D^-1/2 edge scaling for TAGConv (degrees from |weights|)."""
    n = g.n
    mask = g.edge_mask
    w = jnp.where(mask, edge_weight, 0.0)
    src = jnp.minimum(g.src, n - 1)
    deg = scatter_to_dst(g, jnp.abs(w)[:, None])[:, 0]
    dinv_sqrt = jax.lax.rsqrt(jnp.maximum(deg, 1e-12))
    return w * dinv_sqrt[src] * dinv_sqrt[g.dst] * mask


class TAGConv(nn.Module):
    """Topology-adaptive graph conv: y = sum_{k=0..K} hat(A)^k x W_k."""

    out_dim: int
    K: int = 3

    @nn.compact
    def __call__(self, g: GraphData, x: jax.Array, edge_weight: jax.Array):
        w = _sym_norm_weights(g, edge_weight)
        src = jnp.minimum(g.src, g.n - 1)

        def prop(h):
            msg = w[:, None] * h[src]
            return scatter_to_dst(g, msg)

        h = x
        out = nn.Dense(self.out_dim)(h)
        for _ in range(self.K):
            h = prop(h)
            out = out + nn.Dense(self.out_dim, use_bias=False)(h)
        return out


class EdgeModel(nn.Module):
    """Edge MLP on concat(src_feat, dst_feat, edge_attr)
    (role of smallEdgeModel, agg_interp.py:37-56).

    ``out_bias_init`` biases the final layer positive: a single-unit head
    behind a ReLU sees near-constant inputs at init (the edge embeddings
    are not yet differentiated), so with a zero bias the whole head is
    dead-on-arrival for ~half the seeds — unrecoverable by gradient
    descent (ReLU has zero gradient there), merely slow for the GA.
    """

    hid_dim: int
    out_dim: int
    out_bias_init: float = 0.0

    @nn.compact
    def __call__(self, src_feat, dst_feat, edge_attr):
        h = jnp.concatenate([src_feat, dst_feat, edge_attr], axis=1)
        h = nn.relu(nn.Dense(self.hid_dim)(h))
        h = nn.LayerNorm()(h)
        return nn.Dense(
            self.out_dim,
            bias_init=nn.initializers.constant(self.out_bias_init),
        )(h)


class EdgeConv(nn.Module):
    """Deeper edge MLP (role of EdgeConvModel, agg_interp.py:59-77)."""

    hid_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, g: GraphData, x: jax.Array, edge_attr: jax.Array):
        h = jnp.concatenate([gather_src(g, x), gather_dst(g, x), edge_attr], axis=1)
        h = nn.relu(nn.Dense(self.hid_dim)(h))
        h = nn.LayerNorm()(h)
        h = nn.relu(nn.Dense(self.hid_dim)(h))
        h = nn.LayerNorm()(h)
        return nn.Dense(self.out_dim)(h)


class NNConv(nn.Module):
    """Edge-conditioned convolution: a small MLP maps each edge's features to
    an (in_dim x out_dim) mixing matrix applied to the source node feature
    (role of tg.nn.NNConv with its nn=Sequential edge network,
    agg_interp.py:85-90,100-105).
    """

    in_dim: int
    out_dim: int
    edge_hidden: Sequence[int] = (4, 16)

    @nn.compact
    def __call__(self, g: GraphData, x: jax.Array, edge_attr: jax.Array):
        E = edge_attr.shape[0]
        h = edge_attr
        for f in self.edge_hidden:
            h = nn.relu(nn.Dense(f)(h))
        W = nn.relu(nn.Dense(self.in_dim * self.out_dim)(h))
        W = W.reshape(E, self.in_dim, self.out_dim)
        xs = gather_src(g, x)  # (E, in_dim)
        msg = jnp.einsum("ei,eio->eo", xs, W)
        agg = scatter_to_dst(g, msg)
        root = nn.Dense(self.out_dim)(x)
        return root + agg
