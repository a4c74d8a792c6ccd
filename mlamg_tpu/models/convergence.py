"""Convergence-factor regression GNN (role of ns/model/convergence.py).

Predicts the two-level convergence factor of a (matrix, interpolation)
pair directly: TAGConv tower over the matrix graph -> global mean pool ->
dense head -> scalar in (0, 1) (reference convergence.py:64-117 uses K=30
TAGConvs and a sigmoid head).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from mlamg_tpu.models.graphdata import GraphData
from mlamg_tpu.models.gnn import TAGConv


class ConvergencePredictor(nn.Module):
    """``logit_head`` returns the raw pre-sigmoid score; training in logit
    space avoids the saturated-sigmoid gradient collapse near conv ~ 1
    (corrupted-aggregation samples)."""

    dims: tuple = (32, 64, 64, 32)
    K: int = 30
    logit_head: bool = False

    @nn.compact
    def __call__(self, g: GraphData):
        x = g.x
        ew = g.edge_attr[:, 0]
        for i, d in enumerate(self.dims):
            x = nn.relu(TAGConv(d, K=self.K, name=f"tag_{i}")(g, x, ew))
        pooled = jnp.mean(x, axis=0)
        h = nn.relu(nn.Dense(32)(pooled))
        z = nn.Dense(1)(h)[0]
        return z if self.logit_head else nn.sigmoid(z)


def load_mat_dataset(splitting_pkl: str, mat_dir: str):
    """Dataset loader for pickled splittings + .mat matrices
    (role of MeshDataset, reference convergence.py:120-148).

    Returns a list of (scipy_csr, info_dict) pairs.
    """
    import os
    import pickle
    import scipy.io as sio
    import scipy.sparse as sp

    with open(splitting_pkl, "rb") as f:
        splittings = pickle.load(f)
    out = []
    for entry in splittings:
        mat = sio.loadmat(os.path.join(mat_dir, entry["matrix"]))
        A = sp.csr_matrix(mat[entry.get("key", "A")])
        out.append((A, entry))
    return out
