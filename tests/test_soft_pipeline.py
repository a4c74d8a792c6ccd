"""Differentiable soft-pipeline tests (models/soft_pipeline.py).

The soft relaxation must (1) agree with the discrete pipeline as the
temperatures go to zero / under straight-through, (2) expose usable
gradients to all three sub-networks, and (3) reduce the *discrete*
relative convergence factor when trained by Adam — the property the GA
cannot provide cheaply and the gradient trainer is built on.
"""

import numpy as np
import pytest
import scipy.sparse as sp
import jax
import jax.numpy as jnp

from mlamg_tpu.ops.sparse import CSR
from mlamg_tpu.graph.bellman_ford import bellman_ford
from mlamg_tpu.models.soft_pipeline import (
    SoftConfig,
    multi_source_bf,
    soft_assignment,
    soft_conv_loss,
    soft_interpolation,
)
from mlamg_tpu.models import FullAggNet
from mlamg_tpu.models.loss import amg_loss


def poisson2d(nx):
    I = sp.eye(nx)
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(nx, nx))
    return (sp.kron(I, T) + sp.kron(T, I)).tocsr()


@pytest.fixture
def rng():
    return np.random.RandomState(0)


class TestMultiSourceBF:
    def test_matches_scalar_bf(self, rng):
        # (n, k) distance matrix columns must equal scalar BF run per center
        A = poisson2d(6)
        n = A.shape[0]
        w = rng.rand(A.nnz).astype(np.float64) + 0.1
        C = CSR.from_scipy(
            sp.csr_matrix((w, A.indices, A.indptr), shape=A.shape),
            dtype=jnp.float64,
        )
        centers = jnp.asarray([3, 17, 30], jnp.int32)
        D = multi_source_bf(C, centers, num_iters=n)
        # oracle: min over centers must equal the fused BF distance
        dist, _ = bellman_ford(C, centers)
        np.testing.assert_allclose(
            np.asarray(jnp.min(D, axis=1)), np.asarray(dist), rtol=1e-12
        )

    def test_gradients_flow_to_weights(self, rng):
        A = poisson2d(5)
        w = rng.rand(A.nnz).astype(np.float64) + 0.1
        Ac = sp.csr_matrix((w, A.indices, A.indptr), shape=A.shape)
        centers = jnp.asarray([0, 24], jnp.int32)
        C0 = CSR.from_scipy(Ac, dtype=jnp.float64)

        def f(data):
            D = multi_source_bf(C0.with_data(data), centers, num_iters=30)
            return jnp.sum(jnp.where(D < 1e5, D, 0.0))

        data = C0.data
        g = jax.grad(f)(data)
        assert np.isfinite(np.asarray(g)).all()
        # shortest-path trees use a subset of edges; gradient is nonzero on
        # used edges, and finite-difference agrees on a perturbation that
        # does not change the argmin structure
        eps = 1e-7
        d = np.zeros_like(np.asarray(data))
        i = int(np.argmax(np.abs(np.asarray(g))))
        d[i] = eps
        fd = (f(data + d) - f(data - d)) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), float(fd), rtol=1e-5)


class TestSoftAssignment:
    def test_hard_limit(self):
        D = jnp.asarray([[0.0, 2.0], [3.0, 1.0], [1e7, 1e7]])
        W = soft_assignment(D, jnp.zeros(2), tau=1e-3)
        expect = np.array([[1, 0], [0, 1], [0, 0]], np.float64)
        np.testing.assert_allclose(np.asarray(W), expect, atol=1e-6)

    def test_rows_normalized_or_zero(self):
        D = jnp.asarray([[0.5, 0.7, 1e7], [1e7, 1e7, 1e7]])
        W = soft_assignment(D, jnp.zeros(3), tau=0.5)
        s = np.asarray(jnp.sum(W, axis=1))
        np.testing.assert_allclose(s, [1.0, 0.0], atol=1e-12)


class TestSoftConvLoss:
    def _setup(self, nx=12, alpha=0.1, dim=4):
        A = poisson2d(nx)
        n = A.shape[0]
        k = max(1, int(np.ceil(alpha * n)))
        Ac = CSR.from_scipy(A, dtype=jnp.float64)
        net = FullAggNet(dim=dim, num_conv=2, iterations=2)
        params = net.init(jax.random.PRNGKey(0), Ac, k)
        tv = jax.random.normal(jax.random.PRNGKey(1), (n, 8), jnp.float64)
        tv = tv / jnp.linalg.norm(tv, axis=0, keepdims=True)
        return net, params, Ac, k, tv

    def test_straight_through_matches_hard_pipeline(self):
        # with ST, the soft-pipeline P must equal FullAggNet's discrete P
        net, params, Ac, k, tv = self._setup()
        cfg = SoftConfig(bf_iters=Ac.shape[0], straight_through=True)
        P_soft, aux = soft_interpolation(net, params, Ac, k, cfg)
        _, P_hard, _, _, _ = net.apply(params, Ac, k)
        np.testing.assert_allclose(
            np.asarray(P_soft), np.asarray(P_hard.todense()), atol=1e-10
        )

    def test_loss_finite_and_differentiable(self):
        net, params, Ac, k, tv = self._setup()
        cfg = SoftConfig(bf_iters=24)

        def f(params):
            conv, _ = soft_conv_loss(net, params, Ac, k, tv, cfg)
            return conv

        conv, grads = jax.value_and_grad(f)(params)
        assert np.isfinite(float(conv))
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        # every sub-network receives some gradient
        flat = jax.tree_util.tree_flatten_with_path(grads)[0]
        for sub in ("AggNetM", "CNet", "PNet"):
            tot = sum(
                float(jnp.sum(jnp.abs(v)))
                for p, v in flat
                if any(sub in str(q) for q in p)
            )
            assert tot > 0, f"no gradient reached {sub}"

    def test_adam_reduces_discrete_conv(self):
        # few steps of gradient descent must improve the *discrete* pipeline
        import optax
        from mlamg_tpu.train import GridBundle, SolveOptions, measured_conv
        from mlamg_tpu.data.grid import Grid

        net, params, Ac, k, tv = self._setup(nx=10, dim=4)
        cfg = SoftConfig(bf_iters=24)

        def loss_fn(params):
            conv, _ = soft_conv_loss(net, params, Ac, k, tv, cfg)
            return conv

        opts = SolveOptions(max_iter=60)
        x0 = jnp.asarray(
            np.random.RandomState(0).randn(Ac.shape[0]), jnp.float64
        )
        x0 = x0 / jnp.linalg.norm(x0)

        def discrete(params):
            _, P, _, _, _ = net.apply(params, Ac, k)
            return float(measured_conv(Ac, P, x0, opts))

        d0 = discrete(params)
        opt = optax.adam(3e-3)
        state = opt.init(params)

        @jax.jit
        def step(params, state):
            l, g = jax.value_and_grad(loss_fn)(params)
            up, state = opt.update(g, state)
            return optax.apply_updates(params, up), state, l

        best = d0
        for i in range(60):
            params, state, _ = step(params, state)
            if (i + 1) % 20 == 0:
                best = min(best, discrete(params))
        assert best < d0 - 0.02, (d0, best)

    def test_ridge_guards_dead_columns(self):
        # a P with an all-zero column must yield a finite loss with ridge
        A = poisson2d(8)
        Ac = CSR.from_scipy(A, dtype=jnp.float64)
        n = A.shape[0]
        k = 6
        P = jnp.zeros((n, k), jnp.float64).at[jnp.arange(n), jnp.arange(n) % (k - 1)].set(1.0)
        tv = jax.random.normal(jax.random.PRNGKey(0), (n, 4), jnp.float64)
        bad = amg_loss(P, Ac, tv, ridge=0.0)
        guarded = amg_loss(P, Ac, tv, ridge=1e-4)
        assert not np.isfinite(float(bad))
        assert np.isfinite(float(guarded))

    def test_gs_smooth_fn_matches_jacobi_shape(self):
        # custom smoother path runs and returns a plausible conv factor
        from mlamg_tpu.mg.smoothers import greedy_coloring

        net, params, Ac, k, tv = self._setup(nx=8)
        A_sp = poisson2d(8)
        colors = jnp.asarray(greedy_coloring(A_sp), jnp.int32)
        nc = int(np.asarray(colors).max()) + 1
        cfg = SoftConfig(bf_iters=16)
        conv, _ = soft_conv_loss(
            net, params, Ac, k, tv, cfg, colors=colors, num_colors=nc
        )
        assert np.isfinite(float(conv))
