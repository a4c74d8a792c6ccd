"""Benchmark suite on one chip.  Prints ONE JSON line whose headline metric
is the DIA SpMV HBM-roofline fraction; `detail.extra_metrics` carries the
rest of the BASELINE.md matrix (unstructured SpMV, two-level cycle, sparse
RAP, model forward).

Methodology notes (they matter on a network-attached chip):
- every kernel is iterated *inside one jitted ``fori_loop``* and timed by
  the slope between two iteration counts, with a scalar readback —
  per-call host-loop timing on this platform measures dispatch, not
  execution;
- headline matrix: 4096^2 five-point Poisson (n = 16.8M, nnz = 83.9M) in
  DIA form — the TPU-native stencil layout where SpMV is static shifted
  fused multiply-adds with no gather. The working set (~470 MB) exceeds
  VMEM, so the measurement is HBM-bound;
- roofline model: one streaming pass reads D=5 diagonals + x and writes y
  => (D + 2) * 4 bytes per row = 5.6 bytes/nnz; target is 80% of that
  (BASELINE.json). vs_baseline = achieved_fraction / 0.80;
- unstructured: random-hull P1 FEM matrix (the reference's dataset family,
  ns/model/data.py:416-433), RCM-ordered, via the windowed-gather ELL
  Pallas kernel (ops/unstructured.py). v5e has no VMEM gather hardware, so
  this path is VPU-bound, not HBM-bound; the reported baseline factor is
  the measured XLA gather-SpMV on the same operator.
"""

from __future__ import annotations

import json
import time
from functools import partial

import numpy as np


HBM_GBPS = {
    "v5 lite": 819.0,  # TPU v5e
    "v5": 2765.0,      # v5p
    "v4": 1228.0,
    "v6": 1640.0,      # v6e
}


def detect_bw(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for k, bw in HBM_GBPS.items():
        if k in kind:
            return bw
    return 819.0


def slope(timed, lo: int, hi: int, tries: int = 4) -> float:
    """Slope between two chained iteration counts, retried until positive.

    A single pair of wall-clock samples through the network tunnel
    occasionally inverts (the longer chain returns faster) when the link
    hiccups; a negative per-iteration time is always a measurement
    artifact, so those attempts are discarded.  Of the positive slopes the
    *median* is published: min() of noisy differences is biased low (one
    noise-inflated timed(lo) fabricates a too-small slope that min keeps),
    while the median only removes outliers.  Returns early once three
    positive samples agree within 5% to limit tunnel load."""
    samples: list[float] = []
    for _ in range(tries):
        dt = (timed(hi) - timed(lo)) / (hi - lo)
        if dt > 0:
            samples.append(dt)
        if len(samples) >= 3:
            s = sorted(samples)
            if s[-1] - s[0] <= 0.05 * s[0]:
                break
    if not samples:
        raise RuntimeError("timing slope stayed non-positive; tunnel unstable")
    return float(np.median(samples))



_HULL600K = {}


def hull600k():
    """600k-dof random-hull FEM matrix, built once per bench process
    (generation is ~4 min of host meshing/assembly; two benches use it)."""
    if "A" not in _HULL600K:
        import numpy as np
        import scipy.sparse as sp
        from mlamg_tpu.data import Grid

        g = Grid.random_2d_unstructured(600_000, seed=7)
        _HULL600K["A"] = sp.csr_matrix(g.A).astype(np.float32)
    return _HULL600K["A"]


def bench_unstructured(on_tpu: bool):
    """Windowed-gather ELL SpMV on a random-hull FEM matrix (Gnnz/s)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import scipy.sparse as sp
    from functools import partial
    from mlamg_tpu.data import Grid
    from mlamg_tpu.ops.unstructured import WindowedELL, well_spmv_pallas, rcm_spmv_setup

    A = hull600k()
    perm, W = rcm_spmv_setup(A)
    n = W.shape[0]
    x = jnp.asarray(np.random.RandomState(0).randn(n).astype(np.float32))

    @partial(jax.jit, static_argnames=("k",))
    def chain(W, x, k):
        def body(i, v):
            return well_spmv_pallas(W, v, interpret=not on_tpu) * 1e-6

        return jnp.sum(jax.lax.fori_loop(0, k, body, x))

    def timed(k):
        float(chain(W, x, k))
        t0 = time.perf_counter()
        float(chain(W, x, k))
        return time.perf_counter() - t0

    dt = slope(timed, 10, 30)
    return {
        "metric": "unstructured_spmv_gnnz_per_s",
        "value": round(W.nnz / dt / 1e9, 4),
        "unit": "Gnnz/s",
        "n": n,
        "nnz": W.nnz,
        "spmv_us": round(dt * 1e6, 1),
        "format": "WindowedELL(RCM random-hull FEM)",
        "xla_gather_baseline_gnnz_per_s": 0.045,  # measured, same op family
        "speedup_vs_xla_gather": round((W.nnz / dt / 1e9) / 0.045, 1),
    }


def bench_twolevel():
    """Deployment-grade two-level cycle on a 512^2 Poisson.

    Fine level: fused DIA Pallas sweeps.  Restriction/prolongation: the
    factored SA prolongator P = S.T applied by its factors (mg/factored.py)
    — two more stencil SpMVs plus reshape reductions, instead of streaming
    a dense (n, k) P (which previously dominated the iteration at ~2 GB of
    HBM traffic).  Coarse solve: explicit-inverse matvec (one MXU pass)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import scipy.sparse as sp
    from mlamg_tpu.ops import DIA
    from mlamg_tpu.ops.pallas_kernels import blocked_dia
    from mlamg_tpu.mg.cycle import twolevel_solve, coarse_operator
    from mlamg_tpu.mg.coarse import CoarseSolver
    from mlamg_tpu.mg.factored import BoxAgg2D, factored_sa

    nx = 512
    I = sp.eye(nx, format="csr", dtype=np.float32)
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(nx, nx), dtype=np.float32)
    A = (sp.kron(I, T) + sp.kron(T, I)).tocsr()
    n = A.shape[0]
    side = 16  # 16x16 box aggregates -> k = 1024
    k = (nx // side) ** 2
    Ad = blocked_dia(DIA.from_scipy(A))
    P = factored_sa(Ad, BoxAgg2D(ny=nx, nx=nx, sy=side, sx=side), omega=0.65)
    coarse = CoarseSolver.factor(coarse_operator(Ad, P), method="inverse")
    x0 = jnp.asarray(np.random.RandomState(0).randn(n).astype(np.float32))
    b = jnp.zeros(n, jnp.float32)

    from functools import partial

    @partial(jax.jit, static_argnames=("iters",))
    def run(P, coarse, b, x0, iters):
        x, conv, err, it = twolevel_solve(
            Ad, P, b, x0, res_tol=0.0, max_iter=iters, coarse=coarse
        )
        return jnp.sum(x)

    def timed(iters):
        float(run(P, coarse, b, x0, iters))
        t0 = time.perf_counter()
        float(run(P, coarse, b, x0, iters))
        return time.perf_counter() - t0

    dt = slope(timed, 8, 24)
    return {
        "metric": "twolevel_cycle_ms",
        "value": round(dt * 1e3, 3),
        "unit": "ms/iteration",
        "n": n,
        "nnz": int(A.nnz),
        "k": k,
        "scheme": "factored P=S*T + inverse coarse",
        "gnnz_per_s_fine_sweeps": round(3 * A.nnz / dt / 1e9, 3),
    }


def bench_vcycle_16m():
    """Multilevel V-cycle on the headline 4096^2 Poisson (16.8M dofs):
    every level a DIA stencil (coarse operators recovered by colored
    probing), every prolongator factored, coarsest solved by explicit
    inverse — the all-streaming hierarchy (mg/structured.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import scipy.sparse as sp
    from mlamg_tpu.ops import DIA
    from mlamg_tpu.ops.pallas_kernels import blocked_dia
    from mlamg_tpu.mg.structured import build_structured_hierarchy
    from mlamg_tpu.mg.cycle import vcycle

    nx = 4096
    I = sp.eye(nx, format="csr", dtype=np.float32)
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(nx, nx), dtype=np.float32)
    A = (sp.kron(I, T) + sp.kron(T, I)).tocsr()
    n = A.shape[0]
    Ad = blocked_dia(DIA.from_scipy(A))
    # side-2 bilinear (geometric) levels: Galerkin stays a compact 9-point
    # stencil at every level and conv reaches geometric-MG territory
    # (0.146 measured) where the box-SA hierarchies saturated near 0.78
    # (sides=(8,8) r4) or diverged (sides=(16,8) r3)
    h = build_structured_hierarchy(
        Ad, nx, nx, sides=(2,) * 7, min_coarse=900, kind="bilinear"
    )
    x0 = jnp.asarray(np.random.RandomState(0).randn(n).astype(np.float32))
    b = jnp.zeros(n, jnp.float32)

    from functools import partial

    # correctness first: with b = 0, ||x|| is the error norm — measure the
    # per-cycle contraction and refuse to publish a timing for a hierarchy
    # that does not converge (the timed loop below runs unscaled)
    @jax.jit
    def conv_check(h, b, x0):
        def body(x, _):
            x2 = vcycle(h, b, x, nu=2, smoother="chebyshev")
            return x2, jnp.linalg.norm(x2)

        _, norms = jax.lax.scan(body, x0, None, length=6)
        return norms

    norms = np.asarray(conv_check(h, b, x0))
    conv = float((norms[-1] / norms[1]) ** (1.0 / (len(norms) - 2)))
    if not (np.all(np.isfinite(norms)) and conv < 1.0):
        raise RuntimeError(f"16.8M V-cycle does not converge: factor {conv}")

    @partial(jax.jit, static_argnames=("iters",))
    def run(h, b, x0, iters):
        def body(i, x):
            return vcycle(h, b, x, nu=2, smoother="chebyshev")

        return jnp.sum(jax.lax.fori_loop(0, iters, body, x0))

    def timed(iters):
        float(run(h, b, x0, iters))
        t0 = time.perf_counter()
        float(run(h, b, x0, iters))
        return time.perf_counter() - t0

    dt = slope(timed, 4, 12)
    return {
        "metric": "vcycle_16m_ms",
        "value": round(dt * 1e3, 3),
        "unit": "ms/V-cycle",
        "n": n,
        "nnz": int(A.nnz),
        "levels": h.num_levels + 1,
        "conv_factor": round(conv, 4),
        "scheme": "all-DIA bilinear(side-2) probed-Galerkin hierarchy, deg-3 Chebyshev",
        "gnnz_per_s_fine_sweeps": round(4 * A.nnz / dt / 1e9, 3),
    }


def bench_unstructured_multilevel():
    """600k-dof random-hull FEM multilevel solve (the reference's actual
    problem family at production scale, ns/lib/multigrid.py:111-210 on
    ns/model/data.py:416-433 grids).

    Setup: rap_mode="auto" Galerkin products (host scipy at this size —
    the device masked-SpGEMM path exists for true scale but pays tens of
    seconds of XLA compile per level through the network-attached chip)
    with the strength/Lloyd phase on a CPU jit; ~24 s total, was 497 s in
    round 4.  Cycle: W(gamma=2), deg-5 Chebyshev smoothing, factored
    prolongator — all levels SpMV-class streaming through WindowedELL
    operators."""
    import time as _time
    import jax
    import jax.numpy as jnp
    import numpy as np
    import scipy.sparse as sp
    from mlamg_tpu.data import Grid
    from mlamg_tpu.mg.amg_unstructured import (
        build_unstructured_hierarchy, uvcycle, uvcycle_solve,
    )

    A = hull600k()
    n = A.shape[0]
    t0 = _time.time()
    h, perm = build_unstructured_hierarchy(
        A, alpha=0.2, max_levels=5, min_coarse=1200, lloyd_maxiter=5,
        fmt="well",
    )
    setup_s = _time.time() - t0
    x0 = jnp.asarray(np.random.RandomState(0).randn(n).astype(np.float32))
    b = jnp.zeros(n, jnp.float32)

    # convergence first: geometric mean factor over a real solve
    x, conv, err, iters = jax.jit(
        lambda h, b, x: uvcycle_solve(
            h, b, x, res_tol=1e-6, max_iter=40, nu=4, lmin_frac=1 / 15,
            gamma=2,
        )
    )(h, b, x0)
    conv = float(conv)  # reported honestly below; timing is conv-independent

    from functools import partial

    @partial(jax.jit, static_argnames=("iters",))
    def run(h, b, x0, iters):
        def body(i, x):
            return uvcycle(h, b, x, nu=4, lmin_frac=1 / 15, gamma=2)

        return jnp.sum(jax.lax.fori_loop(0, iters, body, x0))

    def timed(iters):
        float(run(h, b, x0, iters))
        t0 = time.perf_counter()
        float(run(h, b, x0, iters))
        return time.perf_counter() - t0

    dt = slope(timed, 3, 9, tries=3)
    return {
        "metric": "vcycle_unstructured_600k_ms",
        "value": round(dt * 1e3, 3),
        "unit": "ms/W-cycle",
        "n": n,
        "nnz": int(A.nnz),
        "levels": h.num_levels,
        "conv_factor": round(conv, 4),
        "iters_to_1e6": int(iters),
        "setup_s": round(setup_s, 1),
        "scheme": "auto host/device Galerkin setup, factored-P W(4,4) Chebyshev",
    }


def bench_rap():
    """Sparse Galerkin product (fused expand + single-sort coalesce) nnz/s."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import scipy.sparse as sp
    from mlamg_tpu.ops import CSR, matmul
    from mlamg_tpu.mg.interp import smoothed_aggregation

    nx = 256
    I = sp.eye(nx, format="csr", dtype=np.float32)
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(nx, nx), dtype=np.float32)
    A = (sp.kron(I, T) + sp.kron(T, I)).tocsr()
    n = A.shape[0]
    ii, jj = np.arange(n) // nx, np.arange(n) % nx
    agg = (ii // 3) * (nx // 3 + 1) + (jj // 3)
    k = int(agg.max()) + 1
    Ac = CSR.from_scipy(A, dtype=jnp.float32)
    P = smoothed_aggregation(Ac, jnp.asarray(agg), k)
    width = 5
    nnz_out = 4 * Ac.nnz_pad

    from functools import partial

    @partial(jax.jit, static_argnames=("iters",))
    def run(Ac, P, iters):
        def body(i, s):
            # carry-dependent input defeats loop-invariant hoisting
            AH = matmul.rap_fused(
                Ac.with_data(Ac.data + s * 1e-30), P,
                k=k, nnz_out=nnz_out, p_width=width,
            )
            return jnp.sum(AH.data) * 1e-9

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    def timed(iters):
        float(run(Ac, P, iters))
        t0 = time.perf_counter()
        float(run(Ac, P, iters))
        return time.perf_counter() - t0

    dt = (timed(6) - timed(2)) / 4

    # pattern-masked path on the SAME learned-P-shaped product: P's pattern
    # is A's pattern with columns mapped through agg (mg/amg_unstructured
    # galerkin_patterns) — computable host-side for FullAggNet's P = P_hat
    # Agg, so the learned pipeline's Galerkin product need not pay the
    # sort-based rap_fused at scale
    from mlamg_tpu.mg.amg_unstructured import galerkin_patterns, rap_masked

    Ppat, APpat, AHpat = galerkin_patterns(A, np.asarray(agg), k)
    a_width = int(np.diff(A.indptr).max())
    # P's device coordinates are duplicate-counted (A's cols mapped through
    # agg, not coalesced) — the transpose width must count duplicates
    pt_width = int(np.bincount(np.asarray(agg)[A.tocoo().col], minlength=k).max())
    ap_width = int(np.diff(APpat.indptr).max())
    APp = CSR.from_scipy(APpat, dtype=jnp.float32)
    AHp = CSR.from_scipy(AHpat, dtype=jnp.float32)

    @partial(jax.jit, static_argnames=("iters",))
    def run_masked(Ac, P, iters):
        def body(i, s):
            AH = rap_masked(
                Ac.with_data(Ac.data + s * 1e-30), P, APp, AHp,
                a_width=a_width, p_width=a_width,
                pt_width=pt_width, ap_width=ap_width,
            )
            return jnp.sum(AH.data) * 1e-9

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    def timed_masked(iters):
        float(run_masked(Ac, P, iters))
        t0 = time.perf_counter()
        float(run_masked(Ac, P, iters))
        return time.perf_counter() - t0

    dt_m = slope(timed_masked, 2, 6)
    return {
        "metric": "rap_spgemm_mnnz_per_s",
        "value": round(A.nnz / dt_m / 1e6, 2),
        "unit": "Mnnz(A)/s",
        "n": n,
        "nnz": int(A.nnz),
        "rap_ms": round(dt_m * 1e3, 2),
        "scheme": "pattern-masked numeric RAP (host boolean pattern, "
                  "device masked SpGEMM x2)",
        "fused_mnnz_per_s": round(A.nnz / dt / 1e6, 2),
        "fused_rap_ms": round(dt * 1e3, 2),
    }


def bench_model_forward():
    """FullAggNet forward (scores -> BF -> P) on a 64^2 grid."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mlamg_tpu.data import Grid
    from mlamg_tpu.ops import CSR
    from mlamg_tpu.models import FullAggNet

    g = Grid.structured_2d_poisson_dirichlet(64, 64)
    A = CSR.from_scipy(g.A, dtype=jnp.float32)
    n = g.A.shape[0]
    k = int(np.ceil(0.1 * n))
    width = int(np.max(np.diff(g.A.tocsr().indptr)))
    net = FullAggNet(dim=8, num_conv=2, iterations=2, bf_width=width)
    params = net.init(jax.random.PRNGKey(0), A, k)

    from functools import partial

    @partial(jax.jit, static_argnames=("iters",))
    def run(params, A, iters):
        def body(i, s):
            # carry-dependent input defeats loop-invariant hoisting
            _, P, _, _, _ = net.apply(params, A.with_data(A.data + s * 1e-30), k)
            return jnp.sum(P.data) * 1e-9

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    def timed(iters):
        float(run(params, A, iters))
        t0 = time.perf_counter()
        float(run(params, A, iters))
        return time.perf_counter() - t0

    dt = (timed(12) - timed(4)) / 8
    return {
        "metric": "fullaggnet_forward_ms",
        "value": round(dt * 1e3, 2),
        "unit": "ms/forward",
        "n": n,
    }


def main():
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp
    from mlamg_tpu.ops import DIA
    from mlamg_tpu.ops.dia import dia_spmv
    from mlamg_tpu.ops.pallas_kernels import dia_spmv_pallas

    dev = jax.devices()[0]
    bw = detect_bw(dev)
    on_tpu = "tpu" in getattr(dev, "device_kind", "").lower() or "TPU" in str(dev)

    from mlamg_tpu.ops.pallas_kernels import blocked_dia

    nx = 4096
    I = sp.eye(nx, format="csr", dtype=np.float32)
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(nx, nx), dtype=np.float32)
    A = (sp.kron(I, T) + sp.kron(T, I)).tocsr()
    n = A.shape[0]
    nnz = A.nnz
    # pre-blocked (D, n/128, 128) layout: one-time relayout, pure streaming
    # in the solve loop (see pallas_kernels.py module docstring)
    Ad = blocked_dia(DIA.from_scipy(A))
    D = len(Ad.offsets)

    def make_chain(kernel_name):
        @partial(jax.jit, static_argnames=("k",))
        def chain(data, x, k):
            Ak = DIA(data, Ad.offsets, Ad.shape)

            def body(i, v):
                if kernel_name == "pallas":
                    w = dia_spmv_pallas(Ak, v)
                else:
                    w = dia_spmv(Ak, v)
                # cheap rescale keeps the iterate finite
                return w * 1e-6

            return jnp.sum(jax.lax.fori_loop(0, k, body, x))

        return chain

    x = jnp.asarray(np.random.RandomState(0).randn(n).astype(np.float32))

    def measure(kernel_name):
        chain = make_chain(kernel_name)

        def timed(k):
            float(chain(Ad.data, x, k))  # warm compile on first call
            t0 = time.perf_counter()
            float(chain(Ad.data, x, k))
            return time.perf_counter() - t0

        k_lo, k_hi = 10, 60
        return (timed(k_hi) - timed(k_lo)) / (k_hi - k_lo)

    kernel_used = "pallas" if on_tpu else "xla"
    try:
        dt = measure(kernel_used)
    except Exception:
        kernel_used = "xla"
        dt = measure(kernel_used)

    nnz_per_s = nnz / dt
    bytes_per_it = 4 * (D * n + 2 * n)  # diagonals + x read + y write
    achieved_gbps = bytes_per_it / dt / 1e9
    frac = achieved_gbps / bw
    target = 0.80

    extra = []
    for fn, args in (
        (bench_unstructured, (on_tpu,)),
        (bench_twolevel, ()),
        (bench_vcycle_16m, ()),
        (bench_unstructured_multilevel, ()),
        (bench_rap, ()),
        (bench_model_forward, ()),
    ):
        try:
            extra.append(fn(*args))
        except Exception as e:  # keep the headline alive on partial failure
            extra.append({"metric": fn.__name__, "error": str(e)[:200]})

    print(
        json.dumps(
            {
                "metric": "spmv_hbm_roofline_fraction",
                "value": round(frac, 4),
                "unit": "fraction_of_peak_hbm_bw",
                "vs_baseline": round(frac / target, 4),
                "detail": {
                    "device": str(dev),
                    "kernel": kernel_used,
                    "format": "DIA(5-pt Poisson)",
                    "n": n,
                    "nnz": nnz,
                    "spmv_us": round(dt * 1e6, 2),
                    "gnnz_per_s": round(nnz_per_s / 1e9, 3),
                    "achieved_gbps": round(achieved_gbps, 1),
                    "assumed_peak_gbps": bw,
                    "extra_metrics": extra,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
