"""Weak-scaling harness for the distributed solver path (BASELINE.md:
"V-cycle weak-scaling efficiency >= 70% @ N >= 2" — measured here on
whatever devices the platform exposes; with virtual CPU devices on an
oversubscribed host the numbers validate the *harness and comm pattern*,
with real chips they are the deployment measurement).

Per shard the local problem is fixed (same n_loc rows of a banded 2D
Poisson), the shard count S doubles, and we report time/iteration of

- the halo-exchange SpMV (pspmv_halo), and
- the full distributed two-level cycle (ptwolevel_solve),

timed as the slope between two in-jit iteration counts (host-side per-call
timing is meaningless on network-attached devices).

    python -m mlamg_tpu.cli.weak_scaling --platform cpu --virtual-devices 8
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def banded_poisson(nx: int, ny: int):
    import scipy.sparse as sp

    Ix = sp.eye(nx)
    Iy = sp.eye(ny)
    Tx = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(nx, nx))
    Ty = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(ny, ny))
    # y-major ordering: bandwidth nx -> halo = nx for row partitions
    return sp.csr_matrix(sp.kron(Iy, Tx) + sp.kron(Ty, Ix)).tocsr()


def time_slope(f_lo, f_hi, iters_lo: int, iters_hi: int, repeat: int = 3) -> float:
    """Seconds per iteration via the slope between two iteration counts.

    ``f_lo``/``f_hi`` must be pre-built zero-arg callables (compiled on
    their first invocation here, which is excluded from timing)."""
    import jax

    jax.block_until_ready(f_lo())  # compile + settle
    jax.block_until_ready(f_hi())
    best = np.inf
    for _ in range(repeat):
        t0 = time.perf_counter()
        jax.block_until_ready(f_lo())
        t1 = time.perf_counter()
        jax.block_until_ready(f_hi())
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (iters_hi - iters_lo))
    return best


def ici_projection(cycle_ms_1shard: float, nx: int, k: int,
                   pre: int = 1, post: int = 1,
                   ici_gbps: float = 45.0, hop_latency_us: float = 1.0):
    """Analytic weak-scaling projection over a real TPU ICI ring.

    Only one physical chip is reachable in this environment, so the
    multi-chip number cannot be *measured*; it can be *modeled* tightly,
    because the distributed cycle's communication schedule is static and
    tiny (see parallel/pcycle.py): per iteration each shard sends
    2*(pre+post+1) halo slices of nx rows (ppermute to ring neighbours)
    and joins 2 all-reduces of a (k,) vector.  Compute per shard is the
    measured single-shard time (fixed local problem).  The projection
    assumes NO compute/comm overlap (conservative; XLA overlaps
    ppermutes with local work when it can) and charges full ring
    all-reduce cost 2*(S-1)/S * bytes.  Not modeled: the replicated
    coarse solve growing with S (k = S*k_loc) — negligible on the MXU
    for the k this harness runs, dominant in the oversubscribed-CPU
    measurement above it.

    ici_gbps: per-direction per-link ICI bandwidth (v5e: ~45 GB/s).
    """
    halo_bytes = 2 * (pre + post + 1) * nx * 4
    msgs = 2 * (pre + post + 1) + 2
    rows = []
    for S in (2, 4, 8, 16):
        allreduce_bytes = 2 * (S - 1) / S * (2 * k * 4)
        t_comm_ms = (
            (halo_bytes + allreduce_bytes) / (ici_gbps * 1e9) * 1e3
            + msgs * hop_latency_us * 1e-3
        )
        rows.append(
            dict(shards=S,
                 comm_ms=round(t_comm_ms, 6),
                 projected_efficiency=round(
                     cycle_ms_1shard / (cycle_ms_1shard + t_comm_ms), 4
                 ))
        )
    return dict(
        model="no-overlap ring: t(S) = t(1) + halo_ppermutes + ring_allreduce",
        assumptions=dict(ici_gbps=ici_gbps, hop_latency_us=hop_latency_us,
                         halo_bytes_per_iter=halo_bytes, msgs_per_iter=msgs),
        cycle_ms_1shard=cycle_ms_1shard,
        rows=rows,
    )


def production_ici_projection(cycle_ms_1chip: float = 12.231, nx: int = 4096,
                              levels: int = 7, k_coarse: int = 1024,
                              nu: int = 2, box_side: int = 2,
                              ici_gbps: float = 45.0,
                              hop_latency_us: float = 1.0):
    """Weak-scaling projection for the PRODUCTION structured V-cycle
    (bench.py vcycle_16m: n = nx^2 per chip, measured ms on the real chip;
    defaults mirror the published convergent side-2 bilinear hierarchy —
    BENCH_r05 12.231 ms/cycle at conv 0.139, 7 levels, coarsest 32^2).

    Row-partitioned slabs: per level each pre/post Chebyshev smooth
    (deg nu+1 -> nu+1 SpMVs each), the residual and the bilinear
    interp/restrict each exchange one halo row of the level's width with
    each ring neighbour (2*(2*(nu+1)+3) slices of nx_l * 4 bytes), and the
    replicated coarsest solve costs one ring all-gather of the (k_coarse,)
    residual.  No compute/comm overlap assumed (conservative).
    """
    halo_bytes = 0
    msgs = 0
    w = nx
    for _ in range(levels):
        halo_bytes += 2 * (2 * (nu + 1) + 3) * w * 4
        msgs += 2 * (2 * (nu + 1) + 3)
        w //= box_side  # per-level coarsening side of the hierarchy
    rows = []
    for S in (2, 4, 8, 16):
        gather_bytes = (S - 1) / S * k_coarse * 4
        t_comm_ms = (
            (halo_bytes + gather_bytes) / (ici_gbps * 1e9) * 1e3
            + (msgs + 2) * hop_latency_us * 1e-3
        )
        rows.append(dict(
            shards=S, comm_ms=round(t_comm_ms, 6),
            projected_efficiency=round(
                cycle_ms_1chip / (cycle_ms_1chip + t_comm_ms), 4
            ),
        ))
    return dict(
        model=("no-overlap ring on the measured 16.8M-dof/chip structured "
               "V-cycle (bench.py vcycle_16m): t(S) = t(1) + halo + "
               "coarse all-gather"),
        assumptions=dict(cycle_ms_1chip=cycle_ms_1chip, nx_per_chip=nx,
                         levels=levels, k_coarse=k_coarse,
                         ici_gbps=ici_gbps, hop_latency_us=hop_latency_us,
                         halo_bytes_per_cycle=halo_bytes),
        rows=rows,
    )


def _prod_cycle_ms(args) -> float | None:
    """Measured 1-chip cycle time for the production projection: explicit
    flag first, else the convergent vcycle_16m_ms from the bench artifact."""
    if args.prod_cycle_ms:
        return args.prod_cycle_ms
    try:
        with open(args.bench_json) as f:
            payload = json.load(f)
        for m in payload["parsed"]["detail"]["extra_metrics"]:
            if m["metric"] == "vcycle_16m_ms":
                return float(m["value"])
    except Exception:
        pass
    return None


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    p.add_argument("--virtual-devices", type=int, default=0,
                   help="force this many virtual CPU devices")
    p.add_argument("--nx", type=int, default=128)
    p.add_argument("--ny-loc", type=int, default=32)
    p.add_argument("--agg", type=int, default=4, help="box aggregate side")
    p.add_argument("--out", type=str, default=None, help="write JSON here")
    p.add_argument("--prod-cycle-ms", type=float, default=None,
                   help="measured 1-chip ms/V-cycle for the production "
                        "projection (default: read vcycle_16m_ms from "
                        "--bench-json, else the last published value)")
    p.add_argument("--bench-json", type=str, default="BENCH_r05.json",
                   help="bench artifact to pull the measured cycle time from")
    args = p.parse_args(argv)

    if args.virtual_devices:
        import os

        os.environ["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={args.virtual_devices} "
            + os.environ.get("XLA_FLAGS", "")
        )
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from mlamg_tpu.ops import CSR
    from mlamg_tpu.mg.interp import sa_interpolation_dense
    from mlamg_tpu.parallel import make_mesh, PartitionedELL, pspmv_halo
    from mlamg_tpu.parallel.pcycle import ptwolevel_solve

    n_dev = len(jax.devices())
    shard_counts = [s for s in (1, 2, 4, 8, 16) if s <= n_dev]
    nx, ny_loc, agg_side = args.nx, args.ny_loc, args.agg

    rows = []
    for S in shard_counts:
        ny = ny_loc * S
        A = banded_poisson(nx, ny)
        n = A.shape[0]
        ii = np.arange(n) // nx  # y index
        jj = np.arange(n) % nx
        agg = (ii // agg_side) * (nx // agg_side) + (jj // agg_side)
        k = int(agg.max()) + 1
        Ac = CSR.from_scipy(A)
        P = np.asarray(sa_interpolation_dense(Ac, jnp.asarray(agg), k, omega=0.65))
        mesh = make_mesh(pop=1, row=S)
        Ap = PartitionedELL.from_scipy(A, S, halo=nx)
        x = np.random.RandomState(0).randn(n).astype(np.float32)
        xs = Ap.shard_x(x, mesh)

        # halo SpMV: chain iterations inside one jitted fori_loop (built
        # once per iteration count so timing never includes tracing)
        from functools import partial

        @partial(jax.jit, static_argnums=0)
        def spmv_chain(iters, xs, Ap=Ap, mesh=mesh):
            def body(_, v):
                return pspmv_halo(Ap, v, mesh) * (1.0 / 4.0)

            return jax.lax.fori_loop(0, iters, body, xs)

        t_spmv = time_slope(
            lambda: spmv_chain(10, xs), lambda: spmv_chain(30, xs), 10, 30
        )

        # full distributed two-level cycle at fixed iteration count (the
        # compiled kernel is cached inside ptwolevel_solve per max_iter)
        b0 = np.zeros(n, np.float32)

        def cycle_chain(iters):
            return ptwolevel_solve(
                Ap, P, b0, x, mesh, res_tol=0.0, max_iter=iters
            )[0]

        t_cycle = time_slope(
            lambda: cycle_chain(4), lambda: cycle_chain(12), 4, 12
        )

        rows.append(
            dict(shards=S, n=n, nnz=int(A.nnz), k=k,
                 spmv_us_per_iter=t_spmv * 1e6,
                 cycle_ms_per_iter=t_cycle * 1e3)
        )
        print(rows[-1], flush=True)

    base = rows[0]
    for r in rows:
        r["spmv_weak_efficiency"] = base["spmv_us_per_iter"] / r["spmv_us_per_iter"]
        r["cycle_weak_efficiency"] = (
            base["cycle_ms_per_iter"] / r["cycle_ms_per_iter"]
        )
    import os as _os

    out = dict(
        device=str(jax.devices()[0]),
        virtual_cpu=bool(args.virtual_devices),
        physical_cores=_os.cpu_count(),
        note=("virtual CPU devices oversubscribe the physical cores; "
              "efficiencies here validate the harness + comm pattern, not "
              "hardware scaling") if args.virtual_devices else "",
        nx=nx, ny_loc=ny_loc,
        rows=rows,
        ici_projection=ici_projection(
            rows[0]["cycle_ms_per_iter"], nx, rows[0]["k"]
        ),
        ici_projection_production=production_ici_projection(
            **({"cycle_ms_1chip": _prod_cycle_ms(args)} if _prod_cycle_ms(args) else {})
        ),
    )
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
