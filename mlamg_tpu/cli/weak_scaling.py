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


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    p.add_argument("--virtual-devices", type=int, default=0,
                   help="force this many virtual CPU devices")
    p.add_argument("--nx", type=int, default=128)
    p.add_argument("--ny-loc", type=int, default=32)
    p.add_argument("--agg", type=int, default=4, help="box aggregate side")
    p.add_argument("--out", type=str, default=None, help="write JSON here")
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
    )
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
