"""Unsteady Oseen/Navier-Stokes driver (role of demos/unsteady-cylflow.py).

Implicit time steps of the lid-driven cavity; each step solves the MAC
saddle-point system with FGMRES + full-Schur fieldsplit, the Schur block
preconditioned by PCDR / SA-AMG / learned AMG.

    python -m mlamg_tpu.cli.solve_ns --n 16 --re 100 --steps 5 --schur-pc pcdr
"""

from __future__ import annotations

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from mlamg_tpu.data.stokes import lid_driven_cavity
from mlamg_tpu.deploy import (
    Options,
    PCDRPreconditioner,
    SAPreconditioner,
    LearnedAMGPreconditioner,
    SchurFieldsplitSolver,
)


def main(argv=None):
    p = argparse.ArgumentParser(description="Unsteady Oseen flow with fieldsplit AMG")
    p.add_argument("--problem", default="cavity", choices=["cavity", "cylinder"],
                   help="cavity: structured MAC lid-driven cavity; cylinder: "
                        "unstructured P1-P1 DFG channel-around-a-cylinder "
                        "(role of demos/unsteady-cylflow.py)")
    p.add_argument("--h", type=float, default=0.04,
                   help="cylinder mesh spacing")
    p.add_argument("--n", type=int, default=16)
    p.add_argument("--re", type=float, default=100.0)
    p.add_argument("--dt", type=float, default=0.1)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--schur-pc", default="pcdr", choices=["pcdr", "sa", "mlamg"])
    p.add_argument("--pnet-model", type=str, default=None)
    p.add_argument("--float64", action="store_true")
    p.add_argument("--platform", type=str, default=None,
                   help="jax platform override (e.g. cpu); f64 requires cpu")
    args = p.parse_args(argv)

    from mlamg_tpu.cli.common import force_platform

    force_platform(args.platform)
    dtype = jnp.float64 if args.float64 else jnp.float32
    if args.float64:
        jax.config.update("jax_enable_x64", True)

    if args.problem == "cylinder":
        from mlamg_tpu.data.cylflow import cylinder_flow_system

        sys_ = cylinder_flow_system(h=args.h, Re=args.re, dt=args.dt)
    else:
        sys_ = lid_driven_cavity(n=args.n, Re=args.re, dt=args.dt)
    print(f"problem={args.problem} n_u={sys_.n_u} n_p={sys_.n_p} "
          f"Re={args.re} dt={args.dt}")

    if args.schur_pc == "pcdr":
        schur_pc = PCDRPreconditioner(sys_, dtype=dtype)
    elif args.schur_pc == "sa":
        schur_pc = SAPreconditioner(sys_.Ap, Options({"pyamg_alpha": 0.2}), dtype=dtype)
    else:
        opts = Options({"mlamg_max_iter": 4, "mlamg_amg_rtol": 0.0})
        if args.pnet_model:
            opts.set("mlamg_pnet_model", args.pnet_model)
        schur_pc = LearnedAMGPreconditioner(sys_.Ap, opts, dtype=dtype)

    solver = SchurFieldsplitSolver(sys_, schur_pc, dtype=dtype)

    u = np.zeros(sys_.n_u)
    Mv = getattr(sys_, "velocity_mass", None)  # FEM mass; MAC grids use I
    for step in range(args.steps):
        # implicit step: the generator's F block already contains the M/dt
        # reaction term, so the rhs is [f + M u_old/dt ; g]
        mu = (Mv @ u) if Mv is not None else u
        b = jnp.asarray(np.concatenate([sys_.f + mu / args.dt, sys_.g]), dtype)
        t0 = time.time()
        x, hist, iters = solver.solve(b=b, tol=args.tol)
        x = np.asarray(x)
        r = np.linalg.norm(sys_.saddle_matrix() @ x - np.asarray(b))
        du = np.linalg.norm(x[: sys_.n_u] - u)
        u = x[: sys_.n_u]
        print(
            f"step {step}: fgmres iters={int(iters)} res={r:.2e} "
            f"|du|={du:.3e} ({time.time()-t0:.2f}s)"
        )
    print("done")


if __name__ == "__main__":
    main()
