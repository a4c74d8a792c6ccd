"""Deployment round trip: train the C/F-interpolation network and show the
FGMRES iteration win inside the Schur fieldsplit solver.

Role of the workflow behind ns/preconditioner/MLAMG.py:102-124 — the
reference loads a trained ``ali_interp.InterpolationNetwork`` checkpoint at
PC setup; this driver produces that checkpoint first-party:

1. training operators = pinned pressure Laplacians from lid-driven-cavity
   systems at several resolutions (the Schur-block family the PC serves);
2. Adam on the differentiable relaxation loss ``amg_loss`` of
   P(params) = CFInterpolationNetwork(A, greedy C/F splitting);
3. evaluation: a *held-out* resolution's Stokes solve with
   LearnedAMGPreconditioner(net) vs its classical fallback as the Schur
   preconditioner — reporting outer FGMRES iterations for both.

    python -m mlamg_tpu.cli.train_cf_interp --epochs 60 --out results/cf.json
"""

from __future__ import annotations

import argparse
import json

import numpy as np
import jax
import jax.numpy as jnp

from mlamg_tpu.cli.common import force_platform


def pinned_pressure_laplacian(system):
    """Ap with dof 0 pinned (removes the Neumann nullspace)."""
    import scipy.sparse as sp

    Ap = system.Ap.tolil()
    Ap[0, :] = 0.0
    Ap[:, 0] = 0.0
    Ap[0, 0] = 1.0
    return sp.csr_matrix(Ap)


def cf_inputs(A_scipy, theta: float, dtype):
    from mlamg_tpu.ops import CSR
    from mlamg_tpu.graph.coarsening import greedy_coarsening
    from mlamg_tpu.models.cf_interp import cf_rank

    n = A_scipy.shape[0]
    _, F, C = greedy_coarsening(A_scipy, theta)
    is_coarse = np.zeros(n, bool)
    is_coarse[C] = True
    c_rank, num_c = cf_rank(is_coarse)
    return (
        CSR.from_scipy(A_scipy, dtype=dtype),
        jnp.asarray(is_coarse),
        jnp.asarray(c_rank),
        num_c,
    )


def main(argv=None):
    p = argparse.ArgumentParser(description="Train CF-interp net, demo deployment")
    p.add_argument("--train-sizes", type=int, nargs="+", default=[8, 10, 12])
    p.add_argument("--eval-sizes", type=int, nargs="+", default=[14, 16, 20],
                   help="held-out resolutions for the pressure-solve "
                        "comparison (learned vs classical PC)")
    p.add_argument("--eval-rhs-seeds", type=int, default=5,
                   help="random right-hand sides per resolution "
                        "(mean +- std error bars)")
    p.add_argument("--eval-size", type=int, default=14,
                   help="resolution of the full Stokes Schur round trip")
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument("--theta", type=float, default=0.56)
    p.add_argument("--test-vecs", type=int, default=8)
    p.add_argument("--dims", type=int, nargs="+", default=[8, 8, 16])
    p.add_argument("--K", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args(argv)
    force_platform(args.platform)

    import optax
    from mlamg_tpu.data.stokes import lid_driven_cavity
    from mlamg_tpu.models.cf_interp import CFInterpolationNetwork
    from mlamg_tpu.models.loss import amg_loss
    from mlamg_tpu.deploy import (
        Options,
        LearnedAMGPreconditioner,
        SchurFieldsplitSolver,
    )
    from mlamg_tpu.utils import save_checkpoint

    dtype = jnp.float64
    jax.config.update("jax_enable_x64", True)

    rng = np.random.RandomState(args.seed)
    train = []
    for nres in args.train_sizes:
        s = lid_driven_cavity(n=nres, Re=10.0)
        A = pinned_pressure_laplacian(s)
        Ac, is_c, c_rank, num_c = cf_inputs(A, args.theta, dtype)
        tv = rng.randn(A.shape[0], args.test_vecs)
        tv /= np.linalg.norm(tv, axis=0, keepdims=True)
        train.append((Ac, is_c, c_rank, num_c, jnp.asarray(tv)))

    net = CFInterpolationNetwork(dims=tuple(args.dims), K=args.K)
    params = net.init(jax.random.PRNGKey(args.seed), *train[0][:4])
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    from functools import partial

    @partial(jax.jit, static_argnames=("num_c",))
    def step(params, opt_state, Ac, is_c, c_rank, tv, num_c):
        def loss_fn(p):
            P = net.apply(p, Ac, is_c, c_rank, num_c)
            return amg_loss(P, Ac, tv)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses0 = None
    for epoch in range(args.epochs):
        tot = []
        for Ac, is_c, c_rank, num_c, tv in train:
            params, opt_state, loss = step(
                params, opt_state, Ac, is_c, c_rank, tv, num_c
            )
            tot.append(float(loss))
        if losses0 is None:
            losses0 = list(tot)
        if (epoch + 1) % 10 == 0 or epoch == args.epochs - 1:
            print(f"epoch {epoch + 1}: amg_loss per matrix {np.round(tot, 4)}",
                  flush=True)

    if args.checkpoint:
        # net_config pins the forward the weights were trained under:
        # row_normalize silently changes the emitted P, so loading a
        # checkpoint must reconstruct the same architecture flags.
        save_checkpoint(
            args.checkpoint, generation=args.epochs, best_params=params,
            extra=dict(net_config=dict(dims=list(args.dims), K=args.K,
                                       row_normalize=bool(net.row_normalize))),
        )

    # ---- deployment comparison 1: the PC's own solve (the MLAMG role —
    # the reference applies this model family to the pressure/Schur block,
    # ns/preconditioner/MLAMG.py:148-212).  FGMRES on held-out pressure
    # Laplacians, learned vs classical PC, several random right-hand sides
    # per resolution for error bars. ----
    from mlamg_tpu.mg.krylov import fgmres

    pc_opts = Options({"mlamg_amg_rtol": 0.0, "mlamg_max_iter": 2,
                       "mlamg_greedy_theta": args.theta})
    pressure = []
    for nres in args.eval_sizes:
        se = lid_driven_cavity(n=nres, Re=10.0)
        A_eval = pinned_pressure_laplacian(se)
        pcs = {
            "learned": LearnedAMGPreconditioner(
                A_eval, pc_opts, net=net, net_params=params, dtype=dtype
            ),
            "classical": LearnedAMGPreconditioner(A_eval, pc_opts, dtype=dtype),
        }
        Ad = pcs["learned"].A
        iters = {k: [] for k in pcs}
        for sd in range(args.eval_rhs_seeds):
            bb = np.random.RandomState(1000 + sd).randn(A_eval.shape[0])
            b = jnp.asarray(bb, dtype)
            for name, pc in pcs.items():
                _, _, it = fgmres(Ad, b, M=pc, tol=1e-8)
                iters[name].append(int(it))
        row = {"n_res": nres, "n_p": A_eval.shape[0]}
        for name in pcs:
            row[f"fgmres_{name}_mean"] = float(np.mean(iters[name]))
            row[f"fgmres_{name}_std"] = float(np.std(iters[name]))
        row["win_pct"] = round(
            100.0 * (1.0 - row["fgmres_learned_mean"] /
                     max(row["fgmres_classical_mean"], 1e-9)), 1,
        )
        pressure.append(row)
        print(f"pressure solve n={nres}: {row}", flush=True)

    # ---- deployment comparison 2: the full Stokes Schur round trip ----
    s = lid_driven_cavity(n=args.eval_size, Re=10.0, dt=0.05)
    A_eval = pinned_pressure_laplacian(s)
    pc_learned = LearnedAMGPreconditioner(
        A_eval, pc_opts, net=net, net_params=params, dtype=dtype
    )
    pc_classical = LearnedAMGPreconditioner(A_eval, pc_opts, dtype=dtype)

    def run(pc):
        solver = SchurFieldsplitSolver(s, pc, dtype=dtype)
        x, hist, iters = solver.solve(tol=1e-8)
        r = s.saddle_matrix() @ np.asarray(x) - s.rhs()
        return int(iters), float(np.linalg.norm(r))

    it_l, r_l = run(pc_learned)
    it_c, r_c = run(pc_classical)
    result = {
        "pressure_solves": pressure,
        "eval_size": args.eval_size,
        "n_p": s.n_p,
        "fgmres_iters_learned": it_l,
        "fgmres_iters_classical": it_c,
        "resid_learned": r_l,
        "resid_classical": r_c,
        "train_loss_first_epoch": losses0,
        "train_loss_last_epoch": tot,
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    return result


if __name__ == "__main__":
    main()
