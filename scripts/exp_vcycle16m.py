"""Sweep structured-hierarchy configs for the 16.8M V-cycle headline.

Round-4 published sides=(8,8), nu=2 at 10.36 ms/cycle but conv 0.795
(~60 cycles to 1e-6).  VERDICT r4 #6 asks for conv <= 0.5 at <= 15 ms.
Candidates: slower box coarsening (side 4 -> 16x per level instead of
64x, much stronger Galerkin interpolation for ~7% more fine-level work)
and/or heavier Chebyshev smoothing.

Run on the real TPU:  python scripts/exp_vcycle16m.py
"""

import json
import sys
import time
from functools import partial

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, ".")
from bench import slope  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
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
    x0 = jnp.asarray(np.random.RandomState(0).randn(n).astype(np.float32))
    b = jnp.zeros(n, jnp.float32)

    configs = [
        dict(sides=(4, 4, 4), nu=2, gamma=2, smooth_steps=(2, 1, 1),
             block=False),
        dict(sides=(4, 4, 4), nu=2, smooth_steps=(2, 1, 1), block=False),
        dict(sides=(4, 4, 4), nu=2, gamma=2),
        dict(sides=(4, 4, 4), nu=1, gamma=2),
    ]
    out = []
    for cfg in configs:
        t0 = time.time()
        try:
            h = build_structured_hierarchy(
                Ad, nx, nx, sides=cfg["sides"], min_coarse=256,
                smooth_steps=cfg.get("smooth_steps", 1),
                block=cfg.get("block", True),
            )
        except Exception as e:
            print(json.dumps({**cfg, "error": str(e)}), flush=True)
            continue
        setup_s = time.time() - t0
        nu = cfg["nu"]
        gamma = cfg.get("gamma", 1)

        @jax.jit
        def conv_check(h, b, x0, nu=nu, gamma=gamma):
            def body(x, _):
                x2 = vcycle(h, b, x, nu=nu, smoother="chebyshev", gamma=gamma)
                return x2, jnp.linalg.norm(x2)

            _, norms = jax.lax.scan(body, x0, None, length=8)
            return norms

        norms = np.asarray(conv_check(h, b, x0))
        conv = float((norms[-1] / norms[1]) ** (1.0 / (len(norms) - 2)))

        @partial(jax.jit, static_argnames=("iters",))
        def run(h, b, x0, iters, nu=nu, gamma=gamma):
            def body(i, x):
                return vcycle(h, b, x, nu=nu, smoother="chebyshev", gamma=gamma)

            return jnp.sum(jax.lax.fori_loop(0, iters, body, x0))

        def timed(iters):
            float(run(h, b, x0, iters))
            t0 = time.perf_counter()
            float(run(h, b, x0, iters))
            return time.perf_counter() - t0

        dt = slope(timed, 4, 12)
        row = {
            **cfg,
            "levels": h.num_levels + 1,
            "conv_factor": round(conv, 4),
            "cycle_ms": round(dt * 1e3, 3),
            "setup_s": round(setup_s, 1),
            "finite": bool(np.all(np.isfinite(norms))),
        }
        out.append(row)
        print(json.dumps(row), flush=True)

    with open("results/vcycle16m_sweep.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
