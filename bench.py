"""Headline benchmark: SpMV throughput vs the HBM roofline on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is achieved-fraction-of-roofline divided by the 0.80 target from
BASELINE.json (>= 1.0 means the target is met).  The roofline model counts
compulsory HBM traffic for an f32 ELL SpMV: values + column ids (8 B/nnz)
plus one read and one write of the vector (8 B/row); x-gather traffic is
assumed cached (power-of-two problem, banded access).
"""

from __future__ import annotations

import json
import time

import numpy as np


HBM_GBPS = {
    # chip generation -> approximate peak HBM bandwidth (GB/s)
    "v5 lite": 819.0,  # TPU v5e
    "v5": 1638.0,      # v5p
    "v4": 1228.0,
    "v6": 1640.0,      # v6e
}


def detect_bw(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for k, bw in HBM_GBPS.items():
        if k in kind:
            return bw
    return 819.0


def main():
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp
    from mlamg_tpu.ops import ELL, spmv

    dev = jax.devices()[0]
    bw = detect_bw(dev)

    nx = 2048
    I = sp.eye(nx, format="csr", dtype=np.float32)
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(nx, nx), dtype=np.float32)
    A = (sp.kron(I, T) + sp.kron(T, I)).tocsr()
    n = A.shape[0]
    nnz = A.nnz

    Ae = ELL.from_scipy(A)
    x = jnp.asarray(np.random.RandomState(0).randn(n).astype(np.float32))

    f = jax.jit(spmv)
    y = f(Ae, x)
    y.block_until_ready()

    iters = 200
    t0 = time.perf_counter()
    for _ in range(iters):
        y = f(Ae, y / jnp.linalg.norm(y))
    y.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    # the normalize adds ~2 vector passes; subtract nothing, stay conservative

    nnz_per_s = nnz / dt
    bytes_per_it = 8 * Ae.data.size + 8 * n  # vals+cols + x read + y write
    achieved_gbps = bytes_per_it / dt / 1e9
    frac = achieved_gbps / bw
    target = 0.80

    print(
        json.dumps(
            {
                "metric": "spmv_hbm_roofline_fraction",
                "value": round(frac, 4),
                "unit": "fraction_of_peak_hbm_bw",
                "vs_baseline": round(frac / target, 4),
                "detail": {
                    "device": str(dev),
                    "n": n,
                    "nnz": nnz,
                    "spmv_us": round(dt * 1e6, 2),
                    "gnnz_per_s": round(nnz_per_s / 1e9, 3),
                    "achieved_gbps": round(achieved_gbps, 1),
                    "assumed_peak_gbps": bw,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
