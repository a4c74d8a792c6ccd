"""Headline benchmark: SpMV throughput vs the HBM roofline on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Methodology notes (they matter on a network-attached chip):
- the SpMV is iterated *inside one jitted ``fori_loop``* and timed by the
  slope between two iteration counts, with a scalar readback — per-call
  host-loop timing on this platform measures dispatch, not execution;
- the matrix is a 4096^2 five-point Poisson operator (n = 16.8M,
  nnz = 83.9M) stored in DIA form — the TPU-native stencil layout where
  SpMV is static shifted fused multiply-adds with no gather. The working
  set (~470 MB) exceeds VMEM, so the measurement is HBM-bound;
- roofline model: one streaming pass reads D=5 diagonals + x and writes y
  => (D + 2) * 4 bytes per row = 5.6 bytes/nnz; target is 80% of that
  (BASELINE.json). vs_baseline = achieved_fraction / 0.80.
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
                },
            }
        )
    )


if __name__ == "__main__":
    main()
