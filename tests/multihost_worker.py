"""Worker process for the 2-process multi-host CPU test.

Launched by tests/test_multihost.py as
    python tests/multihost_worker.py <process_id> <num_processes> <port>

Each process gets 4 virtual CPU devices; together they form an 8-device
host mesh.  Runs the multi-host analogues of the reference's MPI flow
(ns/parallel/mpi.py + parga fitness farm-out): population-sharded fitness,
cross-process halo SpMV / Jacobi, distributed Bellman-Ford, and a
coordinator broadcast.  Prints "WORKER-OK <pid>" on success.
"""

import os
import sys

proc_id, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=4 "
    + os.environ.get("XLA_FLAGS", "")
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from mlamg_tpu.parallel import (
    initialize,
    make_mesh,
    make_global,
    gather_global,
    broadcast_from_coordinator,
    multihost_population_eval,
    pbf,
    pbf_partition,
    PartitionedELL,
    pspmv,
    pspmv_halo,
)

initialize(f"127.0.0.1:{port}", num_processes=nprocs, process_id=proc_id)

import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp
from jax.sharding import PartitionSpec as P

assert jax.process_count() == nprocs, jax.process_count()
assert jax.device_count() == 4 * nprocs
assert jax.local_device_count() == 4

# --- 1. population-sharded fitness across processes ------------------------
mesh = make_mesh(pop=8, row=1)
rng = np.random.RandomState(0)
population = rng.randn(13, 6)  # deliberately not divisible by 8


def fitness_vmapped(pop_shard):
    return -jnp.sum((pop_shard - 2.0) ** 2, axis=1)


evaluate = multihost_population_eval(fitness_vmapped, mesh)
fit = evaluate(population)
expect = -np.sum((population - 2.0) ** 2, axis=1)
np.testing.assert_allclose(fit, expect, atol=1e-12)

# --- 2. row-partitioned SpMV across the process boundary --------------------
row_mesh = make_mesh(pop=1, row=8)
n = 64
A = sp.diags(
    [np.full(n - 1, -1.0), np.full(n, 2.0), np.full(n - 1, -1.0)], [-1, 0, 1]
).tocsr()
x = rng.randn(n)
Ap = PartitionedELL.from_scipy(A, 8, dtype=jnp.float64)
xs = Ap.shard_x(x, row_mesh)
y = gather_global(pspmv(Ap, xs, row_mesh), row_mesh).ravel()[:n]
np.testing.assert_allclose(y, A @ x, atol=1e-12)

Ah = PartitionedELL.from_scipy(A, 8, halo=1, dtype=jnp.float64)
xs = Ah.shard_x(x, row_mesh)
y = gather_global(pspmv_halo(Ah, xs, row_mesh), row_mesh).ravel()[:n]
np.testing.assert_allclose(y, A @ x, atol=1e-12)

# --- 3. distributed Bellman-Ford across processes ---------------------------
w_lo = rng.rand(n - 1) + 0.1
w_up = rng.rand(n - 1) + 0.1
C = sp.diags([w_lo, w_up], [-1, 1]).tocsr()
Cp = pbf_partition(C, 8, halo=1, dtype=jnp.float64)
centers = np.array([3, 47], np.int32)
cmask = np.zeros((8, 8), bool)
cmask.ravel()[centers] = True
cm = make_global(cmask, row_mesh, P("row", None))
dist, near = pbf(Cp, cm, row_mesh)
dist = gather_global(dist, row_mesh).ravel()[:n]

from mlamg_tpu.ops import CSR
from mlamg_tpu.graph import bellman_ford

d_ref, _ = bellman_ford(CSR.from_scipy(C, dtype=jnp.float64), jnp.asarray(centers))
np.testing.assert_allclose(dist, np.asarray(d_ref), atol=1e-12)

# --- 4. coordinator broadcast ------------------------------------------------
seed = np.array([123456789], np.uint32) if proc_id == 0 else np.zeros(1, np.uint32)
got = broadcast_from_coordinator(seed)
assert int(np.asarray(got)[0]) == 123456789

print(f"WORKER-OK {proc_id}", flush=True)
