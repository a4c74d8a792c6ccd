"""Multi-host bootstrap and global-array plumbing.

Role of the reference's MPI backend (ns/parallel/mpi.py:4-92 deferred-init
mpi4py + pickled rank0<->rankN send/recv, pool.py:52-66 world-size backend
pick): here every process runs the *same* SPMD program; the only host-side
distribution code is

- :func:`initialize` — ``jax.distributed.initialize`` wiring (coordinator
  address / process count / process id from args or env), after which
  ``jax.devices()`` spans all hosts and the usual ('pop', 'row') mesh from
  :func:`mlamg_tpu.parallel.make_mesh` becomes a *host mesh*;
- global-array constructors (:func:`make_global`, :func:`gather_global`)
  that replace the reference's pickle data plane: every process holds the
  same host copy (SPMD replicated inputs), slices its addressable shards,
  and collectives move data over ICI/DCN inside jit;
- :func:`broadcast_from_coordinator` — the one control-plane primitive the
  reference's command protocol actually needs (process-0 seeding).

Everything works identically with one process (all helpers degrade to
no-ops/local ops), which is what the single-host tests exercise; the
2-process CPU test (tests/test_multihost.py) runs the same code across a
real process boundary with Gloo collectives.
"""

from __future__ import annotations

import os
from typing import Any, Callable

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_initialized = False


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_count: int | None = None,
) -> None:
    """Bring up the cross-process runtime (idempotent).

    Arguments default to the standard env vars (``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``) so launchers can stay
    argument-free, mirroring the reference's SLURM env sniffing
    (ns/parallel/mpi.py:10-26).  A single-process setup (no coordinator
    address anywhere) is a no-op.
    """
    global _initialized
    if _initialized:
        return
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None:
        return
    num_processes = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    process_id = (
        process_id
        if process_id is not None
        else int(os.environ.get("JAX_PROCESS_ID", "0"))
    )
    kwargs = {}
    if local_device_count is not None:
        kwargs["num_local_devices"] = local_device_count
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )
    _initialized = True


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_coordinator() -> bool:
    return jax.process_index() == 0


def make_global(x, mesh: Mesh, spec: P) -> jax.Array:
    """Global jax.Array with sharding (mesh, spec) from a host array that
    every process holds identically (the SPMD input convention).

    Single-process: equivalent to a device_put.  Multi-process: each host
    contributes exactly its addressable shards, no cross-host transfer.
    """
    x = np.asarray(x)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def gather_global(x: jax.Array, mesh: Mesh) -> np.ndarray:
    """Full host copy (on every process) of a possibly process-sharded
    global array — the inverse of :func:`make_global`."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.global_array_to_host_local_array(x, mesh, P())
    )


def broadcast_from_coordinator(tree: Any) -> Any:
    """Process-0's pytree on every process (host control-plane seeding,
    e.g. the GA PRNG key; replaces the reference's rank-0 command sends)."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)


def multihost_population_eval(
    fitness_vmapped: Callable, mesh: Mesh
) -> Callable:
    """Population-sharded fitness across processes.

    Multi-process variant of
    :func:`mlamg_tpu.parallel.shard_population_eval`: the (P, W) population
    (identical host copy everywhere — GA state is SPMD-replicated) is
    converted to a pop-sharded global array, each host evaluates only its
    shard, and the (P,) fitness comes back as a full host array on every
    process.
    """

    @jax.jit
    def sharded(pop):
        return jax.shard_map(
            fitness_vmapped,
            mesh=mesh,
            in_specs=P("pop", None),
            out_specs=P("pop"),
            check_vma=False,
        )(pop)

    def evaluate(population) -> np.ndarray:
        population = np.asarray(population)
        n_pop = mesh.shape["pop"]
        Psize = population.shape[0]
        pad = (-Psize) % n_pop
        if pad:
            population = np.concatenate(
                [population, np.repeat(population[-1:], pad, axis=0)], axis=0
            )
        garr = make_global(population, mesh, P("pop", None))
        out = sharded(garr)
        return gather_global(out, mesh)[:Psize]

    return evaluate
