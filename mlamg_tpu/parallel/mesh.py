"""Device-mesh construction (role of ns/parallel/pool.py's backend pick).

The reference selects MPI / multiprocessing / single-process at runtime and
runs a master-worker command protocol (pool.py:35-86).  The SPMD equivalent:
one ``jax.sharding.Mesh`` whose axes name the parallelism —

- ``pop``  : population/data parallelism (the GA's worker axis)
- ``row``  : matrix-row partitioning (the halo-exchange axis)

The same jitted programs run on 1 device or N; only the mesh shape changes
(the property the reference approximates with its SingleProcessWorker fake
backend, single_process.py:33-56).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(pop: int | None = None, row: int = 1, devices=None) -> Mesh:
    """Mesh over available devices with ('pop', 'row') axes.

    ``pop=None`` uses all remaining devices on the population axis.
    """
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if pop is None:
        assert n % row == 0, (n, row)
        pop = n // row
    assert pop * row <= n, (pop, row, n)
    dev = np.asarray(devices[: pop * row]).reshape(pop, row)
    return Mesh(dev, ("pop", "row"))


def population_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a (P, W) population: rows split over the pop axis."""
    return NamedSharding(mesh, P("pop", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
