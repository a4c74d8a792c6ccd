"""mlamg_tpu — a TPU-native sparse linear-algebra + learned-AMG framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
research codebase nicknytko/ml-amg (learning algebraic-multigrid components
with graph neural networks).  Nothing here is a port: every layer is built
around static shapes, jit-compiled end-to-end pipelines, and device meshes.

Layers (mirroring the reference's layer map, SURVEY.md §1):

- ``mlamg_tpu.ops``      sparse containers + SpMV/SpMM/SpGEMM/RAP kernels
                         (role of ns/lib/sparse*.py + torch_sparse)
- ``mlamg_tpu.graph``    jitted graph algorithms: top-k, Bellman-Ford, Lloyd,
                         connected components, greedy coarsening, strength
                         (role of ns/lib/graph.py, ns/lib/greedy.py, pyamg C++)
- ``mlamg_tpu.mg``       smoothers, SA interpolation, two-level/multilevel
                         cycles, Krylov solvers (role of ns/lib/multigrid.py)
- ``mlamg_tpu.models``   Flax GNNs: TAGConv, MPNN, AggNet, FullAggNet, losses
                         (role of ns/model/*)
- ``mlamg_tpu.ga``       vectorized genetic algorithm + pytree<->chromosome
                         codec (role of ns/ga/*)
- ``mlamg_tpu.parallel`` device-mesh population/row parallelism via shard_map
                         (role of ns/parallel/* — SPMD instead of master/worker)
- ``mlamg_tpu.data``     Grid problems, generators, .grid IO
                         (role of ns/model/data.py)
- ``mlamg_tpu.utils``    profiler, config, checkpointing
"""

__version__ = "0.1.0"

from mlamg_tpu.ops.sparse import COO, CSR, ELL  # noqa: F401
