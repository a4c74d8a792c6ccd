from mlamg_tpu.parallel.mesh import make_mesh, population_sharding  # noqa: F401
from mlamg_tpu.parallel.pop_parallel import shard_population_eval  # noqa: F401
from mlamg_tpu.parallel.pspmv import PartitionedELL, pspmv, pspmv_halo  # noqa: F401
from mlamg_tpu.parallel.pbf import pbf, pbf_partition  # noqa: F401
from mlamg_tpu.parallel.pcycle import ptwolevel_solve, pvcycle_solve  # noqa: F401
from mlamg_tpu.parallel.plloyd import plloyd  # noqa: F401
from mlamg_tpu.parallel.distributed import (  # noqa: F401
    initialize,
    make_global,
    gather_global,
    broadcast_from_coordinator,
    multihost_population_eval,
    process_count,
    process_index,
    is_coordinator,
)
