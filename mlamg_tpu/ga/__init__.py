from mlamg_tpu.ga.codec import flatten_params, init_population  # noqa: F401
from mlamg_tpu.ga.ga import ParallelGA, GAConfig  # noqa: F401
