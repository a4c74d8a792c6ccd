from mlamg_tpu.optimize.optimizers import (  # noqa: F401
    PseudoGradientOptimizer,
    SPSA,
    CuckooSearch,
)
