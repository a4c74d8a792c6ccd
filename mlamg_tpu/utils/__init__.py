from mlamg_tpu.utils.profiler import Profiler  # noqa: F401
from mlamg_tpu.utils.checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
from mlamg_tpu.utils.metrics import MetricsWriter  # noqa: F401
