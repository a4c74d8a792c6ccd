from mlamg_tpu.data.grid import Grid, rotation_matrix_3d  # noqa: F401
from mlamg_tpu.data import fem  # noqa: F401
