from mlamg_tpu.ops.sparse import COO, CSR, ELL  # noqa: F401
from mlamg_tpu.ops.dia import DIA, auto_format  # noqa: F401
from mlamg_tpu.ops.unstructured import WindowedELL, well_spmv_pallas, rcm_spmv_setup  # noqa: F401
from mlamg_tpu.ops.bsr import BSR, bsr_spmv, bsr_spmv_t  # noqa: F401
from mlamg_tpu.ops import matmul  # noqa: F401
from mlamg_tpu.ops.matmul import (  # noqa: F401
    spmv,
    spmv_t,
    spmm,
    spmm_t,
    spgemm,
    spgemm_masked,
    rap_dense,
    rap_fused,
    transpose,
)
