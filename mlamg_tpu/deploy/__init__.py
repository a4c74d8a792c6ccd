from mlamg_tpu.deploy.options import Options  # noqa: F401
from mlamg_tpu.deploy.preconditioners import (  # noqa: F401
    LearnedAMGPreconditioner,
    SAPreconditioner,
    PCDRPreconditioner,
)
from mlamg_tpu.deploy.fieldsplit import SchurFieldsplitSolver  # noqa: F401
