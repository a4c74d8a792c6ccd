from mlamg_tpu.models.graphdata import (  # noqa: F401
    GraphData,
    graph_from_matrix,
    graph_from_matrix_basic,
    graph_from_matrix_node_vals,
)
from mlamg_tpu.models.gnn import MLP, InstanceNorm, TAGConv, NNConv, EdgeModel, EdgeConv  # noqa: F401
from mlamg_tpu.models.agg_interp import (  # noqa: F401
    MPNN,
    AggBinarizationLayer,
    AggNet,
    FullAggNet,
    AggOnlyNet,
    make_forward,
)
from mlamg_tpu.models.loss import amg_loss, make_test_vectors, E_loss, R_jacobi  # noqa: F401
from mlamg_tpu.models.interpolation import (  # noqa: F401
    InterpolationNetwork,
    CoarseFineNetwork,
    ContinuousInterpolationFullNetwork,
    EC_loss,
    E_loss_discrete,
)
from mlamg_tpu.models.cf_interp import CFInterpolationNetwork, cf_graph, cf_rank  # noqa: F401
from mlamg_tpu.models.convergence import ConvergencePredictor  # noqa: F401
