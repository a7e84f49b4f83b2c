from mcport.parallel.auto_sharded import auto_sharded_weight_search
from mcport.parallel.sharded_greeks import sharded_sensitivities
from mcport.parallel.mesh import make_mesh, make_mesh_2d, maybe_initialize_distributed
from mcport.parallel.sharded_engines import (
    sharded_bootstrap_risk,
    sharded_cvar_attribution,
    sharded_dcc_risk,
    sharded_drawdown_frontier,
    sharded_family_drawdown_frontier,
    sharded_family_drawdown_frontier_2d,
    sharded_family_path_risk,
    sharded_garch_risk,
    sharded_hedged_gbm_risk,
    sharded_importance_tail,
    sharded_merton_risk,
    sharded_path_risk,
    sharded_simulated_frontier,
    sharded_simulated_frontier_2d,
)
from mcport.parallel.sharded_resumable import (
    ShardedMCCheckpoint,
    load_sharded_checkpoint,
    run_sharded_resumable_mc,
)
from mcport.parallel.sharded_mc import (
    SEARCH_OBJECTIVES,
    SEED_STRIDE,
    ShardedRisk,
    ShardedSearchResult,
    sharded_gbm_risk,
    sharded_weight_search,
)

__all__ = [
    "make_mesh",
    "make_mesh_2d",
    "maybe_initialize_distributed",
    "ShardedRisk",
    "ShardedSearchResult",
    "SEARCH_OBJECTIVES",
    "sharded_gbm_risk",
    "sharded_weight_search",
    "SEED_STRIDE",
    "sharded_path_risk",
    "sharded_bootstrap_risk",
    "sharded_simulated_frontier",
    "sharded_simulated_frontier_2d",
    "sharded_drawdown_frontier",
    "sharded_family_path_risk",
    "sharded_family_drawdown_frontier",
    "sharded_family_drawdown_frontier_2d",
    "sharded_hedged_gbm_risk",
    "sharded_garch_risk",
    "sharded_merton_risk",
    "sharded_importance_tail",
    "sharded_dcc_risk",
    "sharded_cvar_attribution",
    "sharded_sensitivities",
    "auto_sharded_weight_search",
    "ShardedMCCheckpoint",
    "load_sharded_checkpoint",
    "run_sharded_resumable_mc",
]
