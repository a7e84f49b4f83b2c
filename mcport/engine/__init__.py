from mcport.engine.simulate import SimulationOutput, assemble_returns, run_simulation
from mcport.engine.mc_engine import (
    MCCheckpoint,
    RiskReport,
    load_checkpoint,
    run_resumable_mc,
)
from mcport.engine.drawdown_frontier import DrawdownFrontierResult, drawdown_frontier_search
from mcport.engine.frontier_opt import (
    ExactFrontier,
    exact_frontier,
    max_sharpe_exact,
    min_variance_exact,
    project_capped_simplex,
    target_risk_exact,
)
from mcport.engine.cvar_opt import (
    CVaRFrontier,
    cvar_frontier,
    max_return_at_cvar,
    min_cvar_exact,
    simulated_cvar_frontier,
)
from mcport.engine.greeks import (
    HedgedSensitivities,
    PortfolioSensitivities,
    hedged_sensitivities,
    portfolio_sensitivities,
)
from mcport.engine.path_risk import PathRiskReport, run_path_risk
from mcport.engine.risk_parity import (
    hierarchical_risk_parity,
    inverse_variance,
    risk_contributions,
    risk_parity,
)
from mcport.engine.simulated_frontier import SimFrontierResult, simulated_weight_search
from mcport.engine.weight_search import (
    METHODS,
    MethodResult,
    PortfolioEval,
    cal_line,
    efficient_frontier,
    evaluate_portfolios,
    run_all_methods,
    run_method,
)

__all__ = [
    "ExactFrontier",
    "exact_frontier",
    "max_sharpe_exact",
    "min_variance_exact",
    "project_capped_simplex",
    "target_risk_exact",
    "METHODS",
    "MethodResult",
    "PortfolioEval",
    "evaluate_portfolios",
    "run_method",
    "run_all_methods",
    "cal_line",
    "run_simulation",
    "assemble_returns",
    "SimulationOutput",
    "efficient_frontier",
    "MCCheckpoint",
    "RiskReport",
    "run_resumable_mc",
    "load_checkpoint",
    "PathRiskReport",
    "run_path_risk",
    "PortfolioSensitivities",
    "HedgedSensitivities",
    "portfolio_sensitivities",
    "hedged_sensitivities",
    "SimFrontierResult",
    "simulated_weight_search",
    "DrawdownFrontierResult",
    "drawdown_frontier_search",
    "risk_parity",
    "risk_contributions",
    "hierarchical_risk_parity",
    "inverse_variance",
    "CVaRFrontier",
    "cvar_frontier",
    "min_cvar_exact",
    "max_return_at_cvar",
    "simulated_cvar_frontier",
]
