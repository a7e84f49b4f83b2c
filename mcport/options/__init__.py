from mcport.options.legs import (
    Legs,
    LegType,
    PERSIAN_NAMES,
    leg_period_return,
    parse_leg_type,
    position_return_series,
)
from mcport.options.payoff import (
    calculate_breakeven,
    calculate_payoff,
    price_grid,
    profit_loss_percent,
)
from mcport.options.hedged import (
    HedgeSpec,
    auto_hedged_sketch,
    hedged_from_simple,
    hedged_return_bounds,
    hedged_step_returns,
    hedged_terminal_returns,
)
from mcport.options.american import (
    AmericanGreeks,
    AmericanPolicy,
    american_greeks,
    american_hedged_tail_risk,
    american_hedged_terminal_returns,
    american_value,
    bs_european_value,
    exercise_boundary,
)
from mcport.options.strategies import STRATEGIES, strategy_legs

__all__ = [
    "Legs",
    "LegType",
    "PERSIAN_NAMES",
    "parse_leg_type",
    "leg_period_return",
    "position_return_series",
    "price_grid",
    "calculate_payoff",
    "calculate_breakeven",
    "profit_loss_percent",
    "STRATEGIES",
    "strategy_legs",
    "HedgeSpec",
    "hedged_terminal_returns",
    "hedged_from_simple",
    "hedged_step_returns",
    "hedged_return_bounds",
    "auto_hedged_sketch",
    "AmericanPolicy",
    "AmericanGreeks",
    "american_value",
    "american_greeks",
    "american_hedged_terminal_returns",
    "american_hedged_tail_risk",
    "bs_european_value",
    "exercise_boundary",
]
