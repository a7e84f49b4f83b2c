"""High-level simulation API — the reference's tab-2 flow as one function.

Pipeline parity (app.py:655-723):

1. returns assembly per asset: hedged series via the vectorized option engine when
   legs are configured (app.py:663), else ``pct_change().fillna(0)`` (app.py:666);
2. annualized moments ``mean*ann`` / ``cov*ann`` (app.py:679-680);
3. per-method random-weight search (:mod:`mcport.engine.weight_search`).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mcport.config import Config
from mcport.data.pipeline import PriceData
from mcport.engine.weight_search import MethodResult, run_all_methods
from mcport.options.legs import Legs, position_return_series

__all__ = ["SimulationOutput", "assemble_returns", "run_simulation"]

DEFAULT_METHODS = ("Monte Carlo", "VaR", "CVaR", "MPT", "Equal Weight", "Target Risk")


@dataclass(frozen=True)
class SimulationOutput:
    names: tuple[str, ...]
    returns: np.ndarray                       # (T, A) assembled return matrix
    mean_ann: np.ndarray
    cov_ann: np.ndarray
    results: Mapping[str, MethodResult] = field(default_factory=dict)


def assemble_returns(
    data: PriceData, legs_by_asset: Mapping[str, Legs] | None = None
) -> np.ndarray:
    """Per-asset return series: hedged when legs exist, pct_change otherwise
    (app.py:659-667). Both conventions keep the leading zero row."""
    legs_by_asset = legs_by_asset or {}
    cols = []
    for i, name in enumerate(data.names):
        legs = legs_by_asset.get(name)
        if legs is not None and len(legs) > 0:
            cols.append(np.asarray(position_return_series(legs, data.prices[:, i])))
        else:
            cols.append(data.port_rets[:, i])
    return np.stack(cols, axis=1)


def run_simulation(
    data: PriceData,
    config: Config = Config(),
    legs_by_asset: Mapping[str, Legs] | None = None,
    methods: Sequence[str] = DEFAULT_METHODS,
) -> SimulationOutput:
    """Full tab-2 simulation: returns assembly → moments → all methods."""
    returns = assemble_returns(data, legs_by_asset)
    ann = data.ann_factor
    mean_ann = returns.mean(axis=0) * ann
    cov_ann = np.cov(returns, rowvar=False, ddof=1) * ann
    if mean_ann.ndim == 0:  # single asset
        mean_ann = mean_ann[None]
        cov_ann = np.asarray(cov_ann).reshape(1, 1)

    pc = config.portfolio
    sc = config.simulation
    a = len(data.names)
    min_w = np.zeros(a) if pc.min_weights is None else np.asarray(pc.min_weights)
    max_w = np.ones(a) if pc.max_weights is None else np.asarray(pc.max_weights)
    dtype = jnp.dtype(sc.dtype)

    results = run_all_methods(
        jax.random.key(sc.seed),
        returns,
        jnp.asarray(mean_ann, dtype),
        jnp.asarray(cov_ann, dtype),
        methods=tuple(methods),
        risk_free=pc.risk_free,
        n_portfolios=sc.n_portfolios,
        min_weights=min_w,
        max_weights=max_w,
        max_retries=sc.max_retries,
        alpha=sc.alpha,
        target_risk=sc.target_risk,
        dtype=dtype,
    )
    return SimulationOutput(
        names=data.names,
        returns=returns,
        mean_ann=mean_ann,
        cov_ann=cov_ann,
        results=results,
    )
