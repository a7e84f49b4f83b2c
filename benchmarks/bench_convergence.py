"""BASELINE.json config 5: variance reduction — antithetic + Sobol quasi-MC,
convergence-vs-paths study.

For the exact-terminal estimator (where QMC applies), measures |estimate - truth|
of the portfolio mean across path counts for plain MC, antithetic MC, and Sobol
QMC. Truth is analytic: E[sum_a w_a exp(N(mu_a, Sigma_aa))] is closed-form
lognormal.

Run: python benchmarks/bench_convergence.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_enable_x64", True)  # f64 estimator differences are tiny

import jax.numpy as jnp
import numpy as np

from mcport.config import DataConfig
from mcport.data import load_universe
from mcport.models import estimate_gbm, qmc_normals
from mcport.models.gbm import portfolio_terminal_returns, terminal_log_returns_exact
from mcport.utils.logging import RunLogger

FIXTURES = Path(__file__).resolve().parent.parent / "fixtures"


def main() -> None:
    log = RunLogger(stream=sys.stdout)
    d = load_universe(
        paths=[FIXTURES / "BTC_USD 7 Years Weekly.csv", FIXTURES / "ETH_USD 7 Years Weekly.csv"],
        config=DataConfig(period="W"),
    )
    params = estimate_gbm(d.prices)
    a = params.n_assets
    w = np.full(a, 1.0 / a)
    steps = 52
    m = params.mean_step * steps
    cov = (params.chol_step @ params.chol_step.T) * steps
    truth = float(np.sum(w * np.exp(m + 0.5 * np.diag(cov))) - 1.0)  # lognormal mean

    chol_h = np.linalg.cholesky(cov)

    def estimate(kind: str, n: int, seed: int) -> float:
        if kind == "sobol":
            z = np.asarray(qmc_normals(n, a, "sobol", seed=seed, dtype=jnp.float64))
            term = m + z @ chol_h.T
            return float(((np.exp(term) - 1.0) @ w).mean())
        anti = kind == "antithetic"
        term = terminal_log_returns_exact(
            jax.random.key(seed), params.mean_step, params.chol_step, n, steps,
            antithetic=anti, dtype=jnp.float64,
        )
        return float(np.asarray(portfolio_terminal_returns(term, w)).mean())

    for n in (1_024, 8_192, 65_536):
        for kind in ("plain", "antithetic", "sobol"):
            errs = [abs(estimate(kind, n, s) - truth) for s in range(8)]
            log.log("config5_convergence", kind=kind, n_paths=n, truth=truth,
                    rmse=float(np.sqrt(np.mean(np.square(errs)))))

    # path-dependent payoff: Asian (time-average of portfolio value), where the
    # Brownian-bridge Sobol ordering is required for the QMC advantage
    from mcport.models.bridge import qmc_gbm_log_paths
    from mcport.models.gbm import simulate_log_paths

    def asian_mc(n, s):
        p = simulate_log_paths(jax.random.key(s), params.mean_step, params.chol_step,
                               n, steps, dtype=jnp.float64)
        return float(((np.exp(np.asarray(p)) * w).sum(-1)).mean())

    def asian_qmc(n, s):
        p = qmc_gbm_log_paths(params.mean_step, params.chol_step, n, steps,
                              "sobol", seed=s, dtype=jnp.float64)
        return float(((np.exp(np.asarray(p)) * w).sum(-1)).mean())

    for n in (1_024, 8_192):
        mc = [asian_mc(n, s) for s in range(6)]
        qm = [asian_qmc(n, s) for s in range(6)]
        log.log("config5_asian_path_dependent", n_paths=n,
                mc_spread=float(np.std(mc)), bridge_sobol_spread=float(np.std(qm)),
                qmc_advantage=float(np.std(mc) / max(np.std(qm), 1e-15)))


if __name__ == "__main__":
    main()
