"""Shared scaffolding for the same-process kernel A/B harnesses.

The unroll/default A/Bs (bench_terminal_u8, bench_unroll_sweep,
bench_dd_unroll, bench_dd_unroll_tiers, ...) must measure the IDENTICAL
universe and use the identical k=16 + best-of-3 data-chained protocol
(CLAUDE.md "Same-process A/Bs are mandatory") or their numbers are not
comparable across harnesses. This module is the single copy of that
scaffolding; a protocol change lands here once.

Note the draw ORDER from :func:`universe`'s returned rng is part of the
contract: callers draw their candidate/weight tensors from it AFTER the
mean draw, exactly as the original harnesses did, so refactored harnesses
measure bit-identical inputs.
"""

from __future__ import annotations

import time

import numpy as np

K = 16
TRIALS = 3


def universe(n_assets: int, seed: int = 0):
    """(rng, corr, chol_step, mean_step) — the standard A/B market.

    Equicorrelated 0.5 universe at 2% step vol; mean steps ~N(1e-3, 5e-4).
    """
    rng = np.random.default_rng(seed)
    corr = 0.5 * np.eye(n_assets) + 0.5
    chol = np.linalg.cholesky(0.0004 * corr).astype(np.float32)
    mean = rng.normal(1e-3, 5e-4, n_assets).astype(np.float32)
    return rng, corr, chol, mean


def garch_params(mean, corr):
    """The standard A/B CCC-GARCH(1,1) (alpha=.08, beta=.9, sig0=4e-4)."""
    from mcport.models.garch_mc import CCCGarchParams

    n_assets = len(mean)
    sig0 = np.full(n_assets, 4e-4)
    return CCCGarchParams(
        mu=np.asarray(mean, np.float64), omega=sig0 * 0.1,
        alpha=np.full(n_assets, 0.08), beta=np.full(n_assets, 0.9),
        corr_chol=np.linalg.cholesky(corr), sigma2_0=sig0, eps2_0=sig0)


def heston_params(mean, corr):
    """The standard A/B Heston (kappa=.15, theta=4e-4, xi=3e-3, rho=-.5)."""
    from mcport.models.heston import HestonParams

    n_assets = len(mean)
    return HestonParams(
        mu=np.asarray(mean, np.float64), kappa=np.full(n_assets, 0.15),
        theta=np.full(n_assets, 4e-4), xi=np.full(n_assets, 3e-3),
        rho=np.full(n_assets, -0.5), v0=np.full(n_assets, 4e-4),
        corr_chol=np.linalg.cholesky(corr), s0=np.full(n_assets, 100.0))


def dcc_params(gp, corr, n_assets):
    """The standard A/B DCC overlay (a=.08, b=.85, Q0=corr)."""
    from mcport.models.dcc import DCCGarchParams

    return DCCGarchParams(base=gp, a_dcc=0.08, b_dcc=0.85, q0=corr,
                          e0=np.zeros(n_assets))


def require_tpu() -> bool:
    """True when the TPU backend is live (A/Bs are hardware-only)."""
    import jax

    if jax.default_backend() != "tpu":
        print("needs the TPU backend")
        return False
    return True


def ab_rate(one, work: float, k: int = K, trials: int = TRIALS) -> float:
    """Best-of-``trials`` data-chained rate for jitted ``one(seed)``, e9/s."""
    from mcport.utils.profiling import diff_timed, seed_chain

    return work / diff_timed(seed_chain(one), k=k, trials=trials) / 1e9


def measure_unroll(fn, u: int, work: float, k: int = K, trials: int = TRIALS):
    """(rate_e9, wall_s incl. compile) for ``fn(seed, unroll)`` at unroll=u."""
    import jax

    @jax.jit
    def one(seed, u=u):
        return fn(seed, u)

    t0 = time.perf_counter()
    return ab_rate(one, work, k, trials), time.perf_counter() - t0
