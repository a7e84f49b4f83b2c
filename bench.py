"""Benchmark fleet: one JSON line per kernel/config, headline metric LAST.

The headline line (the driver's parsed metric, BASELINE.json:5 target 1e9
path-steps/s/chip) is printed last:
    {"metric": "gbm_path_steps_per_sec_per_chip", ...}

Before it, on TPU, the fleet emits one line each for the other hot kernels and
the two wall-clock configs so round-over-round claims are auditable from
BENCH_r{N}.json instead of RESULTS.md prose (VERDICT r2 item 3):

    gbm_terminal_hedged_*   terminal engine + option-leg settlement (the <10%%
                            hedging-overhead criterion, VERDICT r2 item 1)
    gbm_path_stats_*        fused per-step portfolio/drawdown kernel
    garch_*                 CCC-GARCH(1,1) kernel
    multi_dd_{f32,tf32,bf16}_* candidate-scoring drawdown kernel tiers
    bootstrap_*             stationary block bootstrap kernel
    garch_multi_dd_* / bootstrap_multi_dd_*  family candidate path-stats
                            kernels (rebalanced wealth + drawdown carries)
    config3_*               1M-candidate CONSTRAINED streaming frontier
                            (cold = incl. compile, warm) [BASELINE config 3]
    config4_*               16.7M-path sketch tail risk wall [BASELINE config 4]

Timing: every throughput uses the same-process K-vs-2K difference protocol
with data-chained reps and a scalar VALUE fetch (utils.profiling.diff_timed);
block_until_ready alone is untrustworthy through the axon tunnel and
between-process comparisons exceed 20% noise (benchmarks/RESULTS.md). Round 5
(VERDICT r4 weak #2): every kernel line now times at the repo's own k=16 +
best-of-3 protocol — the earlier k=2..5 windows carried enough noise that a
70.5-vs-73e9 round-over-round delta was unreadable.

vs_baseline semantics per line: path-steps/s lines quote the ratio vs the
BASELINE.json 1e9/chip target; cand-path-steps/s and wall/seconds lines have
no driver target, so they quote the ratio vs the ROUND-4 anchor
(BENCH_r04.json), oriented so >1.0 is always BETTER (value/anchor for
throughputs, anchor/value for walls). Each fleet entry is fail-isolated: an
error prints an "error" line and the headline still runs.

Stall-proofing (round 5): on TPU the headline is MEASURED first (fresh
tunnel) but PRINTED last; watchdog timers bound backend init
(MCPORT_BACKEND_TIMEOUT), the headline measure (MCPORT_HEADLINE_TIMEOUT)
and the fleet/configs stages (MCPORT_FLEET_DEADLINE) so a mid-run tunnel
freeze — observed live: 26 min with zero device progress — still ends with
a parseable headline as the last JSON line.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

BASELINE_PATH_STEPS_PER_SEC = 1e9  # BASELINE.json:5 target
N_ASSETS = 15
N_STEPS = 252
N_PATHS = 1_048_576

# Timing window (VERDICT r4 weak #2): k reps per difference window, best of
# TRIALS trials — the repo's documented protocol for trustworthy deltas.
K = 16
TRIALS = 3

# Round-4 anchors (BENCH_r04.json) for lines without a BASELINE target;
# vs_baseline = value/anchor for throughputs, anchor/value for walls (>1.0 is
# always better).
ANCHORS = {
    "multi_dd_f32_cand_path_steps_per_sec": 89.0e9,
    "multi_dd_tf32_cand_path_steps_per_sec": 129.0e9,
    "multi_dd_bf16_cand_path_steps_per_sec": 190.0e9,
    "garch_multi_dd_cand_path_steps_per_sec": 111.5e9,
    "bootstrap_multi_dd_cand_path_steps_per_sec": 88.3e9,
    "jump_multi_dd_cand_path_steps_per_sec": 99.6e9,
    "dcc_multi_dd_cand_path_steps_per_sec": 70.5e9,
    "heston_multi_dd_cand_path_steps_per_sec": 88.5e9,
    "dd_frontier_auto_speedup": 1.35,
    "greeks_jacrev_warm_wall_s": 0.218,
    "config3_streaming_1m_constrained_cold_s": 16.5,
    "config3_streaming_1m_constrained_warm_s": 7.8,
    "config4_16m_tail_wall_s": 20.7,
}
_WALL_METRICS = frozenset(m for m in ANCHORS if m.endswith("_s"))


def _emit(metric, value, unit, vs_baseline=None):
    if vs_baseline is None and metric in ANCHORS:
        vs_baseline = (ANCHORS[metric] / value if metric in _WALL_METRICS
                       else value / ANCHORS[metric])
    print(json.dumps({
        "metric": metric, "value": round(value, 4), "unit": unit,
        "vs_baseline": None if vs_baseline is None else round(vs_baseline, 4),
    }), flush=True)


def _universe():
    rng = np.random.default_rng(0)
    corr = 0.5 * np.eye(N_ASSETS) + 0.5
    chol = np.linalg.cholesky(0.0004 * corr).astype(np.float32)
    mean = rng.normal(1e-3, 5e-4, N_ASSETS).astype(np.float32)
    return mean, chol


def _chain(one):
    """Lazy-import alias of :func:`mcport.utils.profiling.seed_chain`.

    Kept as a function (not a module-level import) because bench.py defers
    every jax/mcport import until after the watchdogged backend init.
    """
    from mcport.utils.profiling import seed_chain

    return seed_chain(one)


def fleet(mean, chol):
    import jax
    import jax.numpy as jnp

    from mcport.utils.profiling import diff_timed

    rng = np.random.default_rng(1)

    # -- hedged terminal: the engine composition measure (VERDICT r2 item 1).
    # Married puts on 5 assets + covered calls on 3 over s0=100 — settle vs
    # simulated terminal prices, then the weight dot. Overhead is reported
    # as hedged-vs-plain ratio of the SAME (terminal + portfolio dot) chain.
    from mcport.ops.pallas_gbm import pallas_terminal_log_returns
    from mcport.options import HedgeSpec, LegType, Legs
    from mcport.options.hedged import hedged_terminal_returns

    names = [f"a{i}" for i in range(N_ASSETS)]
    legs = {}
    for i in range(5):
        legs[names[i]] = Legs.from_rows([
            (LegType.BUY_ASSET, 0.0, 0.0, 1.0),
            (LegType.BUY_PUT, 90.0, 1.5, 1.0)])
    for i in range(5, 8):
        legs[names[i]] = Legs.from_rows([(LegType.SELL_CALL, 110.0, 2.0, 1.0)])
    spec = HedgeSpec.build(legs, names)
    s0 = jnp.full((N_ASSETS,), 100.0, jnp.float32)
    w = jnp.asarray(rng.dirichlet(np.ones(N_ASSETS)), jnp.float32)
    harr = spec.arrays

    @jax.jit
    def plain(seed):
        term = pallas_terminal_log_returns(seed, mean, chol, N_PATHS, N_STEPS)
        return ((jnp.exp(term) - 1.0) @ w).sum() * 1e-9

    @jax.jit
    def hedged(seed):
        term = pallas_terminal_log_returns(seed, mean, chol, N_PATHS, N_STEPS)
        return (hedged_terminal_returns(term, s0, *harr) @ w).sum() * 1e-9

    t_plain = diff_timed(_chain(plain), k=K, trials=TRIALS)
    t_hedged = diff_timed(_chain(hedged), k=K, trials=TRIALS)
    rate_h = N_PATHS * N_STEPS / t_hedged
    _emit("gbm_terminal_hedged_path_steps_per_sec", rate_h,
          "path-steps/s (15 assets, 8 hedged, 252 steps, f32)",
          rate_h / BASELINE_PATH_STEPS_PER_SEC)
    _emit("hedged_overhead_vs_terminal_pct", (t_hedged / t_plain - 1.0) * 100,
          "% wall overhead of option settlement on the terminal engine")

    # -- screening-tier terminal (bm="poly_fast", round 4): degree-5 normal
    # fits, draw error <=1.5e-4 worst-case — the frontier/VaR screening tier
    @jax.jit
    def plain_fast(seed):
        term = pallas_terminal_log_returns(seed, mean, chol, N_PATHS, N_STEPS,
                                           bm="poly_fast")
        return ((jnp.exp(term) - 1.0) @ w).sum() * 1e-9

    rate_f = N_PATHS * N_STEPS / diff_timed(_chain(plain_fast), k=K, trials=TRIALS)
    _emit("gbm_terminal_fast_path_steps_per_sec", rate_f,
          "path-steps/s (15 assets, 252 steps, poly_fast screening tier)",
          rate_f / BASELINE_PATH_STEPS_PER_SEC)

    # -- path-stats kernel (terminal + per-step portfolio value + drawdown)
    from mcport.ops.pallas_gbm import gbm_path_stats

    @jax.jit
    def pstats(seed):
        term, port, dd = gbm_path_stats(seed, mean, chol, w, N_PATHS, N_STEPS)
        return (port.sum() + dd.sum()) * 1e-9

    rate = N_PATHS * N_STEPS / diff_timed(_chain(pstats), k=K, trials=TRIALS)
    _emit("gbm_path_stats_path_steps_per_sec", rate,
          "path-steps/s (15 assets, 252 steps, split correlate, unroll=2)",
          rate / BASELINE_PATH_STEPS_PER_SEC)

    # -- CCC-GARCH kernel
    from mcport.models.garch_mc import CCCGarchParams
    from mcport.ops.pallas_garch import pallas_garch_terminal_returns

    sig0 = np.full(N_ASSETS, 4e-4)
    gp = CCCGarchParams(
        mu=np.asarray(mean, np.float64),
        omega=sig0 * 0.1, alpha=np.full(N_ASSETS, 0.08),
        beta=np.full(N_ASSETS, 0.9),
        corr_chol=np.linalg.cholesky(0.5 * np.eye(N_ASSETS) + 0.5),
        sigma2_0=sig0, eps2_0=sig0,
    )

    @jax.jit
    def garch(seed):
        return pallas_garch_terminal_returns(seed, gp, N_PATHS, N_STEPS).sum() * 1e-9

    rate = N_PATHS * N_STEPS / diff_timed(_chain(garch), k=K, trials=TRIALS)
    _emit("garch_path_steps_per_sec", rate,
          "path-steps/s (CCC-GARCH(1,1), 15 assets, 252 steps, unroll=4)",
          rate / BASELINE_PATH_STEPS_PER_SEC)

    # -- DCC-GARCH kernel (round 3: the fused VMEM-Cholesky form)
    from mcport.models.dcc import DCCGarchParams
    from mcport.ops.pallas_dcc import pallas_dcc_terminal_returns

    dcc_steps = 52   # the DCC risk horizon convention (models/dcc.py)
    dp = DCCGarchParams(base=gp, a_dcc=0.05, b_dcc=0.9,
                        q0=0.5 * np.eye(N_ASSETS) + 0.5,
                        e0=np.zeros(N_ASSETS))

    @jax.jit
    def dcc(seed):
        return pallas_dcc_terminal_returns(
            seed, dp, N_PATHS, dcc_steps).sum() * 1e-9

    rate = N_PATHS * dcc_steps / diff_timed(_chain(dcc), k=K, trials=TRIALS)
    _emit("dcc_path_steps_per_sec", rate,
          "path-steps/s (DCC-GARCH(1,1), 15 assets, 52 steps, fused kernel)",
          rate / BASELINE_PATH_STEPS_PER_SEC)

    # -- multi-portfolio drawdown scoring tiers
    from mcport.ops.pallas_multi_dd import gbm_multi_portfolio_dd

    n_cand, dd_paths = 256, 131_072
    cand = rng.dirichlet(np.ones(N_ASSETS), size=n_cand).astype(np.float32)
    for sd, label in (("float32", "f32"), ("tensorfloat32", "tf32"),
                      ("bfloat16", "bf16")):
        @jax.jit
        def mdd(seed, sd=sd):
            term, dd = gbm_multi_portfolio_dd(
                seed, mean, chol, cand, dd_paths, N_STEPS, score_dtype=sd)
            return (term.sum() + dd.sum()) * 1e-9

        rate = n_cand * dd_paths * N_STEPS / diff_timed(_chain(mdd), k=K, trials=TRIALS)
        _emit(f"multi_dd_{label}_cand_path_steps_per_sec", rate,
              f"cand-path-steps/s (256 cand, 131072 paths, 252 steps, {sd})")

    # -- drawdown-frontier auto precision tier (round 4): the engine default
    # resolves score_dtype="auto" to the bf16 screen + exact winner rescore
    # on big buy-and-hold workloads; identical optimum, less wall
    from mcport.engine.drawdown_frontier import drawdown_frontier_search
    from mcport.models.gbm import GBMParams

    fp = GBMParams(s0=np.full(N_ASSETS, 100.0), mean_step=np.asarray(mean),
                   chol_step=np.asarray(chol))
    # sized so the screen dominates the tunnel's ~0.25 s dispatch floor
    # (1.4e11 cand-path-steps; the bf16 screen halves ~1.3 s of f32 compute)
    fkw = dict(dd_budget=0.5, n_candidates=4096, n_paths=131_072,
               n_steps=N_STEPS, w_block=256)

    def frontier_wall(sd):
        t0 = time.perf_counter()
        r = drawdown_frontier_search(jax.random.key(5), fp, score_dtype=sd,
                                     **fkw)
        return time.perf_counter() - t0, r

    frontier_wall("float32")                    # compile both programs
    frontier_wall("auto")
    t32, r32 = frontier_wall("float32")         # warm walls
    tauto, rauto = frontier_wall("auto")
    # equivalent = same candidate, or distinct candidates whose exact mean
    # returns tie within the cross-program reduction ulp (both exact-optimal);
    # opt_idx < 0 means "no feasible candidate" — never index with it (ret[-1]
    # would silently compare an arbitrary candidate)
    feasible = int(r32.opt_idx) >= 0 and int(rauto.opt_idx) >= 0
    same = feasible and (
        r32.opt_idx == rauto.opt_idx
        or abs(float(r32.ret[r32.opt_idx]) - float(rauto.ret[rauto.opt_idx]))
        <= 4e-7 * max(1.0, abs(float(r32.ret[r32.opt_idx]))))
    _emit("dd_frontier_auto_speedup", t32 / max(tauto, 1e-9),
          f"x wall vs full-f32 (4096 cand, 131072 paths, 252 steps, warm; "
          f"optimum equivalent: {bool(same)})")

    # -- stationary block bootstrap kernel
    from mcport.ops.pallas_bootstrap import pallas_bootstrap_terminal_returns

    hist = rng.normal(1e-3, 0.02, (365, N_ASSETS)).astype(np.float32)

    @jax.jit
    def boot(seed):
        return pallas_bootstrap_terminal_returns(
            seed, hist, N_PATHS, N_STEPS).sum() * 1e-9

    rate = N_PATHS * N_STEPS / diff_timed(_chain(boot), k=K, trials=TRIALS)
    _emit("bootstrap_path_steps_per_sec", rate,
          "path-steps/s (365-row history, 15 assets, 252 steps, bit-exact)",
          rate / BASELINE_PATH_STEPS_PER_SEC)

    # -- family candidate path-stats kernels (round 3: GARCH/bootstrap
    # counterparts of multi_dd — W candidates compound rebalanced wealth with
    # peak/drawdown carries inside the path evolution)
    from mcport.ops.pallas_bootstrap import pallas_bootstrap_path_stats
    from mcport.ops.pallas_garch import pallas_garch_path_stats

    @jax.jit
    def garch_dd(seed):
        term, dd = pallas_garch_path_stats(
            seed, gp, cand, dd_paths, N_STEPS)
        return (term.sum() + dd.sum()) * 1e-9

    rate = n_cand * dd_paths * N_STEPS / diff_timed(_chain(garch_dd), k=K, trials=TRIALS)
    _emit("garch_multi_dd_cand_path_steps_per_sec", rate,
          "cand-path-steps/s (CCC-GARCH, 256 cand, 131072 paths, 252 steps)")

    @jax.jit
    def boot_dd(seed):
        term, dd = pallas_bootstrap_path_stats(
            seed, hist, cand, dd_paths, N_STEPS)
        return (term.sum() + dd.sum()) * 1e-9

    rate = n_cand * dd_paths * N_STEPS / diff_timed(_chain(boot_dd), k=K, trials=TRIALS)
    _emit("bootstrap_multi_dd_cand_path_steps_per_sec", rate,
          "cand-path-steps/s (bootstrap, 256 cand, 131072 paths, 252 steps)")

    from mcport.ops.pallas_jump import pallas_merton_path_stats

    muj = np.full(N_ASSETS, -0.08, np.float32)
    sigj = np.full(N_ASSETS, 0.04, np.float32)

    @jax.jit
    def jump_dd(seed):
        term, dd = pallas_merton_path_stats(
            seed, mean, chol, 0.02, muj, sigj, cand, dd_paths, N_STEPS)
        return (term.sum() + dd.sum()) * 1e-9

    rate = n_cand * dd_paths * N_STEPS / diff_timed(_chain(jump_dd), k=K, trials=TRIALS)
    _emit("jump_multi_dd_cand_path_steps_per_sec", rate,
          "cand-path-steps/s (Merton jumps, 256 cand, 131072 paths, 252 steps)")

    from mcport.ops.pallas_dcc import pallas_dcc_path_stats

    @jax.jit
    def dcc_dd(seed):
        term, dd = pallas_dcc_path_stats(
            seed, dp, cand, dd_paths, dcc_steps)
        return (term.sum() + dd.sum()) * 1e-9

    rate = n_cand * dd_paths * dcc_steps / diff_timed(_chain(dcc_dd), k=K, trials=TRIALS)
    _emit("dcc_multi_dd_cand_path_steps_per_sec", rate,
          "cand-path-steps/s (DCC-GARCH, 256 cand, 131072 paths, 52 steps)")

    # -- Heston stochastic-vol kernels (round 4: seventh family — two normal
    # fields per step, so the PRNG draw rate per path-step is 2x GBM's)
    from mcport.models.heston import HestonParams
    from mcport.ops.pallas_heston import (
        pallas_heston_path_stats, pallas_heston_terminal_returns,
    )

    hp = HestonParams(
        mu=np.asarray(mean, np.float64), kappa=np.full(N_ASSETS, 0.15),
        theta=np.full(N_ASSETS, 4e-4), xi=np.full(N_ASSETS, 3e-3),
        rho=np.full(N_ASSETS, -0.5), v0=np.full(N_ASSETS, 4e-4),
        corr_chol=np.linalg.cholesky(0.5 * np.eye(N_ASSETS) + 0.5),
        s0=np.full(N_ASSETS, 100.0))

    @jax.jit
    def heston(seed):
        return pallas_heston_terminal_returns(
            seed, hp, N_PATHS, N_STEPS).sum() * 1e-9

    rate = N_PATHS * N_STEPS / diff_timed(_chain(heston), k=K, trials=TRIALS)
    _emit("heston_path_steps_per_sec", rate,
          "path-steps/s (Heston stochastic vol, 15 assets, 252 steps, "
          "2 normal fields/step)",
          rate / BASELINE_PATH_STEPS_PER_SEC)

    @jax.jit
    def heston_dd(seed):
        term, dd = pallas_heston_path_stats(
            seed, hp, cand, dd_paths, N_STEPS)
        return (term.sum() + dd.sum()) * 1e-9

    rate = n_cand * dd_paths * N_STEPS / diff_timed(_chain(heston_dd), k=K, trials=TRIALS)
    _emit("heston_multi_dd_cand_path_steps_per_sec", rate,
          "cand-path-steps/s (Heston, 256 cand, 131072 paths, 252 steps)")

    # -- pathwise Greeks (round 4): warm wall of the full jacrev — 1 forward
    # + 3 reverse passes of the remat'd 131072x252 simulation per call
    import time as _time

    from mcport.config import GBMConfig
    from mcport.engine.greeks import portfolio_sensitivities
    from mcport.models.gbm import GBMParams

    gp = GBMParams(mean_step=np.asarray(mean), chol_step=np.asarray(chol),
                   s0=np.full(N_ASSETS, 100.0))
    gw = np.full(N_ASSETS, 1.0 / N_ASSETS)
    gcfg = GBMConfig(n_paths=131_072, n_steps=N_STEPS, seed=0)
    portfolio_sensitivities(gp, gw, gcfg)            # compile
    t0 = _time.perf_counter()
    gout = portfolio_sensitivities(gp, gw, gcfg)     # host API incl. fetch
    gwall = _time.perf_counter() - t0
    _emit("greeks_jacrev_warm_wall_s", gwall,
          f"s (mean/VaR/CVaR grads wrt w+mu+vol, 131072x252 remat'd sim; "
          f"euler_gap_cvar {gout.euler_gap_cvar:.1e})")


def configs(mean, chol):
    """BASELINE configs 3 and 4: end-to-end wall times (cold incl. compile)."""
    import jax

    from mcport.engine.simulated_frontier import simulated_weight_search_streaming
    from mcport.models.gbm import GBMParams

    params = GBMParams(s0=np.full(N_ASSETS, 100.0),
                       mean_step=np.asarray(mean, np.float64),
                       chol_step=np.asarray(chol, np.float64))
    min_w = np.full(N_ASSETS, 0.01)
    max_w = np.full(N_ASSETS, 0.60)

    def run_c3():
        t0 = time.perf_counter()
        simulated_weight_search_streaming(
            jax.random.key(0), params, n_candidates=1_048_576, n_paths=16_384,
            n_steps=N_STEPS, objective="cvar", min_weights=min_w,
            max_weights=max_w)
        return time.perf_counter() - t0

    cold = run_c3()
    warm = min(run_c3(), run_c3())
    _emit("config3_streaming_1m_constrained_cold_s", cold,
          "s wall, 1M constrained candidates incl. compile (config 3)")
    _emit("config3_streaming_1m_constrained_warm_s", warm,
          "s wall, warm (config 3)")

    from mcport.config import GBMConfig
    from mcport.engine.mc_engine import run_resumable_mc

    cfg = GBMConfig(n_paths=16_777_216, path_block=1_048_576, n_steps=N_STEPS,
                    use_pallas=True)
    w = np.full(N_ASSETS, 1.0 / N_ASSETS)
    t0 = time.perf_counter()
    report, _ = run_resumable_mc(params, w, cfg)
    wall = time.perf_counter() - t0
    _emit("config4_16m_tail_wall_s", wall,
          f"s wall, 16.7M-path VaR/CVaR sketch (config 4; cvar={report.cvar:.4f})")


def headline(mean, chol, on_tpu):
    import jax
    import jax.numpy as jnp

    n_paths = N_PATHS if on_tpu else 16_384  # CPU fallback stays honest but small

    if on_tpu:
        from mcport.ops.pallas_gbm import pallas_terminal_log_returns

        def one(seed):
            return pallas_terminal_log_returns(seed, mean, chol, n_paths, N_STEPS).sum()
    else:
        from mcport.models.gbm import terminal_log_returns

        def one(seed):
            key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
            return terminal_log_returns(key, mean, chol, n_paths, N_STEPS).sum()

    # K-vs-2K difference with data-chained on-device fori_loop reps and a
    # scalar VALUE fetch (see module docstring for why).
    REPS = 5

    def make_loop(k):
        @jax.jit
        def loop(seed0):
            def body(i, acc):
                chain = jnp.int32(acc * 1e-6) & 7
                return acc + one(seed0 + (i + 1) * (1 << 20) + chain)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return loop

    float(jnp.zeros(()).sum())                 # warm the transfer path first
    loop_k, loop_2k = make_loop(REPS), make_loop(2 * REPS)
    float(loop_k(jnp.asarray(0, jnp.int32)))   # compile
    float(loop_2k(jnp.asarray(0, jnp.int32)))

    def timed(fn, seed):
        t0 = time.perf_counter()
        float(fn(jnp.asarray(seed, jnp.int32)))  # value fetch = true completion
        return time.perf_counter() - t0

    t_k = min(timed(loop_k, 11), timed(loop_k, 13))
    t_2k = min(timed(loop_2k, 17), timed(loop_2k, 19))
    dt = max(t_2k - t_k, 1e-9) / REPS
    value = n_paths * N_STEPS / dt

    print(json.dumps({
        "metric": "gbm_path_steps_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "path-steps/s (15 assets, 252 steps, f32)",
        "vs_baseline": round(value / BASELINE_PATH_STEPS_PER_SEC, 3),
    }))


def _error_headline(detail: str) -> None:
    # The driver parses the LAST JSON line; never leave it a traceback.
    print(json.dumps({
        "metric": "gbm_path_steps_per_sec_per_chip", "value": 0.0,
        "unit": f"error: {detail}"[:300],
        "vs_baseline": 0.0,
    }), flush=True)


def main() -> None:
    # Outage-proof init (VERDICT r3 item 1): honor JAX_PLATFORMS=cpu (the axon
    # plugin ignores the env var — CLAUDE.md), and bound backend init with a
    # watchdog: a hung plugin factory holds xla_bridge's process-global lock,
    # so on timeout the only clean move is to print the parseable tail and
    # _exit. Zero added latency when the tunnel is healthy (unlike a probe
    # subprocess, which would double the ~65-440 s tunnel init).
    import os

    from mcport.utils.backend import apply_platform, forced_platform, init_watchdog

    forced = forced_platform()
    if forced is not None:
        apply_platform(forced)

    def _die_bounded():
        _emit("backend_status", 0.0,
              "error: tpu_unavailable (backend init exceeded watchdog)")
        _error_headline("tpu_unavailable (backend init exceeded watchdog)")
        os._exit(0)

    cancel = init_watchdog(
        float(os.environ.get("MCPORT_BACKEND_TIMEOUT", "900")), _die_bounded)
    try:
        import jax

        on_tpu = jax.default_backend() == "tpu"
    except Exception as e:  # fast-fail mode: tunnel relay down, init raised
        cancel()
        detail = f"tpu_unavailable ({type(e).__name__}: {e})"
        _emit("backend_status", 0.0, f"error: {detail}"[:300])
        _error_headline(detail)
        return
    cancel()

    mean, chol = _universe()

    if not on_tpu:
        try:
            headline(mean, chol, False)
        except Exception as e:
            _error_headline(f"{type(e).__name__}: {e}")
        return

    _tpu_main(mean, chol)


def _tpu_main(mean, chol) -> None:
    # Stall-proofing (round 5): the tunnel can freeze MID-FLEET with zero
    # device progress (observed: 26 min stalled at fleet line 11, the round-3
    # outage signature). The headline must survive that, so it is MEASURED
    # FIRST — while the tunnel is freshest — into a held buffer that is
    # printed last (the driver parses the LAST JSON line). Two watchdogs,
    # same pattern as init_watchdog (print the parseable tail, then _exit —
    # a stalled device call cannot be interrupted any other way):
    #   1. headline phase: MCPORT_HEADLINE_TIMEOUT (default 1800 s — the
    #      tunnel's observed stalls run 20-40 min and a spurious zero headline
    #      is costly) -> error
    #      headline.
    #   2. fleet/configs phase: MCPORT_FLEET_DEADLINE (default 2700 s) ->
    #      status line + the held headline.
    # Module-level (not inlined in main) so tests can monkeypatch the stages
    # and pin the held-headline contract without a TPU.
    import contextlib
    import io
    import os
    import threading

    # redirect_stdout swaps the GLOBAL sys.stdout, which the watchdog thread
    # shares — its tail line must go to the real stream or _exit drops it.
    real_stdout = sys.stdout

    def _headline_hung():
        real_stdout.write(json.dumps({
            "metric": "gbm_path_steps_per_sec_per_chip", "value": 0.0,
            "unit": "error: tpu_stalled (headline exceeded watchdog)",
            "vs_baseline": 0.0,
        }) + "\n")
        real_stdout.flush()
        os._exit(0)

    timer = threading.Timer(
        float(os.environ.get("MCPORT_HEADLINE_TIMEOUT", "1800")), _headline_hung)
    timer.daemon = True
    timer.start()
    buf = io.StringIO()
    try:
        with contextlib.redirect_stdout(buf):
            headline(mean, chol, True)
    except Exception as e:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            _error_headline(f"{type(e).__name__}: {e}")
    timer.cancel()
    held = buf.getvalue()

    def _fleet_stalled():
        _emit("fleet_status", 0.0,
              "error: fleet deadline exceeded (tunnel stall); headline below "
              "was pre-measured at process start")
        sys.stdout.write(held)
        sys.stdout.flush()
        os._exit(0)

    timer = threading.Timer(
        float(os.environ.get("MCPORT_FLEET_DEADLINE", "2700")), _fleet_stalled)
    timer.daemon = True
    timer.start()
    for stage in (fleet, configs):
        try:
            stage(mean, chol)
        except Exception as e:  # fail-isolated: headline must still print
            _emit(f"{stage.__name__}_error", 0.0, f"{type(e).__name__}: {e}")
    timer.cancel()
    sys.stdout.write(held)
    sys.stdout.flush()


if __name__ == "__main__":
    main()
