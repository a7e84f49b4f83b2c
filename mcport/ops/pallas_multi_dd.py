"""Fused multi-portfolio drawdown kernel: W candidate portfolios evolve through
one set of GBM paths with per-step MXU scoring.

``gbm_path_stats`` tracks one portfolio; this kernel batches candidates as MXU
rows: per step the asset state exponentiates once ((A_pad, block) VPU) and the
candidate values come from ``W @ exp(logS)`` — a (w_pad, A_pad) x (A_pad, block)
matmul — so adding candidates costs MXU FLOPs, not more RNG/transcendentals.
Running peaks and max drawdowns are carried per (candidate, path) in VMEM.

Outputs per path block: terminal candidate values and max drawdowns, both
(w_pad, block). Downstream code reduces them to per-candidate tail statistics
(see :mod:`mcport.engine.drawdown_frontier`).

The per-call candidate count is bounded by VMEM (3 x (w_pad, block) carries +
the asset state); 256 candidates x 1024 lanes x f32 ≈ 3 MB — callers chunk
larger candidate sets.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcport.ops import pallas_gbm as _pg
from mcport.ops.pallas_gbm import _make_normal_pair, _round_up, paired_step_loop

__all__ = ["gbm_multi_portfolio_dd", "make_hedged_returns",
           "BF16_DD_ERR_BOUND", "BF16_DD_ERR_REBAL_COEF"]

# Pinned bf16-screening drawdown perturbation bounds. These are the SINGLE
# source of truth shared by the rescore margin in
# mcport.engine.drawdown_frontier and the error assertions in
# tests/test_drawdown_frontier.py / tests/test_tpu_kernels.py, so the margin
# and the tested bounds cannot drift apart: a candidate whose true f32 dd_p95
# is within budget but whose bf16 screen errs pessimistically by up to the
# bound must land inside the rescore pool for the exact-optimum guarantee.
BF16_DD_ERR_BOUND = 8e-3        # buy-and-hold |dd_p95| bound (tested at 13-26 steps)
BF16_DD_ERR_REBAL_COEF = 1.4e-2  # rebalance widening: coef*sqrt(n_steps) (~5e-2 @ 13)


def make_hedged_returns(ht_ref, hk_ref, hp_ref, hq_ref):
    """In-kernel per-period option settlement (mcport.options.hedged
    semantics, app.py:164-180 per simulated step): returns a
    ``hedged_returns(p_prev, p_new)`` closure mapping an (A_pad, block)
    price move to the qty-weighted hedged return matrix. Leg types are a
    static-L unrolled 7-way select per (asset, leg); qty-0 padding rows
    contribute exactly zero. Shared by every path kernel with a hedged
    mode (multi-dd GBM, GARCH, bootstrap)."""
    n_legs = ht_ref.shape[1]

    def hedged_returns(p_prev, p_new):
        r = jnp.zeros_like(p_new)
        up = p_new - p_prev
        for l in range(n_legs):
            t = ht_ref[:, l:l + 1]            # (a_pad, 1) int32
            k = hk_ref[:, l:l + 1]
            prem = hp_ref[:, l:l + 1]
            q = hq_ref[:, l:l + 1]
            call_iv = jnp.maximum(p_new - k, 0.0)
            put_iv = jnp.maximum(k - p_new, 0.0)
            numer = jnp.where(
                t == 0, up, jnp.where(
                    (t == 1) | (t == 6), -up, jnp.where(
                        t == 2, call_iv - prem, jnp.where(
                            t == 3, prem - call_iv, jnp.where(
                                t == 4, put_iv - prem, jnp.where(
                                    t == 5, prem - put_iv,
                                    0.0))))))  # unknown type: 0, matching
            # legs.leg_period_return's default branch (HedgeSpec.build
            # validates types, so this is defense in depth, not dispatch)
            r = r + q * numer
        return r / p_prev

    return hedged_returns


def _multi_dd_kernel(
    seed_ref, m_ref, lt_ref, w_ref, *rest, n_steps: int,
    interpret: bool, prefetch: bool = False, score_dtype: str = "float32",
    rebalance: bool = False, hedged: bool = False, unroll: int = 1,
    t_df: float | None = None, bm: str = "poly"
):
    if hedged:
        s0_ref, ht_ref, hk_ref, hp_ref, hq_ref, term_ref, dd_ref = rest
    else:
        term_ref, dd_ref = rest
    w_pad, block = term_ref.shape
    a_pad = m_ref.shape[0]
    if t_df is not None:
        from mcport.ops.pallas_gbm import _make_t_pair

        normal_pair = _make_t_pair(interpret, seed_ref, (a_pad, block), t_df)
    else:
        normal_pair = _make_normal_pair(interpret, seed_ref, (a_pad, block), bm)

    m = m_ref[:]          # (a_pad, 1)
    lt = lt_ref[:]        # (a_pad, a_pad)
    w = w_ref[:]          # (w_pad, a_pad) candidate weights (zero rows on padding)

    # score_dtype="bfloat16": feed the per-step candidate matmul bf16 operands
    # (f32 MXU accumulation) — the asset state and peak/dd carries stay f32, so
    # only the scoring value picks up the ~2^-9 operand rounding (|dd error|
    # ~2e-3 absolute; candidate RANKING is MC-noise-dominated well above that —
    # see test_multi_dd_bf16 and benchmarks/RESULTS.md). For buy-and-hold,
    # terminal returns are always computed in f32 from the exact f32 asset
    # state; in rebalance mode the wealth recursion compounds the per-step
    # scoring factor, so bf16 error accumulates (~sqrt(T) x 1e-3 relative)
    # into BOTH dd and terminal — screen with it, re-score winners at f32.
    # Three explicit scoring tiers (the TPU default for f32 operands is
    # single-pass bf16 — 2.4e-3 relative — so "float32" must REQUEST float32
    # = 6 passes). "tensorfloat32" is a MANUAL 3-pass: both operands split
    # hi+lo in bf16 and the lo·lo term is dropped (~1.5e-5 relative, the
    # cheap near-exact middle) — manual because Mosaic rejects lax's HIGH
    # contract precision outright. "bfloat16" is the native single pass at
    # ~2e-3, for screening with an exact rescore; it must request its own
    # precision explicitly since mcport sets float32 as the GLOBAL default
    # and Mosaic rejects fp32 contract precision on bf16 operands.
    bkw = dict(precision="bfloat16", preferred_element_type=jnp.float32)
    if score_dtype == "tensorfloat32":
        w1 = w.astype(jnp.bfloat16)
        w2 = (w - w1.astype(jnp.float32)).astype(jnp.bfloat16)

        def score_dot(e):
            e1 = e.astype(jnp.bfloat16)
            e2 = (e - e1.astype(jnp.float32)).astype(jnp.bfloat16)
            return (jnp.dot(w1, e1, **bkw) + jnp.dot(w1, e2, **bkw)
                    + jnp.dot(w2, e1, **bkw))
    elif score_dtype == "bfloat16":
        w_b = w.astype(jnp.bfloat16)

        def score_dot(e):
            return jnp.dot(w_b, e.astype(jnp.bfloat16), **bkw)
    else:
        def score_dot(e):
            return jnp.dot(w, e, precision="float32",
                           preferred_element_type=jnp.float32)

    if hedged:
        # hedged per-period settlement (mcport.options.hedged semantics): the
        # asset PRICE state evolves in VMEM; each step settles every leg at
        # intrinsic value against the move P -> P·exp(x) (app.py:164-180 per
        # period), and candidates compound V_{t+1} = V_t · (1 + W r_hedged)
        # — the same (w_pad, a_pad) x (a_pad, block) scoring matmul as
        # rebalance mode, applied to the hedged return matrix. Leg types are
        # a static-L unrolled 7-way select per (asset, leg); qty-0 padding
        # rows contribute exactly zero.
        s0 = s0_ref[:]                            # (a_pad, 1), padding 1.0
        hedged_returns = make_hedged_returns(ht_ref, hk_ref, hp_ref, hq_ref)

        def one_step(z, carry):
            p, v, peak, dd = carry
            x = m + _pg.correlate(lt, z)
            p_new = p * jnp.exp(x)
            f = 1.0 + score_dot(hedged_returns(p, p_new))   # (w_pad, block)
            v = v * f
            peak = jnp.maximum(peak, v)
            dd = jnp.minimum(dd, v / peak - 1.0)
            return p_new, v, peak, dd

        init = (
            jnp.broadcast_to(s0, (a_pad, block)).astype(jnp.float32),
            jnp.ones((w_pad, block), jnp.float32),
            jnp.ones((w_pad, block), jnp.float32),
            jnp.zeros((w_pad, block), jnp.float32),
        )
        _, v, peak, dd = paired_step_loop(normal_pair, one_step, init,
                                          n_steps, prefetch, unroll)
        term_ref[:] = v - 1.0
        dd_ref[:] = dd
        return

    if rebalance:
        # per-period rebalancing to the candidate weights (the reference's
        # historical R·w convention, app.py:710): V_{t+1} = V_t · (W exp(x_t))
        # — same matmul shape as buy-and-hold scoring, but of the per-STEP
        # gross factor, with (w_pad, block) wealth as the carried state.
        def one_step(z, carry):
            v, peak, dd = carry
            x = m + _pg.correlate(lt, z)
            f = score_dot(jnp.exp(x))                        # (w_pad, block)
            v = v * f
            peak = jnp.maximum(peak, v)
            dd = jnp.minimum(dd, v / peak - 1.0)
            return v, peak, dd

        init = (
            jnp.ones((w_pad, block), jnp.float32),   # V_0 = 1
            jnp.ones((w_pad, block), jnp.float32),
            jnp.zeros((w_pad, block), jnp.float32),
        )
        v, peak, dd = paired_step_loop(normal_pair, one_step, init, n_steps,
                                       prefetch, unroll)
        term_ref[:] = v - 1.0
        dd_ref[:] = dd
        return

    def one_step(z, carry):
        acc, peak, dd = carry
        y = _pg.correlate(lt, z)
        acc = acc + m + y
        v = score_dot(jnp.exp(acc))                      # (w_pad, block)
        peak = jnp.maximum(peak, v)
        dd = jnp.minimum(dd, v / peak - 1.0)
        return acc, peak, dd

    init = (
        jnp.zeros((a_pad, block), jnp.float32),
        jnp.ones((w_pad, block), jnp.float32),   # V_0 = sum w = 1 (padded rows: 0-safe)
        jnp.zeros((w_pad, block), jnp.float32),
    )
    # draw-ahead software pipeline (see pallas_gbm.paired_step_loop):
    # bit-identical outputs either way; for THIS kernel the ~1-3 ms reps sit
    # in the tunnel noise floor and repeated v5e A/Bs flip sign (the candidate
    # matmul already keeps the MXU busy), so the default stays False — see
    # benchmarks/bench_prefetch.py
    acc, peak, dd = paired_step_loop(normal_pair, one_step, init, n_steps,
                                     prefetch, unroll)

    term_ref[:] = jnp.dot(w, jnp.exp(acc), precision="float32",
                          preferred_element_type=jnp.float32) - 1.0
    dd_ref[:] = dd


@functools.partial(
    jax.jit, static_argnames=("n_paths", "n_steps", "block", "interpret", "prefetch",
                              "score_dtype", "rebalance", "unroll", "t_df", "bm")
)
def gbm_multi_portfolio_dd(
    seed: Array,
    mean_step: Array,
    chol_step: Array,
    weights: Array,
    n_paths: int,
    n_steps: int,
    block: int = 1024,
    interpret: bool = False,
    prefetch: bool = False,
    score_dtype: str = "float32",
    rebalance: bool = False,
    hedge_args: tuple | None = None,
    unroll: int = 4,
    t_df: float | None = None,
    bm: str = "poly",
) -> tuple[Array, Array]:
    """(terminal returns (W, n_paths), max drawdowns (W, n_paths)) for W candidates.

    ``weights`` is (W, A); W is padded to sublanes internally — keep W <= ~256
    per call (VMEM) and chunk larger candidate sets outside.

    ``score_dtype`` picks the per-step candidate-value matmul tier:
    "float32" (default, exact, 6 MXU passes), "tensorfloat32" (3 passes,
    ~1.5e-5 relative — near-exact at roughly half the f32 cost), or
    "bfloat16" (native single pass, ~2e-3 — screening; re-evaluate winners
    at f32 if the dd VALUE matters, see engine/drawdown_frontier.py).
    Buy-and-hold terminal returns stay exact f32 in every mode.

    ``rebalance=True`` rebalances every candidate to its target weights each
    period (V_{t+1} = V_t · w'exp(x_t), the reference's historical-series
    semantics — /root/reference/app.py:710) instead of buy-and-hold; same
    per-step matmul cost. With bf16 the compounding recursion accumulates
    operand rounding into terminal returns too (~sqrt(T)·1e-3 relative).

    ``hedge_args = (s0 (A,), type_id (A, L) int, strike (A, L),
    premium (A, L), qty (A, L))`` switches to HEDGED per-period settlement
    (mcport.options.hedged semantics, app.py:164-193 per simulated step):
    the asset price state evolves in VMEM and candidates compound
    ``V_{t+1} = V_t · (1 + W r_hedged_t)`` — the settled recursion (implies
    rebalanced wealth; ``rebalance`` is ignored). Composes with every
    score_dtype tier.

    ``unroll=4`` (default) manually unrolls four Box-Muller pairs per loop
    iteration — same draw stream regardless of unroll; see
    pallas_gbm.paired_step_loop. Round-3 A/B: 1 -> 2 was +17% (88.5 ->
    103.3e9 cand-path-steps/s at W=256, f32); round-5 A/B (k=16
    best-of-3, replicated twice): 2 -> 4 is +5.6% (102.1 -> 107.8e9).
    unroll=8 is disqualified: its Mosaic compile did not finish in 37
    minutes on the v5e (2/4 compile in seconds).

    Padded-peak note: padded candidate rows have V_0 = 1 from init but V_t = 0
    afterwards, giving dd = -1 on padding; those rows are sliced away here.

    ``t_df`` swaps the shocks for unit-variance Student-t draws
    (pallas_gbm convention: the 1/sqrt(df/(df-2)) scale folds into the
    Cholesky factor) — fat-tail candidate scoring in every mode.

    ``bm="poly_fast"`` swaps in the screening-tier normal draws
    (pallas_gbm._boxmuller_poly_fast, |Δz| <= ~1.5e-4) — a DIFFERENT
    stream from the "poly" default, so the drawdown frontier keeps its
    winner rescore on the SAME bm for stream-consistent exactness.
    Ignored with ``t_df``.
    """
    m = jnp.asarray(mean_step, jnp.float32)
    chol = jnp.asarray(chol_step, jnp.float32)
    if t_df is not None:
        chol = chol / jnp.sqrt(jnp.float32(t_df / (t_df - 2.0)))
    w = jnp.asarray(weights, jnp.float32)
    w_cnt, a = w.shape
    # VMEM guard: past ~512 candidate rows the per-step (W, block) peak/dd
    # state spills registers and the Mosaic compile aborts (observed: 264M of
    # 128M vmem at W=8192). Auto-chunk — every chunk re-derives the SAME paths
    # (same seed → same per-block streams), so cross-chunk scores are exact.
    max_w = 256
    if w_cnt > max_w:
        parts = [
            gbm_multi_portfolio_dd(seed, mean_step, chol_step,
                                   w[i:i + max_w], n_paths, n_steps,
                                   block, interpret, prefetch, score_dtype,
                                   rebalance, hedge_args, unroll, t_df, bm)
            for i in range(0, w_cnt, max_w)
        ]
        return (jnp.concatenate([p[0] for p in parts], axis=0),
                jnp.concatenate([p[1] for p in parts], axis=0))
    a_pad = max(8, _round_up(a, 8))
    w_pad = max(8, _round_up(w_cnt, 8))
    m_p = jnp.zeros((a_pad, 1), jnp.float32).at[:a, 0].set(m)
    lt_p = jnp.zeros((a_pad, a_pad), jnp.float32).at[:a, :a].set(chol)
    w_p = jnp.zeros((w_pad, a_pad), jnp.float32).at[:w_cnt, :a].set(w)
    n_pad = _round_up(n_paths, block)
    grid = n_pad // block

    hedged = hedge_args is not None
    hedge_inputs, hedge_specs = [], []
    if hedged:
        s0, ht, hk, hp, hq = hedge_args
        n_legs = ht.shape[-1]
        # s0 padding 1.0 keeps the kernel's r/p_prev division defined on
        # padded rows (their qty rows are 0, so they contribute nothing)
        s0_p = jnp.ones((a_pad, 1), jnp.float32).at[:a, 0].set(
            jnp.asarray(s0, jnp.float32))
        pad2 = lambda x, dt: jnp.zeros((a_pad, n_legs), dt).at[:a, :].set(
            jnp.asarray(x, dt))
        hedge_inputs = [s0_p, pad2(ht, jnp.int32), pad2(hk, jnp.float32),
                        pad2(hp, jnp.float32), pad2(hq, jnp.float32)]
        leg_spec = lambda: pl.BlockSpec((a_pad, n_legs), lambda i: (0, 0),
                                        memory_space=pltpu.VMEM)
        hedge_specs = [
            pl.BlockSpec((a_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            leg_spec(), leg_spec(), leg_spec(), leg_spec(),
        ]

    term, dd = pl.pallas_call(
        functools.partial(_multi_dd_kernel, n_steps=n_steps, interpret=interpret,
                          prefetch=prefetch, score_dtype=score_dtype,
                          rebalance=rebalance, hedged=hedged, unroll=unroll,
                          t_df=t_df, bm=bm),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((a_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((a_pad, a_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w_pad, a_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            *hedge_specs,
        ],
        out_specs=(
            pl.BlockSpec((w_pad, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((w_pad, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((w_pad, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((w_pad, n_pad), jnp.float32),
        ),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), m_p, lt_p, w_p, *hedge_inputs)
    return term[:w_cnt, :n_paths], dd[:w_cnt, :n_paths]
