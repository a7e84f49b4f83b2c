"""Fused Pallas kernel for CCC-GARCH(1,1) path simulation.

Same VMEM-resident design as the GBM kernels (asset-major ``(A_pad, block)``
state, hardware PRNG + Box-Muller, per-step cross-asset correlation on the MXU)
but the carried state is the GARCH triple — conditional variance, last squared
innovation, compounded portfolio-gross value — so volatility clusters inside the
kernel with zero HBM traffic per step:

    z_c = L_R z_t                         (MXU: correlate)
    sigma2 = omega + alpha eps^2 + beta sigma2
    eps = sqrt(sigma2) * z_c
    V *= 1 + mu + eps                     (per-asset compounding)

Matches :func:`mcport.models.garch_mc.simulate_garch_returns` in law
(different RNG stream); ``interpret=True`` swaps the Threefry bit source for
CPU tests exactly like the GBM kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcport.models.garch_mc import CCCGarchParams
from mcport.ops import pallas_gbm as _pg
from mcport.ops.pallas_gbm import _make_normal_pair, _round_up, paired_step_loop

__all__ = ["pallas_garch_terminal_returns", "pallas_garch_path_stats"]


def _garch_kernel(
    seed_ref, mu_ref, omega_ref, alpha_ref, beta_ref, lr_ref, s2_ref, e2_ref,
    out_ref, *, n_steps: int, interpret: bool, prefetch: bool = False,
    unroll: int = 1
):
    a_pad, block = out_ref.shape
    normal_pair = _make_normal_pair(interpret, seed_ref, (a_pad, block))

    mu = mu_ref[:]        # (a_pad, 1)
    omega = omega_ref[:]
    alpha = alpha_ref[:]
    beta = beta_ref[:]
    lr = lr_ref[:]        # (a_pad, a_pad) Cholesky of the correlation R

    def one_step(z, carry):
        s2, e2, cum = carry
        zc = _pg.correlate(lr, z)
        s2 = omega + alpha * e2 + beta * s2
        eps = jnp.sqrt(jnp.maximum(s2, 0.0)) * zc
        cum = cum * (1.0 + mu + eps)
        return s2, eps * eps, cum

    init = (
        jnp.broadcast_to(s2_ref[:], (a_pad, block)),
        jnp.broadcast_to(e2_ref[:], (a_pad, block)),
        jnp.ones((a_pad, block), jnp.float32),
    )
    # draw-ahead pipeline (pallas_gbm.paired_step_loop): bit-identical either
    # way; A/B the default on hardware via benchmarks/bench_prefetch.py
    s2, e2, cum = paired_step_loop(normal_pair, one_step, init, n_steps,
                                   prefetch, unroll)
    out_ref[:] = cum - 1.0


@functools.partial(
    jax.jit, static_argnames=("n_paths", "n_steps", "block", "interpret",
                              "prefetch", "unroll")
)
def _call(
    seed, mu, omega, alpha, beta, corr_chol, sigma2_0, eps2_0,
    n_paths: int, n_steps: int, block: int, interpret: bool,
    prefetch: bool = False, unroll: int = 1,
):
    a = mu.shape[-1]
    a_pad = max(8, _round_up(a, 8))

    def col(x):
        return jnp.zeros((a_pad, 1), jnp.float32).at[:a, 0].set(
            jnp.asarray(x, jnp.float32))

    lr = jnp.zeros((a_pad, a_pad), jnp.float32).at[:a, :a].set(
        jnp.asarray(corr_chol, jnp.float32))
    n_pad = _round_up(n_paths, block)
    grid = n_pad // block
    vec = lambda: pl.BlockSpec((a_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_garch_kernel, n_steps=n_steps, interpret=interpret,
                          prefetch=prefetch, unroll=unroll),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            vec(), vec(), vec(), vec(),
            pl.BlockSpec((a_pad, a_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vec(), vec(),
        ],
        out_specs=pl.BlockSpec((a_pad, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((a_pad, n_pad), jnp.float32),
        interpret=interpret,
    )(
        jnp.asarray(seed, jnp.int32).reshape(1),
        col(mu), col(omega), col(alpha), col(beta), lr,
        col(sigma2_0), col(eps2_0),
    )
    return out[:a, :n_paths].T


def _garch_dd_kernel(
    seed_ref, mu_ref, omega_ref, alpha_ref, beta_ref, lr_ref, s2_ref, e2_ref,
    w_ref, *rest, n_steps: int, interpret: bool, hedged: bool = False,
    unroll: int = 1,
):
    if hedged:
        s0_ref, ht_ref, hk_ref, hp_ref, hq_ref, term_ref, dd_ref = rest
    else:
        term_ref, dd_ref = rest
    w_pad, block = term_ref.shape
    a_pad = mu_ref.shape[0]
    normal_pair = _make_normal_pair(interpret, seed_ref, (a_pad, block))

    mu = mu_ref[:]        # (a_pad, 1); padding rows are all-zero → r_t = 0
    omega = omega_ref[:]
    alpha = alpha_ref[:]
    beta = beta_ref[:]
    lr = lr_ref[:]
    w = w_ref[:]          # (w_pad, a_pad) candidate weights (zero rows on padding)

    def score_dot(r):
        return jnp.dot(w, r, precision="float32",
                       preferred_element_type=jnp.float32)

    if hedged:
        from mcport.ops.pallas_multi_dd import make_hedged_returns

        hedged_returns = make_hedged_returns(ht_ref, hk_ref, hp_ref, hq_ref)
        s0 = s0_ref[:]                            # (a_pad, 1), padding 1.0

        def one_step(z, carry):
            s2, e2, p, v, peak, dd = carry
            zc = _pg.correlate(lr, z)
            s2 = omega + alpha * e2 + beta * s2
            eps = jnp.sqrt(jnp.maximum(s2, 0.0)) * zc
            p_new = p * (1.0 + mu + eps)
            f = 1.0 + score_dot(hedged_returns(p, p_new))   # (w_pad, block)
            v = v * f
            peak = jnp.maximum(peak, v)
            dd = jnp.minimum(dd, v / peak - 1.0)
            return s2, eps * eps, p_new, v, peak, dd

        init = (
            jnp.broadcast_to(s2_ref[:], (a_pad, block)),
            jnp.broadcast_to(e2_ref[:], (a_pad, block)),
            jnp.broadcast_to(s0, (a_pad, block)).astype(jnp.float32),
            jnp.ones((w_pad, block), jnp.float32),
            jnp.ones((w_pad, block), jnp.float32),
            jnp.zeros((w_pad, block), jnp.float32),
        )
        *_, v, peak, dd = paired_step_loop(normal_pair, one_step, init,
                                           n_steps, False, unroll)
        term_ref[:] = v - 1.0
        dd_ref[:] = dd
        return

    def one_step(z, carry):
        s2, e2, v, peak, dd = carry
        zc = _pg.correlate(lr, z)
        s2 = omega + alpha * e2 + beta * s2
        eps = jnp.sqrt(jnp.maximum(s2, 0.0)) * zc
        f = 1.0 + score_dot(mu + eps)                       # (w_pad, block)
        v = v * f
        peak = jnp.maximum(peak, v)
        dd = jnp.minimum(dd, v / peak - 1.0)
        return s2, eps * eps, v, peak, dd

    init = (
        jnp.broadcast_to(s2_ref[:], (a_pad, block)),
        jnp.broadcast_to(e2_ref[:], (a_pad, block)),
        jnp.ones((w_pad, block), jnp.float32),   # V_0 = 1 (rebalanced wealth)
        jnp.ones((w_pad, block), jnp.float32),
        jnp.zeros((w_pad, block), jnp.float32),
    )
    *_, v, peak, dd = paired_step_loop(normal_pair, one_step, init, n_steps,
                                       False, unroll)
    term_ref[:] = v - 1.0
    dd_ref[:] = dd


def pallas_garch_path_stats(
    seed: Array,
    params: CCCGarchParams,
    weights: Array,
    n_paths: int,
    n_steps: int,
    block: int = 1024,
    interpret: bool = False,
    hedge_args: tuple | None = None,
    unroll: int = 4,
) -> tuple[Array, Array]:
    """(terminal returns (W, n_paths), max drawdowns (W, n_paths)) for W
    candidate portfolios under CCC-GARCH(1,1) paths. ``unroll=4`` default
    per the round-4 hardware A/B (k=16 windows, max-of-3: 90.8 / 99.3 /
    108.5e9 cand-path-steps/s at unroll 1/2/4; the dcc-dd counterpart
    measured flat within noise and stays at 2). Stream-neutral regrouping
    (pallas_gbm.paired_step_loop).

    The GARCH counterpart of
    :func:`mcport.ops.pallas_multi_dd.gbm_multi_portfolio_dd`: one set of
    volatility-clustered paths evolves in VMEM (per-asset sigma^2 / eps^2
    carries) and W candidates compound the per-period REBALANCED wealth
    recursion ``V_{t+1} = V_t · (1 + W r_t)`` via a (w_pad, a_pad) x
    (a_pad, block) MXU matmul per step — GARCH returns are per-period simple
    returns, so rebalanced compounding is the natural (reference-semantics,
    app.py:710) form. Running peaks and max drawdowns are carried per
    (candidate, path).

    ``hedge_args = (s0 (A,), type_id (A, L) int, strike (A, L), premium
    (A, L), qty (A, L))`` switches to HEDGED per-period settlement: the asset
    PRICE state ``p_{t+1} = p_t (1 + r_t)`` evolves in VMEM and every leg
    settles at intrinsic value each step (mcport.options.hedged semantics,
    app.py:164-193) — volatility clustering composes with option hedging
    inside one kernel. Identity legs reduce to the plain mode.

    Same seed → same per-block hardware streams as
    :func:`pallas_garch_terminal_returns` draws on its own (independent)
    stream; interpret mode swaps the Threefry bit source. W is padded to
    sublanes; chunk candidate sets past ~256 outside (VMEM).
    """
    return _dd_call(
        seed, jnp.asarray(params.mu, jnp.float32),
        jnp.asarray(params.omega, jnp.float32),
        jnp.asarray(params.alpha, jnp.float32),
        jnp.asarray(params.beta, jnp.float32),
        jnp.asarray(params.corr_chol, jnp.float32),
        jnp.asarray(params.sigma2_0, jnp.float32),
        jnp.asarray(params.eps2_0, jnp.float32),
        jnp.asarray(weights, jnp.float32),
        n_paths, n_steps, block, interpret, hedge_args, unroll,
    )


@functools.partial(
    jax.jit, static_argnames=("n_paths", "n_steps", "block", "interpret",
                              "unroll")
)
def _dd_call(
    seed, mu, omega, alpha, beta, corr_chol, sigma2_0, eps2_0, weights,
    n_paths: int, n_steps: int, block: int, interpret: bool,
    hedge_args, unroll: int,
):
    w = jnp.asarray(weights, jnp.float32)
    if w.ndim == 1:
        w = w[None, :]
    w_cnt, a = w.shape
    max_w = 256
    if w_cnt > max_w:
        parts = [
            _dd_call(seed, mu, omega, alpha, beta, corr_chol, sigma2_0,
                     eps2_0, w[i:i + max_w], n_paths, n_steps, block,
                     interpret, hedge_args, unroll)
            for i in range(0, w_cnt, max_w)
        ]
        return (jnp.concatenate([p[0] for p in parts], axis=0),
                jnp.concatenate([p[1] for p in parts], axis=0))
    a_pad = max(8, _round_up(a, 8))
    w_pad = max(8, _round_up(w_cnt, 8))

    def col(x):
        return jnp.zeros((a_pad, 1), jnp.float32).at[:a, 0].set(
            jnp.asarray(x, jnp.float32))

    lr = jnp.zeros((a_pad, a_pad), jnp.float32).at[:a, :a].set(
        jnp.asarray(corr_chol, jnp.float32))
    w_p = jnp.zeros((w_pad, a_pad), jnp.float32).at[:w_cnt, :a].set(w)
    n_pad = _round_up(n_paths, block)
    grid = n_pad // block
    vec = lambda: pl.BlockSpec((a_pad, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)

    hedged = hedge_args is not None
    hedge_inputs, hedge_specs = [], []
    if hedged:
        s0, ht, hk, hp, hq = hedge_args
        n_legs = ht.shape[-1]
        s0_p = jnp.ones((a_pad, 1), jnp.float32).at[:a, 0].set(
            jnp.asarray(s0, jnp.float32))
        pad2 = lambda x, dt: jnp.zeros((a_pad, n_legs), dt).at[:a, :].set(
            jnp.asarray(x, dt))
        hedge_inputs = [s0_p, pad2(ht, jnp.int32), pad2(hk, jnp.float32),
                        pad2(hp, jnp.float32), pad2(hq, jnp.float32)]
        leg_spec = lambda: pl.BlockSpec((a_pad, n_legs), lambda i: (0, 0),
                                        memory_space=pltpu.VMEM)
        hedge_specs = [vec(), leg_spec(), leg_spec(), leg_spec(), leg_spec()]

    term, dd = pl.pallas_call(
        functools.partial(_garch_dd_kernel, n_steps=n_steps,
                          interpret=interpret, hedged=hedged, unroll=unroll),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            vec(), vec(), vec(), vec(),
            pl.BlockSpec((a_pad, a_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            vec(), vec(),
            pl.BlockSpec((w_pad, a_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            *hedge_specs,
        ],
        out_specs=(
            pl.BlockSpec((w_pad, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_pad, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((w_pad, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((w_pad, n_pad), jnp.float32),
        ),
        interpret=interpret,
    )(
        jnp.asarray(seed, jnp.int32).reshape(1),
        col(mu), col(omega), col(alpha), col(beta), lr,
        col(sigma2_0), col(eps2_0),
        w_p, *hedge_inputs,
    )
    return term[:w_cnt, :n_paths], dd[:w_cnt, :n_paths]


def pallas_garch_terminal_returns(
    seed: Array,
    params: CCCGarchParams,
    n_paths: int,
    n_steps: int,
    block: int = 1024,
    interpret: bool = False,
    prefetch: bool = True,
    unroll: int = 8,
) -> Array:
    """Terminal compounded simple returns (n_paths, A) under CCC-GARCH(1,1).

    ``unroll=8`` (default) manually unrolls 8 Box-Muller pairs per loop
    iteration. unroll=4 was +29% over the round-2 prefetch default
    (3.80 -> 4.91e9, benchmarks/bench_unroll.py); the round-5 terminal u8
    A/B (benchmarks/bench_terminal_u8.py, k=16 best-of-3, replicated
    4.95/5.04 -> 5.11/5.11e9) adopted 8 — the only terminal kernel where
    u8 wins (gbm poly -2.2%, heston -1.2% stay at 4). Same draw stream at
    any unroll (identity asserted in the A/B's --check). ``prefetch``
    applies only at unroll=1 (the round-2 pipelining lever, ~8-12%).
    """
    return _call(
        seed, params.mu, params.omega, params.alpha, params.beta,
        params.corr_chol, params.sigma2_0, params.eps2_0,
        n_paths, n_steps, block, interpret, prefetch, unroll,
    )
