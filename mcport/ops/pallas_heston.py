"""Fused Pallas kernel for Heston stochastic-volatility path simulation.

Same VMEM-resident design as the GARCH kernel (asset-major ``(A_pad, block)``
state, hardware PRNG + Box-Muller, cross-asset correlation on the MXU) but the
carried state is the CIR variance plus the accumulated log return, and every
step consumes TWO normal fields — the return shock and the variance shock —
i.e. one full Box-Muller pair per step instead of one pair per two steps:

    zc = L_R z                         (MXU: correlate)
    zv = rho zc + sqrt(1 - rho^2) w    (leverage)
    x  = (mu - v+/2) + sqrt(v+) zc     (log return, full truncation)
    v  = v + kappa (theta - v+) + xi sqrt(v+) zv

Matches :func:`mcport.models.heston.simulate_heston_returns` in law
(different RNG stream); ``interpret=True`` swaps the Threefry bit source for
CPU tests exactly like the other family kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcport.models.heston import HestonParams
from mcport.ops import pallas_gbm as _pg
from mcport.ops.pallas_gbm import _make_normal_pair, _round_up

__all__ = ["pallas_heston_terminal_returns", "pallas_heston_path_stats",
           "two_shock_step_loop"]


def two_shock_step_loop(normal_pair, one_step, init, n_steps: int,
                        unroll: int = 4):
    """Run ``one_step(z, w, carry)`` ``n_steps`` times, one full Box-Muller
    pair per step (z = return shocks, w = variance shocks).

    The Heston counterpart of :func:`mcport.ops.pallas_gbm.paired_step_loop`:
    there a pair covers two steps; here each step needs two independent
    normal fields, so the pair index IS the step index (counter-addressed in
    interpret mode — resumable per-block streams hold). ``unroll`` manually
    unrolls that many steps per ``fori_loop`` iteration for cross-step
    overlap of the correlate matmul with the next step's PRNG chain (the
    family-kernel unroll lever; stream order is unchanged, outputs are
    bit-identical — tested)."""
    if unroll > 1:
        main = n_steps // unroll

        def body(i, carry):
            for u in range(unroll):
                z, w = normal_pair(i * unroll + u)
                carry = one_step(z, w, carry)
            return carry

        state = jax.lax.fori_loop(0, main, body, init)
        for j in range(main * unroll, n_steps):
            z, w = normal_pair(jnp.asarray(j, jnp.int32))
            state = one_step(z, w, state)
        return state

    def body(i, carry):
        z, w = normal_pair(i)
        return one_step(z, w, carry)

    return jax.lax.fori_loop(0, n_steps, body, init)


def _heston_kernel(
    seed_ref, mu_ref, kappa_ref, theta_ref, xi_ref, rho_ref, v0_ref, lr_ref,
    out_ref, *, n_steps: int, interpret: bool, unroll: int = 4,
):
    a_pad, block = out_ref.shape
    normal_pair = _make_normal_pair(interpret, seed_ref, (a_pad, block))

    mu = mu_ref[:]        # (a_pad, 1); padding rows all-zero → x = 0
    kappa = kappa_ref[:]
    theta = theta_ref[:]
    xi = xi_ref[:]
    rho = rho_ref[:]
    rho_c = jnp.sqrt(1.0 - rho * rho)
    lr = lr_ref[:]        # (a_pad, a_pad) Cholesky of the shock correlation R

    def one_step(z, w, carry):
        v, acc = carry
        zc = _pg.correlate(lr, z)
        zv = rho * zc + rho_c * w
        vp = jnp.maximum(v, 0.0)
        sv = jnp.sqrt(vp)
        acc = acc + (mu - 0.5 * vp) + sv * zc
        v = v + kappa * (theta - vp) + xi * sv * zv
        return v, acc

    init = (
        jnp.broadcast_to(v0_ref[:], (a_pad, block)),
        jnp.zeros((a_pad, block), jnp.float32),
    )
    _, acc = two_shock_step_loop(normal_pair, one_step, init, n_steps, unroll)
    out_ref[:] = jnp.exp(acc) - 1.0


@functools.partial(
    jax.jit, static_argnames=("n_paths", "n_steps", "block", "interpret",
                              "unroll")
)
def _call(
    seed, mu, kappa, theta, xi, rho, v0, corr_chol,
    n_paths: int, n_steps: int, block: int, interpret: bool, unroll: int = 4,
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
    vec = lambda: pl.BlockSpec((a_pad, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_heston_kernel, n_steps=n_steps,
                          interpret=interpret, unroll=unroll),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            vec(), vec(), vec(), vec(), vec(), vec(),
            pl.BlockSpec((a_pad, a_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((a_pad, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((a_pad, n_pad), jnp.float32),
        interpret=interpret,
    )(
        jnp.asarray(seed, jnp.int32).reshape(1),
        col(mu), col(kappa), col(theta), col(xi), col(rho), col(v0), lr,
    )
    return out[:a, :n_paths].T


def pallas_heston_terminal_returns(
    seed: Array,
    params: HestonParams,
    n_paths: int,
    n_steps: int,
    block: int = 1024,
    interpret: bool = False,
    unroll: int = 4,
) -> Array:
    """Terminal compounded simple returns (n_paths, A) under the Heston law.

    Two normal fields per step (return + variance shocks) means one Box-Muller
    pair per step — exactly half the steps-per-draw of the GBM/GARCH kernels
    at the same PRNG rate. ``unroll=4`` per the round-5 hardware A/B
    (benchmarks/bench_heston.py, k=16 best-of-3: 2.26/2.78/2.89e9
    path-steps/s at unroll 1/2/4; stream-identical, outputs agree to fusion
    tolerance)."""
    return _call(
        seed, params.mu, params.kappa, params.theta, params.xi, params.rho,
        params.v0, params.corr_chol, n_paths, n_steps, block, interpret,
        unroll,
    )


def _heston_dd_kernel(
    seed_ref, mu_ref, kappa_ref, theta_ref, xi_ref, rho_ref, v0_ref, lr_ref,
    w_ref, *rest, n_steps: int, interpret: bool, hedged: bool = False,
    unroll: int = 4,
):
    if hedged:
        s0_ref, ht_ref, hk_ref, hp_ref, hq_ref, term_ref, dd_ref = rest
    else:
        term_ref, dd_ref = rest
    w_pad, block = term_ref.shape
    a_pad = mu_ref.shape[0]
    normal_pair = _make_normal_pair(interpret, seed_ref, (a_pad, block))

    mu = mu_ref[:]
    kappa = kappa_ref[:]
    theta = theta_ref[:]
    xi = xi_ref[:]
    rho = rho_ref[:]
    rho_c = jnp.sqrt(1.0 - rho * rho)
    lr = lr_ref[:]
    w = w_ref[:]          # (w_pad, a_pad) candidate weights (zero rows pad)

    def score_dot(r):
        return jnp.dot(w, r, precision="float32",
                       preferred_element_type=jnp.float32)

    def vol_step(z, wv, v):
        """(gross per-asset factor, next variance) — shared by both modes."""
        zc = _pg.correlate(lr, z)
        zv = rho * zc + rho_c * wv
        vp = jnp.maximum(v, 0.0)
        sv = jnp.sqrt(vp)
        g = jnp.exp((mu - 0.5 * vp) + sv * zc)
        v = v + kappa * (theta - vp) + xi * sv * zv
        return g, v

    if hedged:
        from mcport.ops.pallas_multi_dd import make_hedged_returns

        hedged_returns = make_hedged_returns(ht_ref, hk_ref, hp_ref, hq_ref)
        s0 = s0_ref[:]                            # (a_pad, 1), padding 1.0

        def one_step(z, wv, carry):
            v_var, p, v, peak, dd = carry
            g, v_var = vol_step(z, wv, v_var)
            p_new = p * g
            f = 1.0 + score_dot(hedged_returns(p, p_new))   # (w_pad, block)
            v = v * f
            peak = jnp.maximum(peak, v)
            dd = jnp.minimum(dd, v / peak - 1.0)
            return v_var, p_new, v, peak, dd

        init = (
            jnp.broadcast_to(v0_ref[:], (a_pad, block)),
            jnp.broadcast_to(s0, (a_pad, block)).astype(jnp.float32),
            jnp.ones((w_pad, block), jnp.float32),
            jnp.ones((w_pad, block), jnp.float32),
            jnp.zeros((w_pad, block), jnp.float32),
        )
        *_, v, peak, dd = two_shock_step_loop(normal_pair, one_step, init,
                                              n_steps, unroll)
        term_ref[:] = v - 1.0
        dd_ref[:] = dd
        return

    def one_step(z, wv, carry):
        v_var, v, peak, dd = carry
        g, v_var = vol_step(z, wv, v_var)
        f = score_dot(g)                                    # (w_pad, block)
        v = v * f
        peak = jnp.maximum(peak, v)
        dd = jnp.minimum(dd, v / peak - 1.0)
        return v_var, v, peak, dd

    init = (
        jnp.broadcast_to(v0_ref[:], (a_pad, block)),
        jnp.ones((w_pad, block), jnp.float32),   # V_0 = 1 (rebalanced wealth)
        jnp.ones((w_pad, block), jnp.float32),
        jnp.zeros((w_pad, block), jnp.float32),
    )
    *_, v, peak, dd = two_shock_step_loop(normal_pair, one_step, init,
                                          n_steps, unroll)
    term_ref[:] = v - 1.0
    dd_ref[:] = dd


def pallas_heston_path_stats(
    seed: Array,
    params: HestonParams,
    weights: Array,
    n_paths: int,
    n_steps: int,
    block: int = 1024,
    interpret: bool = False,
    hedge_args: tuple | None = None,
    unroll: int = 4,
) -> tuple[Array, Array]:
    """(terminal returns (W, n_paths), max drawdowns (W, n_paths)) for W
    candidate portfolios under Heston stochastic-volatility paths.

    The Heston counterpart of
    :func:`mcport.ops.pallas_garch.pallas_garch_path_stats`: one set of
    stochastic-vol paths evolves in VMEM (per-asset CIR variance carry) and W
    candidates compound the per-period REBALANCED wealth recursion
    ``V_{t+1} = V_t · (W exp(x_t))`` via a (w_pad, a_pad) x (a_pad, block)
    MXU matmul per step, with running peak/max-drawdown carries per
    (candidate, path).

    ``hedge_args = (s0 (A,), type_id (A, L) int, strike (A, L), premium
    (A, L), qty (A, L))`` switches to HEDGED per-period settlement: the asset
    PRICE state ``p_{t+1} = p_t exp(x_t)`` evolves in VMEM and every leg
    settles at intrinsic value each step (mcport.options.hedged semantics,
    app.py:164-193) — stochastic volatility composes with option hedging
    inside one kernel.

    Same seed → same per-block hardware streams as
    :func:`pallas_heston_terminal_returns` draws on its own (independent)
    stream; interpret mode swaps the Threefry bit source. W is padded to
    sublanes; candidate sets past 256 are auto-chunked (VMEM).
    """
    return _dd_call(
        seed, jnp.asarray(params.mu, jnp.float32),
        jnp.asarray(params.kappa, jnp.float32),
        jnp.asarray(params.theta, jnp.float32),
        jnp.asarray(params.xi, jnp.float32),
        jnp.asarray(params.rho, jnp.float32),
        jnp.asarray(params.v0, jnp.float32),
        jnp.asarray(params.corr_chol, jnp.float32),
        jnp.asarray(weights, jnp.float32),
        n_paths, n_steps, block, interpret, hedge_args, unroll,
    )


@functools.partial(
    jax.jit, static_argnames=("n_paths", "n_steps", "block", "interpret",
                              "unroll")
)
def _dd_call(
    seed, mu, kappa, theta, xi, rho, v0, corr_chol, weights,
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
            _dd_call(seed, mu, kappa, theta, xi, rho, v0, corr_chol,
                     w[i:i + max_w], n_paths, n_steps, block, interpret,
                     hedge_args, unroll)
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
        functools.partial(_heston_dd_kernel, n_steps=n_steps,
                          interpret=interpret, hedged=hedged, unroll=unroll),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            vec(), vec(), vec(), vec(), vec(), vec(),
            pl.BlockSpec((a_pad, a_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
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
        col(mu), col(kappa), col(theta), col(xi), col(rho), col(v0), lr,
        w_p, *hedge_inputs,
    )
    return term[:w_cnt, :n_paths], dd[:w_cnt, :n_paths]
