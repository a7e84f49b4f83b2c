"""Fused Pallas TPU kernel for common-jump Merton candidate path-stats.

Rebuilds the path tier of :mod:`mcport.models.jump` (itself the crash-risk
extension of the reference's single historical tail estimator,
/root/reference/app.py:258-263) as a fused kernel: W candidate portfolios
compound per-period rebalanced wealth with running peak/max-drawdown carries
while correlated-diffusion-plus-systemic-jump paths evolve in VMEM — the
Merton member of the multi-dd kernel family (pallas_multi_dd / pallas_garch /
pallas_bootstrap path-stats).

Stream layout: the z diffusion shocks ride the shared
:func:`mcport.ops.pallas_gbm._make_normal_pair` convention (one (A_pad,
block) pair per two steps); the jump clock consumes one extra (8, block)
uniform grid per FOUR steps — rows 0-3 are the Bernoulli event uniforms,
rows 4-7 feed two Box-Muller pairs for the four common jump normals (one
scalar row per step; every asset shares it — that is the systemic-crash
co-movement). Compiled mode draws both from the one stateful hardware PRNG;
interpret mode gives the jump grid a disjoint fold constant so the two
Threefry streams cannot collide.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcport.ops import pallas_gbm as _pg
from mcport.ops.pallas_gbm import (
    _bits_to_unit,
    _boxmuller_poly,
    _make_normal_pair,
    _round_up,
)

__all__ = ["pallas_merton_path_stats"]


def _make_jump_grid(interpret: bool, seed_ref, shape):
    """(8, block) uniform-grid factory for the jump clock.

    Compiled: draws from the SAME stateful hardware stream the normal factory
    seeded (call order defines the stream — fixed by the step loop below).
    Interpret: counter-addressed Threefry on a fold constant disjoint from
    the z stream."""
    if not interpret:
        def grid(_i: Array) -> Array:
            return _bits_to_unit(
                pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
            )

        return grid

    base = jax.random.fold_in(jax.random.PRNGKey(0), seed_ref[0])
    base = jax.random.fold_in(base, pl.program_id(0))
    base = jax.random.fold_in(base, 0x4A554D50)          # "JUMP": disjoint

    def grid(i: Array) -> Array:
        eps = 0.5 / (1 << 25)
        return jax.random.uniform(jax.random.fold_in(base, i), shape,
                                  jnp.float32, eps, 1.0)

    return grid


def _jump_dd_kernel(
    seed_ref, m_ref, lt_ref, muj_ref, sigj_ref, w_ref, *rest, n_steps: int,
    jump_rate: float, interpret: bool, hedged: bool = False,
):
    if hedged:
        s0_ref, ht_ref, hk_ref, hp_ref, hq_ref, term_ref, dd_ref = rest
    else:
        term_ref, dd_ref = rest
    w_pad, block = term_ref.shape
    a_pad = m_ref.shape[0]
    normal_pair = _make_normal_pair(interpret, seed_ref, (a_pad, block))
    jump_grid = _make_jump_grid(interpret, seed_ref, (8, block))

    m = m_ref[:]          # (a_pad, 1); padding rows zero → exp(x)=1 there
    lt = lt_ref[:]
    mu_j = muj_ref[:]     # (a_pad, 1), padding zero
    sig_j = sigj_ref[:]
    w = w_ref[:]          # (w_pad, a_pad), zero rows on padding
    lam = jnp.float32(jump_rate)

    def score_dot(r):
        return jnp.dot(w, r, precision="float32",
                       preferred_element_type=jnp.float32)

    def gross(z, ju, jn):
        # ju, jn: (1, block) event uniform + common jump normal for this step
        event = jnp.where(ju < lam, 1.0, 0.0)            # (1, block)
        x = m + _pg.correlate(lt, z) + event * (mu_j + sig_j * jn)
        return jnp.exp(x)                                # (a_pad, block)

    if hedged:
        from mcport.ops.pallas_multi_dd import make_hedged_returns

        hedged_returns = make_hedged_returns(ht_ref, hk_ref, hp_ref, hq_ref)
        s0 = s0_ref[:]                                    # (a_pad, 1), pad 1.0

        def one_step(z, ju, jn, carry):
            p, v, peak, dd = carry
            p_new = p * gross(z, ju, jn)
            f = 1.0 + score_dot(hedged_returns(p, p_new))
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
    else:
        def one_step(z, ju, jn, carry):
            v, peak, dd = carry
            f = score_dot(gross(z, ju, jn))              # (w_pad, block)
            v = v * f
            peak = jnp.maximum(peak, v)
            dd = jnp.minimum(dd, v / peak - 1.0)
            return v, peak, dd

        init = (
            jnp.ones((w_pad, block), jnp.float32),       # V_0 = 1 (rebalanced)
            jnp.ones((w_pad, block), jnp.float32),
            jnp.zeros((w_pad, block), jnp.float32),
        )

    def group(i, carry, count):
        """Advance ``count`` (1..4) steps of 4-step group ``i``: one jump
        grid + up to two z pairs, consumed in a fixed order so the compiled
        stateful stream is well-defined."""
        g = jump_grid(i)
        jn_a, jn_b = _boxmuller_poly(g[4:5, :], g[5:6, :])
        jn_c, jn_d = _boxmuller_poly(g[6:7, :], g[7:8, :])
        jn = (jn_a, jn_b, jn_c, jn_d)
        for j in range((count + 1) // 2):
            z1, z2 = normal_pair(2 * i + j)
            s = 2 * j
            carry = one_step(z1, g[s:s + 1, :], jn[s], carry)
            if s + 1 < count:
                carry = one_step(z2, g[s + 1:s + 2, :], jn[s + 1], carry)
        return carry

    n_major = n_steps // 4
    n_rem = n_steps % 4
    carry = jax.lax.fori_loop(0, n_major, lambda i, c: group(i, c, 4), init)
    if n_rem:
        carry = group(jnp.asarray(n_major, jnp.int32), carry, n_rem)
    if hedged:
        _, v, peak, dd = carry
    else:
        v, peak, dd = carry
    term_ref[:] = v - 1.0
    dd_ref[:] = dd


def pallas_merton_path_stats(
    seed: Array,
    mean_step: Array,
    chol_step: Array,
    jump_rate: float,
    jump_mean: Array,
    jump_vol: Array,
    weights: Array,
    n_paths: int,
    n_steps: int,
    block: int = 1024,
    interpret: bool = False,
    hedge_args: tuple | None = None,
) -> tuple[Array, Array]:
    """(terminal returns (W, n_paths), max drawdowns (W, n_paths)) for W
    candidate portfolios under common-jump Merton paths — the fused form of
    :func:`mcport.models.jump.merton_path_stats` (same model, independent
    stream; same per-step Bernoulli jump clock).

    W candidates compound the per-period rebalanced wealth recursion
    ``V_{t+1} = V_t · (w'exp(x_t))`` via one (w_pad, a_pad) x (a_pad, block)
    MXU matmul per step while the diffusion+jump log increments evolve in
    VMEM. ``hedge_args = (s0, type_id, strike, premium, qty)`` switches to
    hedged per-period settlement of every option leg against the simulated
    price path (mcport.options.hedged semantics) — crash risk composes with
    option hedging inside one kernel.

    Streams are ``seed + program_id`` per block; interpret mode swaps both
    bit sources for counter-addressed Threefry (jump grid on a disjoint fold
    constant). W chunks at 256 (VMEM).
    """
    return _call(seed, jnp.asarray(mean_step, jnp.float32),
                 jnp.asarray(chol_step, jnp.float32), float(jump_rate),
                 jnp.asarray(jump_mean, jnp.float32),
                 jnp.asarray(jump_vol, jnp.float32),
                 jnp.asarray(weights, jnp.float32),
                 n_paths, n_steps, block, interpret, hedge_args)


@functools.partial(
    jax.jit,
    static_argnames=("jump_rate", "n_paths", "n_steps", "block", "interpret")
)
def _call(
    seed, mean_step, chol_step, jump_rate: float, jump_mean, jump_vol,
    weights, n_paths: int, n_steps: int, block: int, interpret: bool,
    hedge_args,
):
    w = jnp.asarray(weights, jnp.float32)
    if w.ndim == 1:
        w = w[None, :]
    w_cnt, a = w.shape
    max_w = 256
    if w_cnt > max_w:
        parts = [
            _call(seed, mean_step, chol_step, jump_rate, jump_mean, jump_vol,
                  w[i:i + max_w], n_paths, n_steps, block, interpret,
                  hedge_args)
            for i in range(0, w_cnt, max_w)
        ]
        return (jnp.concatenate([p[0] for p in parts], axis=0),
                jnp.concatenate([p[1] for p in parts], axis=0))
    a_pad = max(8, _round_up(a, 8))
    w_pad = max(8, _round_up(w_cnt, 8))

    def col(x):
        return jnp.zeros((a_pad, 1), jnp.float32).at[:a, 0].set(
            jnp.asarray(x, jnp.float32))

    lt = jnp.zeros((a_pad, a_pad), jnp.float32).at[:a, :a].set(
        jnp.asarray(chol_step, jnp.float32))
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
        functools.partial(_jump_dd_kernel, n_steps=n_steps,
                          jump_rate=jump_rate, interpret=interpret,
                          hedged=hedged),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            vec(),
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
        col(mean_step), lt, col(jump_mean), col(jump_vol), w_p,
        *hedge_inputs,
    )
    return term[:w_cnt, :n_paths], dd[:w_cnt, :n_paths]
