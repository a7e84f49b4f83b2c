"""Fused Pallas TPU kernel for stationary block-bootstrap paths.

The lax bootstrap engine (:mod:`mcport.models.bootstrap`) is gather-bound on
TPU: ``history[idx]`` for a (n_paths,) index vector routes through HBM gather
machinery (~0.24e9 path-steps/s measured). This kernel keeps the tiny (A, T)
history resident in VMEM and replaces the gather with a **one-hot MXU matmul**:

    selected_rows = history_T (A_pad, T_pad) @ onehot(idx) (T_pad, block)

The per-path index recursion (Politis-Romano stationary bootstrap: advance
circularly with prob 1-p, restart uniformly with prob p) runs on the VPU with
the on-core PRNG; one (8, block) random grid services four steps (two rows per
step: restart uniform + jump index). Streams are ``seed + program_id`` per
block like the GBM kernels — reproducible, shardable, resumable.

Law parity with the lax engine (same model, different bit source) is asserted
in tests; interpret mode swaps a counter-addressed Threefry source so CI can
run the identical kernel math (same pattern as pallas_gbm).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcport.ops.pallas_gbm import _make_uniform_grid, _round_up

__all__ = ["pallas_bootstrap_terminal_returns", "pallas_bootstrap_path_stats"]


def _split3(hist_t):
    """Manual 3-term bf16 split of the f32 history for EXACT one-hot selection
    (see the precision note in :func:`_bootstrap_kernel`)."""
    h1 = hist_t.astype(jnp.bfloat16)
    r1 = hist_t - h1.astype(jnp.float32)
    h2 = r1.astype(jnp.bfloat16)
    h3 = (r1 - h2.astype(jnp.float32)).astype(jnp.bfloat16)
    return h1, h2, h3


def _select_rows(h1, h2, h3, onehot):
    kw = dict(precision="bfloat16", preferred_element_type=jnp.float32)
    return (jnp.dot(h1, onehot, **kw) + jnp.dot(h2, onehot, **kw)
            + jnp.dot(h3, onehot, **kw))


def _bootstrap_kernel(
    seed_ref, hist_ref, out_ref, *, n_steps: int, t_len: int, p_restart: float,
    interpret: bool,
):
    a_pad, block = out_ref.shape
    t_pad = hist_ref.shape[1]
    uniform_grid = _make_uniform_grid(interpret, seed_ref, (8, block))

    hist_t = hist_ref[:]                        # (a_pad, t_pad), zero-padded
    # Exact selection at 3x single-pass cost: the TPU's f32 matmul default is
    # single-pass bf16 operands (4e-3 relative — would corrupt every selected
    # historical return), and requesting float32 precision costs 6 passes
    # because the compiler must split BOTH operands. The onehot operand is
    # bf16-EXACT (0.0/1.0), so a manual 3-term bf16 split of the history
    # alone reconstructs the full f32 value in 3 native bf16 passes:
    # h1+h2+h3 == hist to f32 rounding, and each h_i @ onehot is exact.
    h1, h2, h3 = _split3(hist_t)
    # Mosaic iota must be integer-typed; compare in i32, onehot in f32
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (t_pad, block), 0)
    t_f = jnp.float32(t_len)

    def advance(idx, u_restart, u_jump):
        # float index arithmetic: exact for t_len < 2^24
        jump = jnp.minimum(jnp.floor(u_jump * t_f), t_f - 1.0)
        nxt = idx + 1.0
        nxt = jnp.where(nxt >= t_f, nxt - t_f, nxt)          # circular wrap
        return jnp.where(u_restart < p_restart, jump, nxt)

    def one_step(idx, gross, u_restart, u_jump):
        idx = advance(idx, u_restart, u_jump)
        # select in f32, cast after: Mosaic rejects the i1 mask relayout that
        # a direct bf16-select would need (16-bit lane packing of the mask)
        onehot = jnp.where(row_iota == idx.astype(jnp.int32),
                           1.0, 0.0).astype(jnp.bfloat16)
        sel = (jnp.dot(h1, onehot, precision="bfloat16",
                       preferred_element_type=jnp.float32)
               + jnp.dot(h2, onehot, precision="bfloat16",
                         preferred_element_type=jnp.float32)
               + jnp.dot(h3, onehot, precision="bfloat16",
                         preferred_element_type=jnp.float32))
        return idx, gross * (1.0 + sel)

    # initial index: uniform start (rows 0/1 of a dedicated grid; row 0 unused
    # for symmetry with the per-step two-row consumption)
    g0 = uniform_grid(jnp.asarray(0, jnp.int32))
    idx0 = jnp.minimum(jnp.floor(g0[1:2, :] * t_f), t_f - 1.0)  # (1, block)

    n_major = n_steps // 4
    n_rem = n_steps % 4

    def body(i, carry):
        idx, gross = carry
        g = uniform_grid(i + 1)
        for j in range(4):
            idx, gross = one_step(idx, gross,
                                  g[2 * j:2 * j + 1, :], g[2 * j + 1:2 * j + 2, :])
        return idx, gross

    init = (idx0, jnp.ones((a_pad, block), jnp.float32))
    idx, gross = jax.lax.fori_loop(0, n_major, body, init)
    if n_rem:
        g = uniform_grid(jnp.asarray(n_major + 1, jnp.int32))
        for j in range(n_rem):
            idx, gross = one_step(idx, gross,
                                  g[2 * j:2 * j + 1, :], g[2 * j + 1:2 * j + 2, :])
    out_ref[:] = gross - 1.0


def _bootstrap_dd_kernel(
    seed_ref, hist_ref, w_ref, *rest, n_steps: int, t_len: int,
    p_restart: float, interpret: bool, hedged: bool = False,
):
    if hedged:
        s0_ref, ht_ref, hk_ref, hp_ref, hq_ref, term_ref, dd_ref = rest
    else:
        term_ref, dd_ref = rest
    w_pad, block = term_ref.shape
    a_pad, t_pad = hist_ref.shape
    uniform_grid = _make_uniform_grid(interpret, seed_ref, (8, block))

    h1, h2, h3 = _split3(hist_ref[:])
    w = w_ref[:]          # (w_pad, a_pad) candidate weights (zero rows on padding)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (t_pad, block), 0)
    t_f = jnp.float32(t_len)

    def score_dot(r):
        return jnp.dot(w, r, precision="float32",
                       preferred_element_type=jnp.float32)

    def advance(idx, u_restart, u_jump):
        jump = jnp.minimum(jnp.floor(u_jump * t_f), t_f - 1.0)
        nxt = idx + 1.0
        nxt = jnp.where(nxt >= t_f, nxt - t_f, nxt)          # circular wrap
        return jnp.where(u_restart < p_restart, jump, nxt)

    if hedged:
        from mcport.ops.pallas_multi_dd import make_hedged_returns

        hedged_returns = make_hedged_returns(ht_ref, hk_ref, hp_ref, hq_ref)
        s0 = s0_ref[:]                            # (a_pad, 1), padding 1.0

        def one_step(carry, u_restart, u_jump):
            idx, p, v, peak, dd = carry
            idx = advance(idx, u_restart, u_jump)
            onehot = jnp.where(row_iota == idx.astype(jnp.int32),
                               1.0, 0.0).astype(jnp.bfloat16)
            sel = _select_rows(h1, h2, h3, onehot)           # (a_pad, block)
            p_new = p * (1.0 + sel)
            f = 1.0 + score_dot(hedged_returns(p, p_new))    # (w_pad, block)
            v = v * f
            peak = jnp.maximum(peak, v)
            dd = jnp.minimum(dd, v / peak - 1.0)
            return idx, p_new, v, peak, dd
    else:
        def one_step(carry, u_restart, u_jump):
            idx, v, peak, dd = carry
            idx = advance(idx, u_restart, u_jump)
            onehot = jnp.where(row_iota == idx.astype(jnp.int32),
                               1.0, 0.0).astype(jnp.bfloat16)
            sel = _select_rows(h1, h2, h3, onehot)           # (a_pad, block)
            f = 1.0 + score_dot(sel)                         # (w_pad, block)
            v = v * f
            peak = jnp.maximum(peak, v)
            dd = jnp.minimum(dd, v / peak - 1.0)
            return idx, v, peak, dd

    # initial index: same grid addressing as the terminal kernel (row 1 of a
    # dedicated grid 0) so both kernels share the stream convention
    g0 = uniform_grid(jnp.asarray(0, jnp.int32))
    idx0 = jnp.minimum(jnp.floor(g0[1:2, :] * t_f), t_f - 1.0)  # (1, block)

    ones = jnp.ones((w_pad, block), jnp.float32)
    if hedged:
        init = (idx0, jnp.broadcast_to(s0, (a_pad, block)).astype(jnp.float32),
                ones, ones, jnp.zeros((w_pad, block), jnp.float32))
    else:
        init = (idx0, ones, ones, jnp.zeros((w_pad, block), jnp.float32))

    n_major = n_steps // 4
    n_rem = n_steps % 4

    def body(i, carry):
        g = uniform_grid(i + 1)
        for j in range(4):
            carry = one_step(carry, g[2 * j:2 * j + 1, :],
                             g[2 * j + 1:2 * j + 2, :])
        return carry

    carry = jax.lax.fori_loop(0, n_major, body, init)
    if n_rem:
        g = uniform_grid(jnp.asarray(n_major + 1, jnp.int32))
        for j in range(n_rem):
            carry = one_step(carry, g[2 * j:2 * j + 1, :],
                             g[2 * j + 1:2 * j + 2, :])
    *_, v, peak, dd = carry
    term_ref[:] = v - 1.0
    dd_ref[:] = dd


def pallas_bootstrap_path_stats(
    seed: Array,
    returns: Array,
    weights: Array,
    n_paths: int,
    n_steps: int,
    p_restart: float = 0.2,
    block: int = 1024,
    interpret: bool = False,
    hedge_args: tuple | None = None,
) -> tuple[Array, Array]:
    """(terminal returns (W, n_paths), max drawdowns (W, n_paths)) for W
    candidate portfolios over stationary-bootstrap paths.

    The bootstrap counterpart of
    :func:`mcport.ops.pallas_multi_dd.gbm_multi_portfolio_dd` and the fused
    form of :func:`mcport.models.bootstrap.bootstrap_path_stats` (same model,
    independent stream): one set of resampled paths evolves in VMEM — the
    one-hot MXU selection of :func:`pallas_bootstrap_terminal_returns`, same
    exact 3-term bf16 split — and W candidates compound the per-period
    rebalanced wealth ``V_{t+1} = V_t (1 + W r_t)`` via a (w_pad, a_pad) x
    (a_pad, block) scoring matmul per step, with running peak / max-drawdown
    carries per (candidate, path).

    ``hedge_args = (s0 (A,), type_id (A, L) int, strike (A, L), premium
    (A, L), qty (A, L))`` switches to HEDGED per-period settlement: the asset
    price path ``p_{t+1} = p_t (1 + r_t)`` settles every leg at intrinsic
    value each step (mcport.options.hedged semantics, app.py:164-193) —
    historical resampling composes with option hedging inside one kernel.
    Identity legs reduce to the plain mode.

    Stream addressing matches the terminal kernel (``seed + program_id`` per
    block, one (8, block) uniform grid per four steps); interpret mode swaps
    the Threefry bit source. W is padded to sublanes; candidate sets past
    ~256 are chunked outside the kernel (VMEM).
    """
    return _dd_call(seed, jnp.asarray(returns, jnp.float32),
                    jnp.asarray(weights, jnp.float32), n_paths, n_steps,
                    float(p_restart), block, interpret, hedge_args)


@functools.partial(
    jax.jit,
    static_argnames=("n_paths", "n_steps", "p_restart", "block", "interpret")
)
def _dd_call(
    seed, returns, weights, n_paths: int, n_steps: int, p_restart: float,
    block: int, interpret: bool, hedge_args,
):
    r = jnp.asarray(returns, jnp.float32)
    t_len, a = r.shape
    w = jnp.asarray(weights, jnp.float32)
    if w.ndim == 1:
        w = w[None, :]
    w_cnt = w.shape[0]
    max_w = 256
    if w_cnt > max_w:
        parts = [
            _dd_call(seed, r, w[i:i + max_w], n_paths, n_steps, p_restart,
                     block, interpret, hedge_args)
            for i in range(0, w_cnt, max_w)
        ]
        return (jnp.concatenate([p[0] for p in parts], axis=0),
                jnp.concatenate([p[1] for p in parts], axis=0))
    a_pad = max(8, _round_up(a, 8))
    t_pad = max(128, _round_up(t_len, 128))
    hist_t = jnp.zeros((a_pad, t_pad), jnp.float32).at[:a, :t_len].set(r.T)
    w_pad = max(8, _round_up(w_cnt, 8))
    w_p = jnp.zeros((w_pad, a_pad), jnp.float32).at[:w_cnt, :a].set(w)
    n_pad = _round_up(n_paths, block)
    grid = n_pad // block

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
        hedge_specs = [pl.BlockSpec((a_pad, 1), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM),
                       leg_spec(), leg_spec(), leg_spec(), leg_spec()]

    term, dd = pl.pallas_call(
        functools.partial(
            _bootstrap_dd_kernel, n_steps=n_steps, t_len=t_len,
            p_restart=p_restart, interpret=interpret, hedged=hedged,
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((a_pad, t_pad), lambda i: (0, 0),
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
    )(jnp.asarray(seed, jnp.int32).reshape(1), hist_t, w_p, *hedge_inputs)
    return term[:w_cnt, :n_paths], dd[:w_cnt, :n_paths]


@functools.partial(
    jax.jit,
    static_argnames=("n_paths", "n_steps", "p_restart", "block", "interpret")
)
def pallas_bootstrap_terminal_returns(
    seed: Array,
    returns: Array,
    n_paths: int,
    n_steps: int,
    p_restart: float = 0.2,
    block: int = 1024,
    interpret: bool = False,
) -> Array:
    """(n_paths, A) terminal simple returns of stationary-bootstrap paths —
    fused-kernel counterpart of
    :func:`mcport.models.bootstrap.bootstrap_terminal_returns` (same model,
    independent stream)."""
    r = jnp.asarray(returns, jnp.float32)
    t_len, a = r.shape
    a_pad = max(8, _round_up(a, 8))
    t_pad = max(128, _round_up(t_len, 128))
    hist_t = jnp.zeros((a_pad, t_pad), jnp.float32).at[:a, :t_len].set(r.T)
    n_pad = _round_up(n_paths, block)
    grid = n_pad // block

    out = pl.pallas_call(
        functools.partial(
            _bootstrap_kernel, n_steps=n_steps, t_len=t_len,
            p_restart=float(p_restart), interpret=interpret,
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((a_pad, t_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((a_pad, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((a_pad, n_pad), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), hist_t)
    return out[:a, :n_paths].T
