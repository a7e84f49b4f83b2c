"""Fused Pallas kernel for DCC-GARCH(1,1) path simulation.

The lax/XLA DCC engine (models/dcc.py) carries the per-path correlation state
as A(A+1)/2 triangle vectors through a ``lax.scan`` — correct, but its
unrolled-Cholesky step graph costs a multi-minute XLA compile and the scan
carry round-trips HBM every step (0.13e9 path-steps/s on the v5e; VERDICT r2
weak #1). This kernel keeps the WHOLE DCC state resident in VMEM per path
block and lets Mosaic compile the (static) unrolled factorization directly:

state per block:   sigma2, eps^2, e, diag(Q), cum   — (A_pad, block) each
                   Q as A column planes             — A x (A_pad, block)

per step:
    Q_t   = (1-a-b) S + a e e' + b Q_{t-1}           (plane-parallel FMAs)
    M     = chol(Q_t)     (column-slab Cholesky-Banachiewicz, VPU)
    e_t   = diag(Q_t)^{-1/2} (M z_t)                 (chol(R) = D^{-1/2} chol(Q))
    sigma2= omega + alpha eps^2 + beta sigma2        (univariate GARCH)
    cum  *= 1 + mu + sqrt(sigma2) e_t

The factorization works on Q DIRECTLY — ``chol(R) = D^{-1/2} chol(Q)`` for
``R = D^{-1/2} Q D^{-1/2}`` — so no per-entry normalization pass is needed.
Each Cholesky column is one (A_pad, block) slab chain (full sublane tiles),
not per-entry (1, block) rows: the column-j slab subtracts k<j rank-1 terms
``L[:,k] * L[j,k]`` and scales by rsqrt of its own diagonal row. Zero-padded
assets stay exactly zero through the recursion (their S columns, e rows and
Q planes are zero), so no masking of padded rows is needed beyond the
row >= j triangle mask.

Matches :func:`mcport.models.dcc.dcc_terminal_returns` in law (different RNG
stream); ``interpret=True`` swaps the Threefry bit source exactly like the
other kernels. Reference anchor: the reference app has no multivariate vol
model at all (/root/reference/app.py:347-350 fits GARCH only for forecast
bands); DCC is mcport's model-family extension.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcport.ops.pallas_gbm import _make_normal_pair, _round_up, paired_step_loop

__all__ = ["pallas_dcc_terminal_returns", "pallas_dcc_path_stats"]


def _dcc_kernel(
    seed_ref, mu_ref, om_ref, al_ref, be_ref, s_ref, ab_ref, q0_ref, d0_ref,
    e0_ref, s20_ref, e20_ref, out_ref, *, n_steps: int, n_assets: int,
    interpret: bool, prefetch: bool = False, unroll: int = 1,
):
    a_pad, block = out_ref.shape
    A = n_assets
    normal_pair = _make_normal_pair(interpret, seed_ref, (a_pad, block))

    mu = mu_ref[:]        # (a_pad, 1), zero padding
    om = om_ref[:]
    al = al_ref[:]
    be = be_ref[:]
    s = s_ref[:]          # (a_pad, a_pad) unconditional correlation S, zero padding
    a_c = ab_ref[0]
    b_c = ab_ref[1]
    c0 = 1.0 - a_c - b_c
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (a_pad, block), 0)

    def one_step(z, carry):
        s2, e2, e, diag, q, cum = carry
        # correlation state from LAST period's standardized shocks (Engle's
        # Q recursion); plane j is column j of the symmetric Q
        q = tuple(
            c0 * s[:, j:j + 1] + a_c * e * e[j:j + 1, :] + b_c * q[j]
            for j in range(A)
        )
        diag = c0 + a_c * e * e + b_c * diag          # rows i = Q_ii (S_ii = 1)

        # column-slab Cholesky of Q (not R): L[:, j] = slab_j * rsqrt(slab_j[j])
        ls = []
        for j in range(A):
            scol = q[j]
            for k in range(j):
                scol = scol - ls[k] * ls[k][j:j + 1, :]
            inv = jax.lax.rsqrt(jnp.maximum(scol[j:j + 1, :], 1e-12))
            ls.append(jnp.where(row_ids >= j, scol * inv, 0.0))

        # e_t = D^{-1/2} (chol(Q) z) ~ N(0, R_t)
        m = ls[0] * z[0:1, :]
        for j in range(1, A):
            m = m + ls[j] * z[j:j + 1, :]
        e_new = m * jax.lax.rsqrt(jnp.maximum(diag, 1e-12))

        s2 = om + al * e2 + be * s2
        eps = jnp.sqrt(jnp.maximum(s2, 0.0)) * e_new
        cum = cum * (1.0 + mu + eps)
        return s2, eps * eps, e_new, diag, q, cum

    bcast = lambda v: jnp.broadcast_to(v, (a_pad, block))
    init = (
        bcast(s20_ref[:]),
        bcast(e20_ref[:]),
        bcast(e0_ref[:]),
        bcast(d0_ref[:]),
        tuple(bcast(q0_ref[:, j:j + 1]) for j in range(A)),
        jnp.ones((a_pad, block), jnp.float32),
    )
    *_, cum = paired_step_loop(normal_pair, one_step, init, n_steps, prefetch,
                               unroll)
    out_ref[:] = cum - 1.0


def _dcc_dd_kernel(
    seed_ref, mu_ref, om_ref, al_ref, be_ref, s_ref, ab_ref, q0_ref, d0_ref,
    e0_ref, s20_ref, e20_ref, w_ref, *rest, n_steps: int, n_assets: int,
    interpret: bool, hedged: bool = False, unroll: int = 1,
):
    if hedged:
        ps0_ref, ht_ref, hk_ref, hp_ref, hq_ref, term_ref, dd_ref = rest
    else:
        term_ref, dd_ref = rest
    w_pad, block = term_ref.shape
    a_pad = mu_ref.shape[0]
    A = n_assets
    normal_pair = _make_normal_pair(interpret, seed_ref, (a_pad, block))

    mu = mu_ref[:]
    om = om_ref[:]
    al = al_ref[:]
    be = be_ref[:]
    s = s_ref[:]
    w = w_ref[:]          # (w_pad, a_pad) candidate weights (zero padding rows)
    a_c = ab_ref[0]
    b_c = ab_ref[1]
    c0 = 1.0 - a_c - b_c
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (a_pad, block), 0)

    def score_dot(r):
        return jnp.dot(w, r, precision="float32",
                       preferred_element_type=jnp.float32)

    if hedged:
        from mcport.ops.pallas_multi_dd import make_hedged_returns

        hedged_returns = make_hedged_returns(ht_ref, hk_ref, hp_ref, hq_ref)
        ps0 = ps0_ref[:]                          # (a_pad, 1), padding 1.0

    def asset_step(z, carry):
        """One DCC step of the ASSET state (shared with the terminal kernel's
        recursion): returns the per-period simple return matrix."""
        s2, e2, e, diag, q = carry
        q = tuple(
            c0 * s[:, j:j + 1] + a_c * e * e[j:j + 1, :] + b_c * q[j]
            for j in range(A)
        )
        diag = c0 + a_c * e * e + b_c * diag
        ls = []
        for j in range(A):
            scol = q[j]
            for k in range(j):
                scol = scol - ls[k] * ls[k][j:j + 1, :]
            inv = jax.lax.rsqrt(jnp.maximum(scol[j:j + 1, :], 1e-12))
            ls.append(jnp.where(row_ids >= j, scol * inv, 0.0))
        m = ls[0] * z[0:1, :]
        for j in range(1, A):
            m = m + ls[j] * z[j:j + 1, :]
        e_new = m * jax.lax.rsqrt(jnp.maximum(diag, 1e-12))
        s2 = om + al * e2 + be * s2
        eps = jnp.sqrt(jnp.maximum(s2, 0.0)) * e_new
        return (s2, eps * eps, e_new, diag, q), mu + eps

    bcast = lambda v: jnp.broadcast_to(v, (a_pad, block))
    asset0 = (
        bcast(s20_ref[:]),
        bcast(e20_ref[:]),
        bcast(e0_ref[:]),
        bcast(d0_ref[:]),
        tuple(bcast(q0_ref[:, j:j + 1]) for j in range(A)),
    )
    vpd0 = (
        jnp.ones((w_pad, block), jnp.float32),
        jnp.ones((w_pad, block), jnp.float32),
        jnp.zeros((w_pad, block), jnp.float32),
    )

    if hedged:
        def one_step(z, carry):
            asset, p, v, peak, dd = carry
            asset, r_t = asset_step(z, asset)
            p_new = p * (1.0 + r_t)
            f = 1.0 + score_dot(hedged_returns(p, p_new))
            v = v * f
            peak = jnp.maximum(peak, v)
            dd = jnp.minimum(dd, v / peak - 1.0)
            return asset, p_new, v, peak, dd

        init = (asset0, bcast(ps0).astype(jnp.float32), *vpd0)
        _, _, v, _, dd = paired_step_loop(normal_pair, one_step, init,
                                          n_steps, False, unroll)
    else:
        def one_step(z, carry):
            asset, v, peak, dd = carry
            asset, r_t = asset_step(z, asset)
            f = 1.0 + score_dot(r_t)
            v = v * f
            peak = jnp.maximum(peak, v)
            dd = jnp.minimum(dd, v / peak - 1.0)
            return asset, v, peak, dd

        init = (asset0, *vpd0)
        _, v, _, dd = paired_step_loop(normal_pair, one_step, init, n_steps,
                                       False, unroll)
    term_ref[:] = v - 1.0
    dd_ref[:] = dd


def pallas_dcc_path_stats(
    seed: Array,
    params,
    weights: Array,
    n_paths: int,
    n_steps: int,
    block: int = 512,
    interpret: bool = False,
    hedge_args: tuple | None = None,
    unroll: int = 2,
) -> tuple[Array, Array]:
    """(terminal returns (W, n_paths), max drawdowns (W, n_paths)) for W
    candidate portfolios under DCC-GARCH(1,1) paths — the dynamic-correlation
    member of the candidate path-stats kernel family (fused form of
    :func:`mcport.models.dcc.dcc_path_stats`; same model, independent
    stream).

    The full DCC state (sigma^2/eps^2/e/diag(Q) planes + A Q column planes)
    stays in VMEM while W candidates compound the per-period rebalanced
    wealth ``V_{t+1} = V_t (1 + W r_t)`` through one (w_pad, a_pad) x
    (a_pad, block) MXU matmul per step, with running peak/max-drawdown
    carries — drawdown-constrained candidate scoring under correlations
    that RISE in stress. ``hedge_args`` adds hedged per-period settlement
    of option legs against the simulated price path. W chunks at 256; the
    512 path block matches the terminal DCC kernel (Q planes dominate
    VMEM).
    """
    b = params.base
    import numpy as np

    s = np.asarray(b.corr_chol) @ np.asarray(b.corr_chol).T
    return _dd_call(
        seed, jnp.asarray(b.mu, jnp.float32),
        jnp.asarray(b.omega, jnp.float32),
        jnp.asarray(b.alpha, jnp.float32), jnp.asarray(b.beta, jnp.float32),
        jnp.asarray(s, jnp.float32),
        jnp.asarray(params.a_dcc, jnp.float32),
        jnp.asarray(params.b_dcc, jnp.float32),
        jnp.asarray(params.q0, jnp.float32),
        jnp.asarray(params.e0, jnp.float32),
        jnp.asarray(b.sigma2_0, jnp.float32),
        jnp.asarray(b.eps2_0, jnp.float32),
        jnp.asarray(weights, jnp.float32),
        n_paths, n_steps, block, interpret, hedge_args, unroll,
    )


@functools.partial(
    jax.jit, static_argnames=("n_paths", "n_steps", "block", "interpret",
                              "unroll")
)
def _dd_call(
    seed, mu, omega, alpha, beta, s, a_dcc, b_dcc, q0, e0, sigma2_0, eps2_0,
    weights, n_paths: int, n_steps: int, block: int, interpret: bool,
    hedge_args, unroll: int,
):
    w = jnp.asarray(weights, jnp.float32)
    if w.ndim == 1:
        w = w[None, :]
    w_cnt, a = w.shape
    max_w = 256
    if w_cnt > max_w:
        parts = [
            _dd_call(seed, mu, omega, alpha, beta, s, a_dcc, b_dcc, q0, e0,
                     sigma2_0, eps2_0, w[i:i + max_w], n_paths, n_steps,
                     block, interpret, hedge_args, unroll)
            for i in range(0, w_cnt, max_w)
        ]
        return (jnp.concatenate([p[0] for p in parts], axis=0),
                jnp.concatenate([p[1] for p in parts], axis=0))
    a_pad = max(8, _round_up(a, 8))
    w_pad = max(8, _round_up(w_cnt, 8))

    def col(x, fill=0.0):
        return jnp.full((a_pad, 1), fill, jnp.float32).at[:a, 0].set(
            jnp.asarray(x, jnp.float32))

    def mat(x):
        return jnp.zeros((a_pad, a_pad), jnp.float32).at[:a, :a].set(
            jnp.asarray(x, jnp.float32))

    w_p = jnp.zeros((w_pad, a_pad), jnp.float32).at[:w_cnt, :a].set(w)
    n_pad = _round_up(n_paths, block)
    grid = n_pad // block
    vec = lambda: pl.BlockSpec((a_pad, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
    sq = lambda: pl.BlockSpec((a_pad, a_pad), lambda i: (0, 0),
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

    q0j = jnp.asarray(q0, jnp.float32)
    term, dd = pl.pallas_call(
        functools.partial(_dcc_dd_kernel, n_steps=n_steps, n_assets=a,
                          interpret=interpret, hedged=hedged, unroll=unroll),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),     # seed
            vec(), vec(), vec(), vec(),                # mu/omega/alpha/beta
            sq(),                                      # S
            pl.BlockSpec(memory_space=pltpu.SMEM),     # (a_dcc, b_dcc)
            sq(),                                      # Q_0
            vec(), vec(), vec(), vec(),                # d0 / e0 / s2_0 / e2_0
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
        col(mu), col(omega), col(alpha), col(beta), mat(s),
        jnp.stack([jnp.asarray(a_dcc, jnp.float32),
                   jnp.asarray(b_dcc, jnp.float32)]),
        mat(q0),
        col(jnp.diagonal(q0j), fill=1.0), col(e0), col(sigma2_0),
        col(eps2_0), w_p, *hedge_inputs,
    )
    return term[:w_cnt, :n_paths], dd[:w_cnt, :n_paths]


@functools.partial(
    jax.jit, static_argnames=("n_paths", "n_steps", "block", "interpret",
                              "prefetch", "unroll")
)
def _call(
    seed, mu, omega, alpha, beta, s, a_dcc, b_dcc, q0, e0, sigma2_0, eps2_0,
    n_paths: int, n_steps: int, block: int, interpret: bool,
    prefetch: bool = False, unroll: int = 1,
):
    a = mu.shape[-1]
    a_pad = max(8, _round_up(a, 8))

    def col(x, fill=0.0):
        return jnp.full((a_pad, 1), fill, jnp.float32).at[:a, 0].set(
            jnp.asarray(x, jnp.float32))

    def mat(x):
        return jnp.zeros((a_pad, a_pad), jnp.float32).at[:a, :a].set(
            jnp.asarray(x, jnp.float32))

    n_pad = _round_up(n_paths, block)
    grid = n_pad // block
    vec = lambda: pl.BlockSpec((a_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    sq = lambda: pl.BlockSpec((a_pad, a_pad), lambda i: (0, 0), memory_space=pltpu.VMEM)

    q0j = jnp.asarray(q0, jnp.float32)
    out = pl.pallas_call(
        functools.partial(_dcc_kernel, n_steps=n_steps, n_assets=a,
                          interpret=interpret, prefetch=prefetch,
                          unroll=unroll),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),     # seed
            vec(), vec(), vec(), vec(),                # mu/omega/alpha/beta
            sq(),                                      # S
            pl.BlockSpec(memory_space=pltpu.SMEM),     # (a_dcc, b_dcc)
            sq(),                                      # Q_0
            # diag(Q_0) padded with 1 so rsqrt on padded rows is defined
            vec(), vec(), vec(), vec(),                # d0 / e0 / sigma2_0 / eps2_0
        ],
        out_specs=pl.BlockSpec((a_pad, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((a_pad, n_pad), jnp.float32),
        interpret=interpret,
    )(
        jnp.asarray(seed, jnp.int32).reshape(1),
        col(mu), col(omega), col(alpha), col(beta), mat(s),
        jnp.stack([jnp.asarray(a_dcc, jnp.float32),
                   jnp.asarray(b_dcc, jnp.float32)]),
        mat(q0),
        col(jnp.diagonal(q0j), fill=1.0), col(e0), col(sigma2_0), col(eps2_0),
    )
    return out[:a, :n_paths].T


def pallas_dcc_terminal_returns(
    seed: Array,
    params,
    n_paths: int,
    n_steps: int,
    block: int = 512,
    interpret: bool = False,
    prefetch: bool = True,
    unroll: int = 2,
) -> Array:
    """(n_paths, A) terminal compounded simple returns under DCC-GARCH(1,1).

    ``params`` is a :class:`mcport.models.dcc.DCCGarchParams`. Same law as
    :func:`mcport.models.dcc.dcc_terminal_returns` (independent stream).
    ``block`` defaults to 512: the Q planes cost A x (A_pad, block) VMEM, so
    the DCC block is half the GARCH kernel's. ``unroll=2`` (default) is the
    round-3 manual-unroll lever: 0.74 -> 0.81e9 path-steps/s on the v5e
    (bench_dcc.py --unroll); stream order unchanged.
    """
    b = params.base
    import numpy as np

    s = np.asarray(b.corr_chol) @ np.asarray(b.corr_chol).T
    return _call(
        seed, b.mu, b.omega, b.alpha, b.beta, s,
        params.a_dcc, params.b_dcc, params.q0, params.e0,
        b.sigma2_0, b.eps2_0, n_paths, n_steps, block, interpret, prefetch,
        unroll,
    )
