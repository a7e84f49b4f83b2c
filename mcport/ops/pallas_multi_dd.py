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

from mcport.ops.pallas_gbm import _make_normal_pair, _round_up

__all__ = ["gbm_multi_portfolio_dd"]


def _multi_dd_kernel(
    seed_ref, m_ref, lt_ref, w_ref, term_ref, dd_ref, *, n_steps: int, interpret: bool
):
    w_pad, block = term_ref.shape
    a_pad = m_ref.shape[0]
    normal_pair = _make_normal_pair(interpret, seed_ref, (a_pad, block))

    m = m_ref[:]          # (a_pad, 1)
    lt = lt_ref[:]        # (a_pad, a_pad)
    w = w_ref[:]          # (w_pad, a_pad) candidate weights (zero rows on padding)

    def one_step(z, carry):
        acc, peak, dd = carry
        y = jnp.dot(lt, z, preferred_element_type=jnp.float32)
        acc = acc + m + y
        v = jnp.dot(w, jnp.exp(acc), preferred_element_type=jnp.float32)  # (w_pad, block)
        peak = jnp.maximum(peak, v)
        dd = jnp.minimum(dd, v / peak - 1.0)
        return acc, peak, dd

    def body(i, carry):
        z1, z2 = normal_pair(i)
        carry = one_step(z1, carry)
        carry = one_step(z2, carry)
        return carry

    init = (
        jnp.zeros((a_pad, block), jnp.float32),
        jnp.ones((w_pad, block), jnp.float32),   # V_0 = sum w = 1 (padded rows: 0-safe)
        jnp.zeros((w_pad, block), jnp.float32),
    )
    acc, peak, dd = jax.lax.fori_loop(0, n_steps // 2, body, init)
    if n_steps % 2 == 1:
        z1, _ = normal_pair(jnp.asarray(n_steps // 2, jnp.int32))
        acc, peak, dd = one_step(z1, (acc, peak, dd))

    term_ref[:] = jnp.dot(w, jnp.exp(acc), preferred_element_type=jnp.float32) - 1.0
    dd_ref[:] = dd


@functools.partial(
    jax.jit, static_argnames=("n_paths", "n_steps", "block", "interpret")
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
) -> tuple[Array, Array]:
    """(terminal returns (W, n_paths), max drawdowns (W, n_paths)) for W candidates.

    ``weights`` is (W, A); W is padded to sublanes internally — keep W <= ~256
    per call (VMEM) and chunk larger candidate sets outside.

    Padded-peak note: padded candidate rows have V_0 = 1 from init but V_t = 0
    afterwards, giving dd = -1 on padding; those rows are sliced away here.
    """
    m = jnp.asarray(mean_step, jnp.float32)
    chol = jnp.asarray(chol_step, jnp.float32)
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
                                   block, interpret)
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

    term, dd = pl.pallas_call(
        functools.partial(_multi_dd_kernel, n_steps=n_steps, interpret=interpret),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((a_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((a_pad, a_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w_pad, a_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
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
    )(jnp.asarray(seed, jnp.int32).reshape(1), m_p, lt_p, w_p)
    return term[:w_cnt, :n_paths], dd[:w_cnt, :n_paths]
