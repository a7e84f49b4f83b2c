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

__all__ = ["pallas_bootstrap_terminal_returns"]


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
    h1 = hist_t.astype(jnp.bfloat16)
    r1 = hist_t - h1.astype(jnp.float32)
    h2 = r1.astype(jnp.bfloat16)
    h3 = (r1 - h2.astype(jnp.float32)).astype(jnp.bfloat16)
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
