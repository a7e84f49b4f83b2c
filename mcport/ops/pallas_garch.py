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

__all__ = ["pallas_garch_terminal_returns"]


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


def pallas_garch_terminal_returns(
    seed: Array,
    params: CCCGarchParams,
    n_paths: int,
    n_steps: int,
    block: int = 1024,
    interpret: bool = False,
    prefetch: bool = True,
    unroll: int = 4,
) -> Array:
    """Terminal compounded simple returns (n_paths, A) under CCC-GARCH(1,1).

    ``unroll=4`` (default) manually unrolls 4 Box-Muller pairs per loop
    iteration — +29% over the round-2 prefetch default on the v5e
    (3.80 -> 4.91e9 path-steps/s, benchmarks/bench_unroll.py), same draw
    stream. ``prefetch`` applies only at unroll=1 (the round-2 pipelining
    lever, ~8-12%).
    """
    return _call(
        seed, params.mu, params.omega, params.alpha, params.beta,
        params.corr_chol, params.sigma2_0, params.eps2_0,
        n_paths, n_steps, block, interpret, prefetch, unroll,
    )
