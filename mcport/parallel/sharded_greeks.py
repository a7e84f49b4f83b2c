"""Mesh-sharded pathwise Greeks: differentiate THROUGH shard_map.

The single-chip form (:mod:`mcport.engine.greeks`) differentiates the whole
simulation with ``jax.grad``; this module does the same over a device mesh.
Paths shard along the mesh axis (seed arithmetic, the house convention:
device d simulates its own counter-addressed stream ``seed + d·SEED_STRIDE``),
each device reduces its shard to the (n_local,) portfolio-return vector, and
one ``all_gather`` of those vectors (N floats total — KBs, not the (N, A)
terminal matrix) replicates the portfolio vector so the exact top-k tail
metrics are computed identically everywhere.

Autodiff composes with the collectives: the transpose of ``all_gather`` is a
slice-back of the cotangent to the local shard, and the transpose of a
replicated-in argument (weights, drift, vol scale, spots) is a ``psum`` of
per-device cotangents — XLA inserts both, so the reverse pass scales across
the mesh exactly like the forward simulation. The reference has neither
sensitivities nor parallelism of any kind (/root/reference/app.py:699-747).

Stream note: per-device lax streams (fold_in per step inside each device's
remat'd scan) — the same law as every sharded engine here, independent of the
single-chip stream; exact host replay is pinned in tests/test_greeks.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from mcport.engine.greeks import (
    HedgedSensitivities, PortfolioSensitivities, _metrics, _tail_k,
    _value_and_jac, pack_sensitivities, terminal_log_remat,
)
from mcport.seeding import SEED_STRIDE

__all__ = ["sharded_sensitivities"]


@partial(jax.jit, static_argnames=("n_local", "n_steps", "mesh", "axis", "k",
                                   "hedged", "antithetic", "t_df"))
def _sharded_grads(seed, w, mu, chol, vol_scale, s0, hedge_arrays,
                   n_local: int, n_steps: int, mesh: Mesh, axis: str,
                   k: int, hedged: bool, antithetic: bool, t_df):
    def local(seed, w, mu, vol_scale, s0, hedge_arrays):
        idx = jax.lax.axis_index(axis)
        key = jax.random.fold_in(
            jax.random.PRNGKey(0), seed + idx * SEED_STRIDE)
        term_log = terminal_log_remat(key, mu, vol_scale[:, None] * chol,
                                      n_local, n_steps,
                                      antithetic=antithetic, t_df=t_df)
        if hedged:
            from mcport.options.hedged import hedged_terminal_returns

            gross = hedged_terminal_returns(term_log, s0, *hedge_arrays)
        else:
            gross = jnp.expm1(term_log)
        port_local = gross @ w                       # (n_local,)
        port = jax.lax.all_gather(port_local, axis)  # (n_dev, n_local)
        return _metrics(port.reshape(-1), k)

    spec_in = (P(), P(), P(), P(), P(), P())
    # outputs are replicated by construction (metrics of the gathered vector)
    fn = shard_map(local, mesh=mesh, in_specs=spec_in, out_specs=P(),
                   check_vma=False)

    def metrics(w, mu, vol_scale, s0):
        return fn(seed, w, mu, vol_scale, s0, hedge_arrays)

    return _value_and_jac(metrics, w, mu, vol_scale, s0)


def sharded_sensitivities(
    seed: int,
    params,
    weights: np.ndarray,
    n_paths: int,
    n_steps: int,
    mesh: Mesh,
    alpha: float = 0.95,
    hedge=None,
    s0: np.ndarray | None = None,
    antithetic: bool = False,
    axis: str = "paths",
    t_df: float | None = None,
) -> PortfolioSensitivities | HedgedSensitivities:
    """Mesh form of :func:`mcport.engine.greeks.portfolio_sensitivities`.

    ``params`` is a :class:`mcport.models.gbm.GBMParams`; paths split evenly
    along ``axis`` (must divide ``n_paths``). Returns the same dataclasses —
    gradients of the exact global top-k metrics, reduced over every shard.
    """
    n_dev = mesh.shape[axis]
    if n_paths % n_dev:
        raise ValueError(f"n_paths={n_paths} not divisible by {n_dev} devices")
    w = jnp.asarray(weights, jnp.float32)
    mu = jnp.asarray(params.mean_step, jnp.float32)
    chol = jnp.asarray(params.chol_step, jnp.float32)
    a = int(mu.shape[-1])
    hedged = hedge is not None
    if hedged and s0 is None:
        raise ValueError("hedged sensitivities require s0 (asset spot prices)")
    s0_arr = (jnp.asarray(s0, jnp.float32) if s0 is not None
              else jnp.ones((a,), jnp.float32))
    hedge_arrays = hedge.arrays if hedged else ()
    vol_scale = jnp.ones((a,), jnp.float32)
    k = _tail_k(n_paths, alpha)

    vals, jac = _sharded_grads(
        jnp.asarray(seed, jnp.int32), w, mu, chol, vol_scale, s0_arr,
        hedge_arrays, n_paths // n_dev, n_steps, mesh, axis, k, hedged,
        antithetic, t_df)
    return pack_sensitivities(vals, jac, weights, alpha, n_paths, hedged)
