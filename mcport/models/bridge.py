"""Brownian-bridge path construction for quasi-Monte-Carlo GBM paths.

BASELINE.json:11 asks for "Sobol quasi-MC paths". Plain Sobol over the raw
(steps x assets) increment dimensions wastes the low-discrepancy structure: the
most uniform Sobol dimensions should carry the most variance. The Brownian
bridge fixes this — the first QMC dimension drives the terminal point, the next
ones recursive midpoints, so variance concentrates in the leading dimensions and
the effective dimension collapses (classic Caflisch/Morokoff/Owen construction).

Pipeline: Sobol/Halton uniforms (n, steps*A) → ndtri normals in *bridge order* →
per-asset standard Brownian bridge over integer times 0..T (a precomputed
bisection schedule applied in a ``lax.fori_loop``) → per-step increments →
Cholesky cross-asset correlation → GBM log paths. The bridge is linear, so
correlating increments after bridging equals bridging correlated increments.

Everything device-side is jit-compatible with a static schedule; the schedule is
tiny host-side NumPy (one pass over T nodes).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

__all__ = ["BridgeSchedule", "bridge_schedule", "brownian_bridge", "qmc_gbm_log_paths"]


@dataclass(frozen=True)
class BridgeSchedule:
    """Bisection order for a bridge over integer times 0..T.

    Node k sets ``W[t[k]] = a[k] W[l[k]] + b[k] W[r[k]] + c[k] z[k]``; the first
    node is the terminal (l = r = 0 with a = b = 0, c = sqrt(T)).
    """

    t: np.ndarray  # (T,) int32 — time index being set
    l: np.ndarray  # (T,) int32 — left anchor time (0 => W=0 origin)
    r: np.ndarray  # (T,) int32 — right anchor time
    a: np.ndarray  # (T,) f64 — left anchor weight
    b: np.ndarray  # (T,) f64 — right anchor weight
    c: np.ndarray  # (T,) f64 — innovation std

    @property
    def n_steps(self) -> int:
        return self.t.shape[0]


def bridge_schedule(n_steps: int) -> BridgeSchedule:
    """BFS bisection schedule for times 1..n_steps (any T, not just 2^k)."""
    if n_steps < 1:
        raise ValueError("n_steps must be >= 1")
    t, l, r, a, b, c = [], [], [], [], [], []
    # terminal node first: W[T] = sqrt(T) z0   (anchors at the origin)
    t.append(n_steps); l.append(0); r.append(0)
    a.append(0.0); b.append(0.0); c.append(float(np.sqrt(n_steps)))
    queue = [(0, n_steps)]
    while queue:
        lo, hi = queue.pop(0)
        mid = (lo + hi) // 2
        if mid == lo or mid == hi:
            continue
        span = hi - lo
        t.append(mid); l.append(lo); r.append(hi)
        a.append((hi - mid) / span)
        b.append((mid - lo) / span)
        c.append(float(np.sqrt((mid - lo) * (hi - mid) / span)))
        queue.append((lo, mid))
        queue.append((mid, hi))
    return BridgeSchedule(
        t=np.asarray(t, np.int32), l=np.asarray(l, np.int32), r=np.asarray(r, np.int32),
        a=np.asarray(a), b=np.asarray(b), c=np.asarray(c),
    )


@partial(jax.jit, static_argnames=("n_steps",))
def brownian_bridge(z: Array, n_steps: int) -> Array:
    """Standard Brownian motion W at integer times 1..T from bridge-ordered normals.

    z: (n, T, A) normals in bridge order (slot k feeds schedule node k).
    Returns W: (n, T, A) with W[t] ~ BM at time t+1 (origin excluded).
    """
    sched = bridge_schedule(n_steps)
    z = jnp.asarray(z)
    n, T, a_dim = z.shape
    w = jnp.zeros((n, T + 1, a_dim), z.dtype)  # slot 0 = origin (W=0)
    ts = jnp.asarray(sched.t)
    ls = jnp.asarray(sched.l)
    rs = jnp.asarray(sched.r)
    aa = jnp.asarray(sched.a, z.dtype)
    bb = jnp.asarray(sched.b, z.dtype)
    cc = jnp.asarray(sched.c, z.dtype)

    def body(k, w):
        val = (
            aa[k] * w[:, ls[k], :]
            + bb[k] * w[:, rs[k], :]
            + cc[k] * z[:, k, :]
        )
        return w.at[:, ts[k], :].set(val)

    w = jax.lax.fori_loop(0, T, body, w)
    return w[:, 1:, :]


def qmc_gbm_log_paths(
    mean_step: np.ndarray,
    chol_step: np.ndarray,
    n_paths: int,
    n_steps: int,
    method: str = "sobol",
    seed: int = 0,
    dtype=jnp.float32,
) -> Array:
    """Quasi-MC correlated GBM log paths (n_paths, n_steps, A).

    Low-discrepancy dims are ordered (bridge node, asset): the first A dims set
    every asset's terminal, the next A the midpoints, etc. The cross-asset
    Cholesky applies to the bridge *increments* (linearity of the bridge).
    """
    from mcport.models.qmc import qmc_normals

    mean_step = jnp.asarray(mean_step, dtype)
    lt = jnp.asarray(chol_step, dtype).T
    a = int(mean_step.shape[-1])
    z = qmc_normals(n_paths, n_steps * a, method, seed, dtype)
    z = z.reshape(n_paths, n_steps, a)           # bridge-ordered slots
    w = brownian_bridge(z, n_steps)              # (n, T, A) independent BMs
    origin = jnp.zeros((n_paths, 1, a), dtype)
    dw = jnp.diff(jnp.concatenate([origin, w], axis=1), axis=1)  # (n, T, A)
    increments = mean_step + dw @ lt
    return jnp.cumsum(increments, axis=1)
