"""On-device streaming moments + fixed-grid quantile sketch.

Purpose (BASELINE.json:10): VaR/CVaR at 16M+ paths must reduce on device and across
chips without materializing all returns on one host. The reference's
``np.percentile`` (app.py:259) is exact but needs the full sample; here:

- :class:`MomentState` — count/sum/outer-product accumulators. Exact, mergeable by
  addition, so ``psum`` over a mesh gives exact global mean/cov.
- histogram sketch — fixed-bin counts over a configured return range. Mergeable by
  addition (psum-able); quantiles and tail means interpolate within a bin, so the
  worst-case quantile error is one bin width ((hi-lo)/n_bins; default 4/8192 ≈
  5e-4 in return units — far below Monte-Carlo noise at any practical path count).
  Out-of-range values clamp into the edge bins.

Both are pure jnp and work unchanged inside ``shard_map`` (see
:mod:`mcport.parallel.sharded_mc`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import Array

from mcport.config import SketchConfig

__all__ = [
    "MomentState",
    "init_moments",
    "update_moments",
    "merge_moments",
    "finalize_moments",
    "histogram",
    "sketch_quantile",
    "sketch_tail_mean",
    "sketch_var_cvar",
]


class MomentState(NamedTuple):
    """Streaming first/second moments of an (n, A) sample stream."""

    count: Array   # () float — number of samples seen
    sum: Array     # (A,)
    outer: Array   # (A, A) sum of x x'


def init_moments(n_assets: int, dtype=jnp.float32) -> MomentState:
    return MomentState(
        count=jnp.zeros((), dtype),
        sum=jnp.zeros((n_assets,), dtype),
        outer=jnp.zeros((n_assets, n_assets), dtype),
    )


def update_moments(state: MomentState, x: Array) -> MomentState:
    """Fold a (n, A) batch into the accumulator (one MXU x'x per batch)."""
    x = jnp.asarray(x, state.sum.dtype)
    return MomentState(
        count=state.count + x.shape[0],
        sum=state.sum + x.sum(axis=0),
        outer=state.outer + x.T @ x,
    )


def merge_moments(a: MomentState, b: MomentState) -> MomentState:
    """Associative merge — this is what ``psum`` applies across devices."""
    return MomentState(a.count + b.count, a.sum + b.sum, a.outer + b.outer)


def finalize_moments(state: MomentState, ddof: int = 1) -> tuple[Array, Array]:
    """(mean (A,), cov (A, A)) with the reference's ddof=1 (app.py:680)."""
    n = state.count
    mean = state.sum / n
    cov = (state.outer - n * jnp.outer(mean, mean)) / (n - ddof)
    return mean, cov


# ---- fixed-grid histogram sketch --------------------------------------------

def histogram(x: Array, config: SketchConfig = SketchConfig(), dtype=jnp.float32) -> Array:
    """Bin a sample batch into (n_bins,) counts; out-of-range clamps to edge bins."""
    x = jnp.asarray(x).reshape(-1)
    width = (config.hi - config.lo) / config.n_bins
    idx = jnp.clip(
        jnp.floor((x - config.lo) / width).astype(jnp.int32), 0, config.n_bins - 1
    )
    return jnp.zeros((config.n_bins,), dtype).at[idx].add(1.0)


def _edges(config: SketchConfig, dtype) -> tuple[Array, Array]:
    width = (config.hi - config.lo) / config.n_bins
    left = config.lo + width * jnp.arange(config.n_bins, dtype=dtype)
    return left, jnp.asarray(width, dtype)


def sketch_quantile(counts: Array, q: Array, config: SketchConfig = SketchConfig()) -> Array:
    """Quantile(s) from histogram counts with within-bin linear interpolation."""
    counts = jnp.asarray(counts)
    q = jnp.asarray(q, counts.dtype)
    total = counts.sum()
    cdf = jnp.cumsum(counts)
    target = q * total
    # first bin whose cumulative count reaches the target
    bin_idx = jnp.searchsorted(cdf, target, side="left")
    bin_idx = jnp.clip(bin_idx, 0, config.n_bins - 1)
    left, width = _edges(config, counts.dtype)
    below = jnp.where(bin_idx > 0, cdf[jnp.maximum(bin_idx - 1, 0)], 0.0)
    inbin = jnp.maximum(counts[bin_idx], 1.0)
    frac = jnp.clip((target - below) / inbin, 0.0, 1.0)
    return left[bin_idx] + frac * width


def sketch_tail_mean(counts: Array, thresh: Array, config: SketchConfig = SketchConfig()) -> Array:
    """Mean of samples <= thresh, from the histogram (bin-midpoint rule with a
    fractional boundary bin). Approximation error <= one bin width."""
    counts = jnp.asarray(counts)
    left, width = _edges(config, counts.dtype)
    mid = left + 0.5 * width
    # fraction of each bin below the threshold
    frac = jnp.clip((thresh - left) / width, 0.0, 1.0)
    tail_counts = counts * frac
    n_tail = tail_counts.sum()
    mean_tail = jnp.sum(tail_counts * mid) / jnp.maximum(n_tail, 1.0)
    return jnp.where(n_tail > 0, mean_tail, thresh)


def sketch_var_cvar(
    counts: Array, alpha: float = 0.95, config: SketchConfig = SketchConfig()
) -> tuple[Array, Array]:
    """Historical-VaR/CVaR semantics of app.py:258-263 on sketched counts:
    VaR = quantile(1 - alpha), CVaR = mean of the tail at or below VaR."""
    v = sketch_quantile(counts, 1.0 - alpha, config)
    c = sketch_tail_mean(counts, v, config)
    return v, c
