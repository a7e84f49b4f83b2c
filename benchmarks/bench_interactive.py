"""Interactive-scale historical search latency (VERDICT r2 item 7).

The reference's actual workload is 2,500 candidates x 4 sampled methods per
Streamlit rerun (app.py:681-682) — tiny compute where dispatch/transfer
round-trips dominate. Round 3 folds the sampled methods into ONE compiled
dispatch with a single host fetch (weight_search._fused_methods); this
script measures end-to-end warm wall (incl. host transfer of the full
candidate clouds) and reports candidates/s. Target: >=100k cands/s at the
10k-total scale.

    python benchmarks/bench_interactive.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax

    from mcport.engine.weight_search import run_all_methods

    rng = np.random.default_rng(0)
    a = 15
    rets = rng.normal(1e-3, 0.03, (365, a))
    mean_ann = rets.mean(0) * 52
    cov_ann = np.cov(rets, rowvar=False, ddof=1) * 52
    bounds = dict(min_weights=np.full(a, 0.01), max_weights=np.full(a, 0.6))
    methods = ("Monte Carlo", "VaR", "CVaR", "MPT", "Equal Weight")

    for n_port, tag in ((2_500, "reference rerun (2,500 x 4 = 10k)"),
                        (10_000, "10k x 4 = 40k"),
                        (25_000, "25k x 4 = 100k")):
        for label, kw in (("unconstrained", {}), ("constrained", bounds)):
            # warm (compile + cache)
            run_all_methods(jax.random.key(0), rets, mean_ann, cov_ann,
                            methods=methods, n_portfolios=n_port, **kw)
            best = float("inf")
            for s in range(3):
                t0 = time.perf_counter()
                run_all_methods(jax.random.key(s), rets, mean_ann, cov_ann,
                                methods=methods, n_portfolios=n_port, **kw)
                best = min(best, time.perf_counter() - t0)
            total = 4 * n_port
            print(f"  {tag:32s} {label:14s}: {best*1e3:7.1f} ms warm "
                  f"= {total/best/1e3:8.1f}k cands/s")


if __name__ == "__main__":
    main()
