"""Sharded path-risk and simulated-frontier on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcport.config import GBMConfig, SketchConfig
from mcport.engine.path_risk import run_path_risk
from mcport.models.gbm import GBMParams
from mcport.parallel import make_mesh
from mcport.parallel.sharded_engines import sharded_path_risk, sharded_simulated_frontier

A = 3
PARAMS = GBMParams(
    s0=np.ones(A) * 100,
    mean_step=np.array([0.002, 0.001, 0.0015]),
    chol_step=np.linalg.cholesky(0.0009 * (0.6 * np.eye(A) + 0.4)),
)
W = np.array([0.5, 0.3, 0.2], np.float32)
SK = SketchConfig(n_bins=2048)


@pytest.fixture(scope="module")
def mesh(eight_devices):
    return make_mesh(eight_devices)


def test_sharded_path_risk(mesh):
    r = sharded_path_risk(
        5, jnp.asarray(PARAMS.mean_step, jnp.float32),
        jnp.asarray(PARAMS.chol_step, jnp.float32), jnp.asarray(W),
        n_paths=16_384, n_steps=16, mesh=mesh, sketch=SK, axis="paths",
    )
    assert -1.0 <= r.dd_p95 <= r.dd_median <= 0.0
    assert r.cvar <= r.var
    assert r.n_paths == 16_384
    # statistically consistent with the single-chip engine on the same params
    single = run_path_risk(
        PARAMS, W, GBMConfig(n_paths=16_384, n_steps=16, path_block=4_096,
                             seed=9, use_pallas=False, dtype="float32"), SK,
    )
    assert abs(r.dd_median - single.dd_median) < 0.03
    assert abs(r.var - single.var) < 0.05


def test_sharded_simulated_frontier(mesh):
    w, metric = sharded_simulated_frontier(
        jax.random.key(0),
        jnp.asarray(PARAMS.mean_step, jnp.float32),
        jnp.asarray(PARAMS.chol_step, jnp.float32),
        jnp.zeros(A, jnp.float32), jnp.ones(A, jnp.float32),
        n_candidates=8_192, n_paths=2_048, n_steps=8, mesh=mesh,
        objective="cvar", axis="paths",
    )
    w, metric = np.asarray(w), float(metric)
    np.testing.assert_allclose(w.sum(), 1.0, atol=1e-5)
    assert np.isfinite(metric)
    # deterministic replay: rebuild every device's exact candidate stream and
    # terminal set, score locally, and confirm the all_gather'd winner
    import math

    from mcport.models.gbm import terminal_log_returns
    from mcport.ops.dirichlet import sample_constrained_weights

    k_path, k_w = jax.random.split(jax.random.key(0))
    term = np.asarray(terminal_log_returns(
        k_path, PARAMS.mean_step.astype(np.float32),
        PARAMS.chol_step.astype(np.float32), 2_048, 8, dtype=jnp.float32))
    gross = np.exp(term) - 1.0
    k_tail = math.ceil(0.05 * 2_048)
    best_m, best_w = -np.inf, None
    for idx in range(8):
        wd, valid = sample_constrained_weights(
            jax.random.fold_in(k_w, idx), 8_192 // 8,
            jnp.zeros(A, jnp.float32), jnp.ones(A, jnp.float32))
        wd = np.asarray(wd, np.float32)
        port = gross @ wd.T
        cvar = np.sort(port, axis=0)[:k_tail].mean(0)
        cvar = np.where(np.asarray(valid), cvar, -np.inf)
        i = int(np.argmax(cvar))
        if cvar[i] > best_m:
            best_m, best_w = float(cvar[i]), wd[i]
    assert metric == pytest.approx(best_m, rel=1e-4)
    np.testing.assert_allclose(w, best_w, atol=1e-5)


def test_indivisible_raises(mesh):
    with pytest.raises(ValueError):
        sharded_path_risk(
            0, jnp.asarray(PARAMS.mean_step, jnp.float32),
            jnp.asarray(PARAMS.chol_step, jnp.float32), jnp.asarray(W),
            n_paths=1_001, n_steps=4, mesh=mesh, sketch=SK,
        )


def test_sharded_bootstrap_risk(mesh):
    from mcport.models.bootstrap import bootstrap_risk
    from mcport.parallel.sharded_engines import sharded_bootstrap_risk

    rng = np.random.default_rng(45)
    hist = (rng.standard_t(5, (150, 3)) * 0.02 + 0.002).astype(np.float32)
    w = np.array([0.5, 0.3, 0.2], np.float32)
    out = sharded_bootstrap_risk(
        jax.random.key(0), hist, w, n_paths=32_768, n_steps=8, mesh=mesh,
    )
    v, c = float(out.var), float(out.cvar)
    assert c <= v and np.isfinite(c)
    assert float(out.hist.sum()) == 32_768
    # statistical agreement with the single-chip engine (different streams)
    single = bootstrap_risk(jax.random.key(0), hist, w, n_paths=32_768, n_steps=8)
    assert abs(float(out.port_mean) - float(single.port_mean)) < 0.02
    assert abs(v - float(single.var)) < 0.05


def test_sharded_bootstrap_indivisible_raises(mesh):
    from mcport.parallel.sharded_engines import sharded_bootstrap_risk

    hist = np.random.default_rng(46).normal(0, 0.02, (50, 2)).astype(np.float32)
    with pytest.raises(ValueError, match="divisible"):
        sharded_bootstrap_risk(jax.random.key(0), hist, np.array([0.5, 0.5]),
                               n_paths=1001, n_steps=2, mesh=mesh)


def test_sharded_frontier_2d_exact_vs_replay(eight_devices):
    """2-D (paths x cand) frontier: exact equality against a single-device
    replay of the identical per-shard streams and sketch math."""
    from mcport.models.gbm import terminal_log_returns
    from mcport.ops.dirichlet import sample_constrained_weights
    from mcport.ops.quantile import auto_sketch, histogram, sketch_var_cvar
    from mcport.parallel.mesh import make_mesh_2d
    from mcport.parallel.sharded_engines import sharded_simulated_frontier_2d

    mesh2 = make_mesh_2d(4, eight_devices)   # (paths=4, cand=2)
    a = 3
    mean = np.array([0.002, 0.001, 0.0015], np.float32)
    chol = np.linalg.cholesky(4e-4 * (0.5 * np.eye(a) + 0.5)).astype(np.float32)
    min_w = np.zeros(a, np.float32)
    max_w = np.full(a, 0.6, np.float32)
    n_paths, n_cand, steps = 4096, 512, 6
    key = jax.random.key(5)

    w_star, m_star = sharded_simulated_frontier_2d(
        key, mean, chol, min_w, max_w, n_cand, n_paths, steps, mesh2,
        risk_free=0.01, objective="cvar",
    )

    # single-device replay of the same streams
    sketch = auto_sketch(mean, chol, steps, n_bins=2048)
    k_path, k_w = jax.random.split(key)
    gross_parts = [
        np.asarray(jnp.exp(terminal_log_returns(
            jax.random.fold_in(k_path, p), mean, chol, n_paths // 4, steps,
            dtype=jnp.float32)) - 1.0)
        for p in range(4)
    ]
    gross = np.concatenate(gross_parts)      # the full global path set
    best_m, best_w = -np.inf, None
    for c in range(2):
        w, valid = sample_constrained_weights(
            jax.random.fold_in(k_w, c), n_cand // 2, min_w, max_w)
        w = np.asarray(w, np.float32)
        port = gross @ w.T                   # (n_paths, B_local)
        for j in range(w.shape[0]):
            if not bool(np.asarray(valid)[j]):
                continue
            counts = sum(histogram(part @ w[j], sketch) for part in gross_parts)
            _, cv = sketch_var_cvar(counts, 0.95, sketch)
            if float(cv) > best_m:
                best_m, best_w = float(cv), w[j]
    np.testing.assert_allclose(np.asarray(w_star), best_w, atol=1e-7)
    assert float(m_star) == pytest.approx(best_m, rel=1e-5)


def test_sharded_frontier_2d_guards(eight_devices):
    from mcport.parallel.mesh import make_mesh_2d
    from mcport.parallel.sharded_engines import sharded_simulated_frontier_2d

    mesh2 = make_mesh_2d(4, eight_devices)
    a = 2
    mean = np.zeros(a, np.float32)
    chol = np.eye(a, dtype=np.float32) * 0.02
    with pytest.raises(ValueError, match="n_paths"):
        sharded_simulated_frontier_2d(jax.random.key(0), mean, chol,
                                      np.zeros(a), np.ones(a), 64, 1001, 2, mesh2)
    with pytest.raises(ValueError, match="n_candidates"):
        sharded_simulated_frontier_2d(jax.random.key(0), mean, chol,
                                      np.zeros(a), np.ones(a), 63, 1024, 2, mesh2)


def test_sharded_drawdown_frontier_exact_vs_replay(mesh):
    """8-device candidate-sharded dd search == a single-chip replay that
    re-derives each device's candidate shard and scores it with the same lax
    scorer over the same path key — exact winner equality, not just in-law."""
    import math

    from mcport.engine.drawdown_frontier import _lax_multi_dd
    from mcport.ops.dirichlet import sample_constrained_weights
    from mcport.parallel.sharded_engines import sharded_drawdown_frontier

    key = jax.random.key(4)
    mean = jnp.asarray(PARAMS.mean_step, jnp.float32)
    chol = jnp.asarray(PARAMS.chol_step, jnp.float32)
    min_w, max_w = jnp.zeros(A), jnp.ones(A)
    n_cand, n_paths, n_steps, alpha, budget = 128, 2048, 12, 0.95, 0.20

    bw, bret, bdd, nfeas = sharded_drawdown_frontier(
        key, mean, chol, min_w, max_w, n_cand, n_paths, n_steps, mesh,
        dd_budget=budget, alpha=alpha, w_block=16, axis="paths",
    )

    # single-chip replay: same per-device candidate streams, same path key
    k_path, k_w = jax.random.split(key)
    n_local = n_cand // 8
    k_tail = max(1, math.ceil((1.0 - alpha) * n_paths))
    best = (-np.inf, None, None)
    total_feas = 0
    for idx in range(8):
        w, valid = sample_constrained_weights(
            jax.random.fold_in(k_w, idx), n_local, min_w, max_w)
        w = w.astype(jnp.float32)
        for s in range(0, n_local, 16):
            blk = w[s:s + 16]
            term, dd = _lax_multi_dd(k_path, mean, chol, blk, n_paths,
                                     n_steps, jnp.float32)
            ret = np.asarray(term.mean(axis=1))
            worst, _ = jax.lax.top_k(-dd, k_tail)
            dd95 = np.asarray(-worst[:, -1])
            feas = np.asarray(valid[s:s + 16]) & (dd95 >= -budget)
            total_feas += int(feas.sum())
            sc = np.where(feas, ret, -np.inf)
            j = int(np.argmax(sc))
            if sc[j] > best[0]:
                best = (sc[j], np.asarray(blk[j]), dd95[j])

    assert int(nfeas) == total_feas and total_feas > 0
    assert float(bret) == best[0]
    assert float(bdd) == best[2]
    np.testing.assert_array_equal(np.asarray(bw), best[1])


def test_sharded_drawdown_frontier_infeasible(mesh):
    from mcport.parallel.sharded_engines import sharded_drawdown_frontier

    bw, bret, bdd, nfeas = sharded_drawdown_frontier(
        jax.random.key(0), jnp.asarray(PARAMS.mean_step, jnp.float32),
        jnp.asarray(PARAMS.chol_step, jnp.float32), jnp.zeros(A), jnp.ones(A),
        64, 1024, 12, mesh, dd_budget=1e-4, w_block=8, axis="paths",
    )
    assert int(nfeas) == 0 and not np.isfinite(float(bret))


def test_sharded_garch_risk_exact_vs_replay(mesh):
    """8-device GARCH tail risk == merging 8 per-device single-chip slices
    (same counter-derived keys, same covering sketch) to within a bin width."""
    from mcport.config import COVERING_LOG1P_SKETCH as SKG
    from mcport.models.garch_mc import CCCGarchParams, garch_terminal_returns
    from mcport.ops.quantile import histogram, sketch_var_cvar
    from mcport.parallel.sharded_engines import SEED_STRIDE, sharded_garch_risk

    a = A
    corr = (0.6 * np.eye(a) + 0.4).astype(np.float32)
    gp = CCCGarchParams(
        mu=np.full(a, 5e-4, np.float32), omega=np.full(a, 1e-5, np.float32),
        alpha=np.full(a, 0.08, np.float32), beta=np.full(a, 0.9, np.float32),
        corr_chol=np.linalg.cholesky(corr).astype(np.float32),
        sigma2_0=np.full(a, 5e-4, np.float32), eps2_0=np.full(a, 5e-4, np.float32),
    )
    n_paths, n_steps, seed = 8192, 12, 11
    v, c, pm = sharded_garch_risk(seed, gp, W, n_paths, n_steps, mesh)
    assert c <= v

    hist = np.zeros(SKG.n_bins, np.float64)
    s = 0.0
    for idx in range(8):
        key = jax.random.fold_in(jax.random.PRNGKey(0),
                                 jnp.int32(seed + idx * SEED_STRIDE))
        term = garch_terminal_returns(key, gp, n_paths // 8, n_steps)
        port = term @ jnp.asarray(W, term.dtype)
        hist += np.asarray(histogram(port, SKG), np.float64)
        s += float(port.sum())
    v2, c2 = sketch_var_cvar(jnp.asarray(hist, jnp.float32), 0.95, SKG)
    # shard_map fusion can move a boundary path one ulp across a bin edge, so
    # equality holds to a bin width, not bitwise
    bin_w = (SKG.hi - SKG.lo) / SKG.n_bins
    assert abs(v - float(v2)) < 2 * bin_w
    assert abs(c - float(c2)) < 2 * bin_w
    np.testing.assert_allclose(pm, s / n_paths, rtol=1e-5)


def test_sharded_merton_risk_consistent(mesh):
    """Mesh Merton risk agrees with the single-chip engine within MC error
    and reports a sane jump fraction."""
    from mcport.models.jump import MertonParams, merton_risk
    from mcport.parallel.sharded_engines import sharded_merton_risk

    mp = MertonParams(
        diffusion=PARAMS,
        jump_rate=0.05,
        jump_mean=np.full(A, -0.04, np.float32),
        jump_vol=np.full(A, 0.06, np.float32),
    )
    v, c, pm, jf = sharded_merton_risk(3, mp, W, 16_384, 12, mesh)
    single = merton_risk(jax.random.key(0), mp, W, n_paths=16_384, n_steps=12)
    assert c <= v <= 0.5
    lam = 1.0 - np.exp(-0.05 * 12)
    assert abs(jf - lam) < 0.02
    assert abs(v - float(single.var)) < 0.02
    assert abs(pm - float(single.port_mean)) < 0.01


def test_sharded_importance_tail_consistent(mesh):
    """Mesh importance-sampled deep tail: tail-sample count scales with the
    tilt design (~n/2 beyond VaR) and VaR matches the single-chip engine."""
    from mcport.models.importance import importance_tail_risk
    from mcport.parallel.sharded_engines import sharded_importance_tail

    alpha, n = 0.999, 32_768
    v, c, n_tail = sharded_importance_tail(7, PARAMS, W, n, 12, mesh, alpha=alpha)
    single = importance_tail_risk(jax.random.key(1), PARAMS, W, alpha=alpha,
                                  n_paths=n, n_steps=12)
    assert c <= v < 0.0
    assert n_tail > n // 8          # far above the (1-alpha)*n = 33 of plain MC
    assert abs(v - float(single.var)) < 0.02


def test_sharded_dcc_risk_consistent(mesh):
    """Mesh DCC risk agrees with the single-chip engine within MC error."""
    from mcport.models.dcc import DCCGarchParams, dcc_risk
    from mcport.models.garch_mc import CCCGarchParams
    from mcport.parallel.sharded_engines import sharded_dcc_risk

    corr = (0.6 * np.eye(A) + 0.4)
    base = CCCGarchParams(
        mu=np.full(A, 5e-4), omega=np.full(A, 2e-6),
        alpha=np.full(A, 0.08), beta=np.full(A, 0.88),
        corr_chol=np.linalg.cholesky(corr),
        sigma2_0=np.full(A, 2e-4), eps2_0=np.full(A, 2e-4),
    )
    dp = DCCGarchParams(base=base, a_dcc=0.08, b_dcc=0.85, q0=corr,
                        e0=np.zeros(A))
    v, c, pm = sharded_dcc_risk(5, dp, W, 16_384, 12, mesh)
    sv, sc, spm = dcc_risk(jax.random.key(0), dp, W, n_paths=16_384, n_steps=12)
    assert c <= v < 0.0
    assert abs(v - sv) < 0.02 and abs(pm - spm) < 0.01


def test_sharded_cvar_attribution(mesh):
    """Mesh Euler attribution: components sum to the masked tail mean at the
    sketch threshold (exact identity), the threshold agrees with the sharded
    risk engine's convention, and the split orders by riskiness."""
    from mcport.parallel.sharded_engines import sharded_cvar_attribution

    mean = jnp.asarray(PARAMS.mean_step, jnp.float32)
    chol = jnp.asarray(PARAMS.chol_step, jnp.float32)
    v, cvar, comp, n_tail = sharded_cvar_attribution(
        5, mean, chol, jnp.asarray(W), 16_384, 12, mesh, sketch=SK)
    assert cvar <= v < 0.0
    np.testing.assert_allclose(comp.sum(), cvar, rtol=1e-10)
    assert comp.shape == (A,)
    # ~5% of paths in the tail (sketch threshold => approximate, not exact k)
    assert 0.03 * 16_384 < n_tail < 0.08 * 16_384
    # heaviest weight on the most volatile asset? W=(0.5,0.3,0.2) with equal
    # vols => contribution ordering follows weights
    assert comp[0] < comp[1] < comp[2] < 0.0


# ---- model-family sharded path risk (late round 3) -------------------------


def _fam_history():
    rng = np.random.default_rng(31)
    return (rng.standard_t(6, (160, A)) * 0.02 + 0.002).astype(np.float32)


def test_sharded_family_path_risk_replay_exact(mesh):
    """The sharded reduction equals a host-side replay of every device's
    exact stream (per-device fold_in(seed + idx*SEED_STRIDE)): histogram
    sums are integer-exact, scalar sums to float tolerance."""
    from mcport.engine.path_risk import DD_SKETCH
    from mcport.models.bootstrap import bootstrap_path_stats
    from mcport.models.garch_mc import estimate_ccc_garch, garch_path_stats
    from mcport.models.dcc import DCCGarchParams, dcc_path_stats
    from mcport.models.heston import HestonParams, heston_path_stats
    from mcport.models.jump import MertonParams, merton_path_stats
    from mcport.models.gbm import GBMParams
    from mcport.ops.quantile import histogram, sketch_quantile, sketch_var_cvar
    from mcport.parallel.sharded_engines import sharded_family_path_risk
    from mcport.seeding import SEED_STRIDE

    h = _fam_history()
    gp = estimate_ccc_garch(h)
    mp = MertonParams(
        diffusion=GBMParams(s0=np.ones(A) * 100,
                            mean_step=np.full(A, 1e-3),
                            chol_step=np.linalg.cholesky(
                                4e-4 * (0.5 * np.eye(A) + 0.5))),
        jump_rate=0.05, jump_mean=np.full(A, -0.1),
        jump_vol=np.full(A, 0.05))
    dcp = DCCGarchParams(base=gp, a_dcc=0.05, b_dcc=0.85,
                         q0=np.asarray(gp.corr_chol @ gp.corr_chol.T,
                                       np.float64),
                         e0=np.zeros(A))
    hsp = HestonParams(
        mu=np.full(A, 8e-4), kappa=np.full(A, 0.15), theta=np.full(A, 4e-4),
        xi=np.full(A, 3e-3), rho=np.full(A, -0.5), v0=np.full(A, 4e-4),
        corr_chol=np.linalg.cholesky(0.5 * np.eye(A) + 0.5),
        s0=np.ones(A) * 100)
    n_paths, steps, seed = 4_096, 8, 7
    n_local = n_paths // 8

    for model, params_, local_fn in (
        ("garch", gp, lambda k, w: garch_path_stats(k, gp, w, n_local, steps)),
        ("dcc", dcp,
         lambda k, w: dcc_path_stats(k, dcp, w, n_local, steps)),
        ("jump", mp,
         lambda k, w: merton_path_stats(
             k, np.float32(mp.diffusion.mean_step),
             np.float32(mp.diffusion.chol_step), mp.jump_rate,
             np.float32(mp.jump_mean), np.float32(mp.jump_vol), w,
             n_local, steps)),
        ("heston", hsp,
         lambda k, w: heston_path_stats(k, hsp, w, n_local, steps)),
        ("bootstrap", h,
         lambda k, w: bootstrap_path_stats(k, h, w, n_local, steps)),
    ):
        r = sharded_family_path_risk(seed, model, params_, W, n_paths, steps,
                                     mesh=mesh, sketch=SK)
        h_port = np.zeros(SK.n_bins, np.float64)
        h_dd = np.zeros(DD_SKETCH.n_bins, np.float64)
        s_port = 0.0
        for idx in range(8):
            key = jax.random.fold_in(
                jax.random.PRNGKey(0),
                jnp.int32(seed + idx * SEED_STRIDE))
            term, dd = local_fn(key, W[None, :])
            h_port += np.asarray(histogram(term[0], SK))
            h_dd += np.asarray(histogram(dd[0], DD_SKETCH))
            s_port += float(np.asarray(term[0], np.float64).sum())
        v, c = sketch_var_cvar(jnp.asarray(h_port, jnp.float32), 0.95, SK)
        assert r.var == pytest.approx(float(v), abs=1e-6), model
        assert r.cvar == pytest.approx(float(c), abs=1e-6), model
        assert r.port_mean == pytest.approx(s_port / n_paths, abs=1e-4), model
        dd_med = sketch_quantile(jnp.asarray(h_dd, jnp.float32), 0.5, DD_SKETCH)
        assert r.dd_median == pytest.approx(float(dd_med), abs=1e-6), model
        assert -1.0 <= r.dd_p95 <= r.dd_median <= 0.0


def test_sharded_family_path_risk_hedged_and_errors(mesh):
    from mcport.options import HedgeSpec, LegType, Legs
    from mcport.parallel.sharded_engines import sharded_family_path_risk

    h = _fam_history()
    s0 = np.array([100.0, 50.0, 20.0])
    names = ["X0", "X1", "X2"]
    prot = HedgeSpec.build(
        {i: Legs.from_rows([(LegType.BUY_ASSET, 0.0, 0.0, 1.0),
                            (LegType.BUY_PUT, float(s0[i]) * 0.98, 0.0, 1.0)])
         for i in range(A)}, names)
    base = sharded_family_path_risk(3, "bootstrap", h, W, 4_096, 13,
                                    mesh=mesh, sketch=SK)
    hedged = sharded_family_path_risk(3, "bootstrap", h, W, 4_096, 13,
                                      mesh=mesh, sketch=SK, hedge=prot, s0=s0)
    assert hedged.dd_mean > base.dd_mean
    with pytest.raises(ValueError, match="model must be"):
        sharded_family_path_risk(0, "nope", h, W, 4_096, 13, mesh=mesh)
    with pytest.raises(ValueError, match="s0"):
        sharded_family_path_risk(0, "garch", None, W, 4_096, 13, mesh=mesh,
                                 hedge=prot)
    with pytest.raises(ValueError, match="divisible"):
        sharded_family_path_risk(0, "bootstrap", h, W, 4_095, 13, mesh=mesh)


def test_sharded_family_drawdown_frontier_matches_single_chip(mesh):
    """Candidate-sharded family frontier: the winner equals a host-side
    replay (every device's candidate stream + the shared path stream), and
    the hedged/error paths work. The single-chip function samples a
    DIFFERENT candidate stream, so parity is via replay, not equality."""
    import jax

    from mcport.models.garch_mc import estimate_ccc_garch, garch_path_stats
    from mcport.ops.dirichlet import sample_constrained_weights
    from mcport.parallel.sharded_engines import sharded_family_drawdown_frontier

    h = _fam_history()
    gp = estimate_ccc_garch(h)
    key = jax.random.key(5)
    n_cand, n_paths, steps, budget = 128, 512, 13, 0.4
    w_out, ret, dd95, n_feas = sharded_family_drawdown_frontier(
        key, "garch", gp, np.zeros(A, np.float32), np.ones(A, np.float32),
        n_cand, n_paths, steps, mesh, dd_budget=budget, w_block=16,
        axis="paths")
    assert np.isfinite(float(ret))
    np.testing.assert_allclose(np.asarray(w_out).sum(), 1.0, atol=1e-5)

    # host replay: same per-device candidate fold + shared path key
    import math as _math

    k_path, k_w = jax.random.split(key)
    k_tail = max(1, _math.ceil(0.05 * n_paths))
    best_s, best_w, best_d = -np.inf, None, None
    feas_total = 0
    for idx in range(8):
        w, valid = sample_constrained_weights(
            jax.random.fold_in(k_w, idx), n_cand // 8,
            np.zeros(A, np.float32), np.ones(A, np.float32))
        term, dd = garch_path_stats(k_path, gp, np.asarray(w, np.float32),
                                    n_paths, steps)
        ret_l = np.asarray(term).mean(axis=1)
        dd95_l = -np.sort(-np.asarray(dd), axis=1)[:, k_tail - 1]
        feas = np.asarray(valid) & (dd95_l >= -budget)
        feas_total += int(feas.sum())
        score = np.where(feas, ret_l, -np.inf)
        j = int(np.argmax(score))
        if score[j] > best_s:
            best_s, best_w, best_d = score[j], np.asarray(w)[j], dd95_l[j]
    assert int(n_feas) == feas_total
    assert float(ret) == pytest.approx(best_s, abs=1e-6)
    np.testing.assert_allclose(np.asarray(w_out), best_w, atol=1e-6)

    with pytest.raises(ValueError, match="model must be"):
        sharded_family_drawdown_frontier(
            key, "nope", gp, np.zeros(A), np.ones(A), 128, 512, 13, mesh,
            axis="paths")


def test_sharded_family_frontier_2d_matches_host_replay(eight_devices):
    """2-D (paths x cand) family frontier: per-candidate dd sketches psum
    over paths; the winner equals a host replay that rebuilds every tile's
    exact streams and the same sketch quantiles."""
    import math

    import jax
    from jax.sharding import Mesh

    from mcport.config import SketchConfig
    from mcport.models.garch_mc import estimate_ccc_garch, garch_path_stats
    from mcport.ops.dirichlet import sample_constrained_weights
    from mcport.ops.quantile import histogram, sketch_quantile
    from mcport.parallel.sharded_engines import (
        sharded_family_drawdown_frontier_2d,
    )

    h = _fam_history()
    gp = estimate_ccc_garch(h)
    mesh2 = Mesh(np.array(eight_devices).reshape(4, 2), ("paths", "cand"))
    key = jax.random.key(9)
    n_cand, n_paths, steps, budget = 64, 1024, 8, 0.4
    dd_sk = SketchConfig(n_bins=512, lo=-1.0, hi=0.0)
    w_out, ret, dd95, n_feas = sharded_family_drawdown_frontier_2d(
        key, "garch", gp, np.zeros(A, np.float32), np.ones(A, np.float32),
        n_cand, n_paths, steps, mesh2, dd_budget=budget, w_block=16,
        dd_sketch=dd_sk)
    assert np.isfinite(float(ret))
    np.testing.assert_allclose(np.asarray(w_out).sum(), 1.0, atol=1e-5)

    # host replay: candidates per cand-shard, paths per paths-shard
    k_path0, k_w = jax.random.split(key)
    best_s, best_w = -np.inf, None
    feas_total = 0
    for c_idx in range(2):
        w, valid = sample_constrained_weights(
            jax.random.fold_in(k_w, c_idx), n_cand // 2,
            np.zeros(A, np.float32), np.ones(A, np.float32))
        w = np.asarray(w, np.float32)
        s1 = np.zeros(w.shape[0])
        counts = np.zeros((w.shape[0], dd_sk.n_bins))
        for p_idx in range(4):
            term, dd = garch_path_stats(
                jax.random.fold_in(k_path0, p_idx), gp, w, n_paths // 4,
                steps)
            s1 += np.asarray(term, np.float64).sum(axis=1)
            counts += np.asarray(
                jax.vmap(lambda row: histogram(row, dd_sk))(dd))
        ret_l = s1 / n_paths
        dd95_l = np.asarray(jax.vmap(
            lambda hh: sketch_quantile(jnp.asarray(hh, jnp.float32),
                                       0.05, dd_sk))(jnp.asarray(counts)))
        feas = np.asarray(valid) & (dd95_l >= -budget)
        feas_total += int(feas.sum())
        score = np.where(feas, ret_l, -np.inf)
        j = int(np.argmax(score))
        if score[j] > best_s:
            best_s, best_w = score[j], w[j]
    assert int(n_feas) == feas_total
    assert float(ret) == pytest.approx(best_s, abs=1e-5)
    np.testing.assert_allclose(np.asarray(w_out), best_w, atol=1e-6)


def test_sharded_family_frontier_2d_hedged_identity_and_jump(eight_devices):
    """2-D family frontier: identity hedge reproduces the plain winner on
    the same streams (settlement-layer wiring check), and the jump model
    runs through the 2-D tile path."""
    import jax
    from jax.sharding import Mesh

    from mcport.models.gbm import GBMParams
    from mcport.models.jump import MertonParams
    from mcport.options import HedgeSpec
    from mcport.parallel.sharded_engines import (
        sharded_family_drawdown_frontier_2d,
    )

    h = _fam_history()
    mesh2 = Mesh(np.array(eight_devices).reshape(4, 2), ("paths", "cand"))
    kw = dict(dd_budget=0.6, w_block=8)
    w0, r0, d0, n0 = sharded_family_drawdown_frontier_2d(
        jax.random.key(2), "bootstrap", h, np.zeros(A, np.float32),
        np.ones(A, np.float32), 32, 512, 8, mesh2, **kw)
    ident = HedgeSpec.build({}, [f"X{i}" for i in range(A)])
    w1, r1, d1, n1 = sharded_family_drawdown_frontier_2d(
        jax.random.key(2), "bootstrap", h, np.zeros(A, np.float32),
        np.ones(A, np.float32), 32, 512, 8, mesh2, hedge=ident,
        s0=np.ones(A), **kw)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w0), atol=1e-6)
    assert float(r1) == pytest.approx(float(r0), abs=5e-6)
    assert int(n1) == int(n0)

    mp = MertonParams(
        diffusion=GBMParams(s0=np.ones(A) * 100,
                            mean_step=np.full(A, 1e-3),
                            chol_step=np.linalg.cholesky(
                                4e-4 * (0.5 * np.eye(A) + 0.5))),
        jump_rate=0.05, jump_mean=np.full(A, -0.1),
        jump_vol=np.full(A, 0.05))
    wj, rj, dj, nj = sharded_family_drawdown_frontier_2d(
        jax.random.key(3), "jump", mp, np.zeros(A, np.float32),
        np.ones(A, np.float32), 32, 512, 8, mesh2, **kw)
    assert np.isfinite(float(rj)) and -1.0 <= float(dj) <= 0.0
    with pytest.raises(ValueError, match="model must be"):
        sharded_family_drawdown_frontier_2d(
            jax.random.key(0), "nope", h, np.zeros(A), np.ones(A),
            32, 512, 8, mesh2)


# ---- distributed Longstaff-Schwartz -----------------------------------------


def test_sharded_american_value_vs_single_and_oracle(mesh):
    """The psum'd-Gram global fit agrees with the single-chip LSMC (different
    streams, same estimand) and with the binomial lattice oracle."""
    from mcport.options.american import american_value
    from mcport.parallel.sharded_engines import sharded_american_value
    from tests.test_american import (R_STEP, SIG_STEP, STEPS, T_YEARS,
                                     binom_american)

    n = 32_768
    pol_m = sharded_american_value(7, [100.0], SIG_STEP, [100.0], mesh,
                                   is_put=True, rate_step=R_STEP, n_paths=n,
                                   n_steps=STEPS)
    pol_s = american_value(7, [100.0], SIG_STEP, [100.0], is_put=True,
                           rate_step=R_STEP, n_paths=n, n_steps=STEPS)
    tol = 4.0 * (pol_m.se[0] + pol_s.se[0])
    assert abs(pol_m.value[0] - pol_s.value[0]) < tol
    oracle = binom_american(100.0, 100.0, 0.30, 0.06, T_YEARS, put=True)
    assert oracle - pol_m.value[0] < 4.0 * pol_m.se[0] + 0.01 * oracle
    assert pol_m.value[0] - oracle < 4.0 * pol_m.se[0]
    # the replicated policy has the full shape + a sane put boundary
    assert pol_m.betas.shape == (1, STEPS - 1, 4)
    b = pol_m.boundary[0]
    assert np.isfinite(b).all() and (b < 100.0).all()
    # positive early-exercise premium survives distribution
    assert pol_m.early_premium[0] > 4.0 * pol_m.se[0]


def test_sharded_american_replay_and_call_law(mesh):
    from mcport.parallel.sharded_engines import sharded_american_value
    from tests.test_american import R_STEP, SIG_STEP, STEPS

    a = sharded_american_value(3, [100.0, 90.0], [SIG_STEP, SIG_STEP * 1.5],
                               [100.0, 95.0], mesh, is_put=[True, True],
                               rate_step=R_STEP, n_paths=16_384,
                               n_steps=STEPS)
    b = sharded_american_value(3, [100.0, 90.0], [SIG_STEP, SIG_STEP * 1.5],
                               [100.0, 95.0], mesh, is_put=[True, True],
                               rate_step=R_STEP, n_paths=16_384,
                               n_steps=STEPS)
    # deterministic replay: bitwise-identical values and policy
    assert np.array_equal(a.value, b.value)
    assert np.array_equal(a.betas, b.betas)
    # Merton: non-dividend American call = European (never exercised early)
    c = sharded_american_value(5, [100.0], SIG_STEP, [105.0], mesh,
                               is_put=False, rate_step=R_STEP,
                               n_paths=32_768, n_steps=STEPS)
    assert abs(c.value[0] - c.european[0]) < 4.0 * c.se[0]


def test_sharded_american_validation(mesh):
    from mcport.parallel.sharded_engines import sharded_american_value
    from tests.test_american import SIG_STEP

    with pytest.raises(ValueError, match="divisible"):
        sharded_american_value(0, [100.0], SIG_STEP, [100.0], mesh,
                               n_paths=1001, n_steps=4)
    with pytest.raises(ValueError, match="sigma"):
        sharded_american_value(0, [100.0], 0.0, [100.0], mesh,
                               n_paths=1024, n_steps=4)
