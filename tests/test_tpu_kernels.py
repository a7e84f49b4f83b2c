"""Compiled-Pallas-kernel tests on real TPU hardware (VERDICT r1 item 9).

Run: ``MCPORT_TPU=1 python -m pytest tests/ -m tpu -q`` (auto-skipped elsewhere).

These exercise exactly what interpret mode cannot: ``pltpu.prng_random_bits``,
the exponent-trick uniform mapping (pallas_gbm._bits_to_unit), Mosaic lowering of
the fused loops, and padding at A=64/128. Everything reduces ON DEVICE and
fetches scalars — large device→host transfers through the axon tunnel take
minutes (CLAUDE.md) and must never appear in this tier.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.tpu


def _chol(a: int, rho: float = 0.4, scale: float = 0.02) -> np.ndarray:
    cov = scale**2 * ((1 - rho) * np.eye(a) + rho * np.ones((a, a)))
    return np.linalg.cholesky(cov)


@pytest.fixture(scope="module")
def kernels():
    from mcport.ops import pallas_gbm

    return pallas_gbm


def test_hardware_prng_normal_law(kernels):
    """Compiled PRNG → exponent-trick uniforms → Box-Muller must be N(0,1):
    with identity Cholesky and S steps, noise/sqrt(S) has unit normal moments."""
    a, n, steps = 8, 262_144, 16
    noise = kernels.gbm_terminal_noise(jnp.int32(3), np.eye(a, dtype=np.float32),
                                       n, steps)
    z = noise[:a] / np.sqrt(steps)            # (A, n) standardized on device
    mean = float(jnp.mean(z))
    var = float(jnp.mean(z * z))
    skew = float(jnp.mean(z**3))
    kurt = float(jnp.mean(z**4))
    m = a * n                                 # 2M samples
    assert abs(mean) < 5 / np.sqrt(m)
    assert abs(var - 1.0) < 8 / np.sqrt(m)
    assert abs(skew) < 12 / np.sqrt(m)
    assert abs(kurt - 3.0) < 40 / np.sqrt(m)


def test_hardware_prng_reproducible_and_distinct(kernels):
    a = 8
    x1 = kernels.gbm_terminal_noise(jnp.int32(7), _chol(a), 4096, 4)
    x2 = kernels.gbm_terminal_noise(jnp.int32(7), _chol(a), 4096, 4)
    x3 = kernels.gbm_terminal_noise(jnp.int32(8), _chol(a), 4096, 4)
    assert bool(jnp.array_equal(x1, x2))      # same seed → identical stream
    assert not bool(jnp.array_equal(x1, x3))  # different seed → different stream
    # per-block streams are independent: block columns must differ
    assert not bool(jnp.array_equal(x1[:, :1024], x1[:, 1024:2048]))


@pytest.mark.parametrize("a", [15, 64, 128])
def test_terminal_law_parity_vs_lax(kernels, a):
    """Compiled kernel vs the lax reference: same law (different streams) —
    empirical mean within MC error, empirical cov within MC error of S·LL'.
    Covers the sublane padding cases A=64 (exact tile) and A=128."""
    from mcport.models.gbm import terminal_log_returns

    steps, n = 8, 131_072
    mean_step = np.linspace(0.001, 0.003, a).astype(np.float32)
    chol = _chol(a).astype(np.float32)

    term_p = kernels.pallas_terminal_log_returns(jnp.int32(11), mean_step, chol,
                                                 n, steps)
    term_l = terminal_log_returns(jax.random.key(0), mean_step, chol, n, steps)

    def moments(x):
        mu = jnp.mean(x, axis=0)
        xc = x - mu
        cov = (xc.T @ xc) / (x.shape[0] - 1)
        return mu, cov

    mu_p, cov_p = moments(term_p)
    mu_l, cov_l = moments(term_l)
    cov_true = steps * (chol @ chol.T)
    sd = np.sqrt(np.diag(cov_true))
    tol_mu = 6 * sd.max() / np.sqrt(n)
    assert float(jnp.max(jnp.abs(mu_p - steps * mean_step))) < tol_mu
    assert float(jnp.max(jnp.abs(mu_l - steps * mean_step))) < tol_mu
    # cov entries: MC std err ~ sqrt((s_ii s_jj + s_ij^2)/n) <= ~2 max(s)/sqrt(n)
    tol_cov = 10 * cov_true.max() / np.sqrt(n)
    assert float(jnp.max(jnp.abs(cov_p - cov_true))) < tol_cov
    assert float(jnp.max(jnp.abs(cov_p - cov_l))) < 2 * tol_cov


def test_antithetic_mirror_exact(kernels):
    a, n, steps = 15, 8_192, 8
    mean_step = np.full(a, 0.002, np.float32)
    term = kernels.pallas_terminal_log_returns(jnp.int32(5), mean_step, _chol(a),
                                               n, steps, antithetic=True)
    half = n // 2
    drift = steps * mean_step
    mirror = term[:half] + term[half:]        # (drift+e) + (drift-e) = 2*drift
    err = float(jnp.max(jnp.abs(mirror - 2 * drift)))
    assert err < 1e-5


def test_path_stats_kernel_consistency(kernels):
    """Full path kernel: terminal law agrees with the hoisted terminal kernel;
    drawdown/terminal invariants hold for every path (checked on device)."""
    a, n, steps = 15, 65_536, 32
    mean_step = np.linspace(0.0005, 0.002, a).astype(np.float32)
    chol = _chol(a).astype(np.float32)
    w = np.full(a, 1.0 / a, np.float32)
    term, port, dd = kernels.gbm_path_stats(jnp.int32(13), mean_step, chol, w,
                                            n, steps)
    # invariants
    assert bool(jnp.all(dd <= 1e-7)) and bool(jnp.all(dd >= -1.0))
    assert bool(jnp.all(port > -1.0))
    # terminal return implied by terminal logs == the kernel's own port output
    port2 = (jnp.exp(term) * w).sum(axis=1) - 1.0
    assert float(jnp.max(jnp.abs(port2 - port))) < 1e-5
    # drawdown can never beat the terminal drawdown
    assert bool(jnp.all(dd <= jnp.maximum(port, 0.0) + 1e-6))
    # law: mean terminal log return within MC error
    mu = jnp.mean(term, axis=0)
    sd = np.sqrt(steps) * np.sqrt(np.diag(chol @ chol.T))
    assert float(jnp.max(jnp.abs(mu - steps * mean_step))) < 6 * sd.max() / np.sqrt(n)


def test_terminal_throughput_above_target(kernels):
    """BASELINE.json:5 — ≥1e9 correlated path-steps/s/chip (15 assets, 252 steps).
    Measured with the K-vs-2K difference protocol (tunnel-safe)."""
    from mcport.utils.profiling import diff_timed

    a, n, steps = 15, 1_048_576, 252
    mean_step = np.full(a, 0.0003, np.float32)
    chol = _chol(a).astype(np.float32)

    @jax.jit
    def one(seed):
        t = kernels.pallas_terminal_log_returns(seed, mean_step, chol, n, steps)
        return jnp.sum(t) * 1e-9

    def loop(k):
        s = jnp.int32(1)
        acc = jnp.float32(0)
        for i in range(k):
            # data-chain reps so the device cannot overlap/elide them
            acc = acc + one(s + jnp.int32(i)) + acc * 0
        return acc

    sec = diff_timed(loop, k=3)
    throughput = n * steps / sec
    print(f"\nterminal kernel: {throughput/1e9:.2f}e9 path-steps/s")
    # BASELINE target is 1e9; rounds 1/2 measured 3.9/7.5-8.7e9. Gate at 3e9 so a
    # regression to the EUP-transcendental path fails even under tunnel noise.
    assert throughput > 3.0e9


def test_bootstrap_kernel_compiled_law_and_throughput():
    """Compiled bootstrap kernel: hardware-PRNG index streams produce the right
    law (iid moments vs analytic) and beat the gather-bound lax engine."""
    from mcport.models.bootstrap import bootstrap_terminal_returns
    from mcport.ops.pallas_bootstrap import pallas_bootstrap_terminal_returns
    from mcport.utils.profiling import diff_timed

    t_len, a = 360, 15
    rng = np.random.default_rng(0)
    hist = (rng.standard_t(5, (t_len, a)) * 0.02 + 0.002).astype(np.float32)
    n, steps = 262_144, 12

    term = pallas_bootstrap_terminal_returns(jnp.int32(3), hist, n, steps,
                                             p_restart=1.0)
    mu_row = hist.astype(np.float64).mean(axis=0)
    want = (1 + mu_row) ** steps - 1
    got = jnp.mean(term, axis=0)
    se = jnp.std(term, axis=0, ddof=1) / np.sqrt(n)
    assert bool(jnp.all(jnp.abs(got - want) < 6 * se))

    # same seed bit-identical, different seed different
    t2 = pallas_bootstrap_terminal_returns(jnp.int32(3), hist, n, steps,
                                           p_restart=1.0)
    t3 = pallas_bootstrap_terminal_returns(jnp.int32(4), hist, n, steps,
                                           p_restart=1.0)
    assert bool(jnp.array_equal(term, t2)) and not bool(jnp.array_equal(term, t3))

    # throughput: must comfortably beat the lax gather engine
    big_n, big_s = 1_048_576, 52

    @jax.jit
    def one(seed):
        t = pallas_bootstrap_terminal_returns(seed, hist, big_n, big_s)
        return jnp.sum(t) * 1e-9

    def loop(k):
        acc = jnp.float32(0)
        s = jnp.int32(1)
        for i in range(k):
            acc = acc + one(s + jnp.int32(i) + (acc * 0).astype(jnp.int32))
        return acc

    sec = diff_timed(loop, k=4)
    tput = big_n * big_s / sec
    print(f"\nbootstrap kernel: {tput/1e9:.2f}e9 path-steps/s")
    assert tput > 1.0e9  # lax engine measured 0.24e9 on this chip


def test_rebalanced_path_stats_compiled(kernels):
    """Rebalance mode compiled on hardware: invariants + single-asset
    equivalence of the two portfolio conventions."""
    a, n, steps = 15, 65_536, 32
    mean_step = np.linspace(0.0005, 0.002, a).astype(np.float32)
    chol = _chol(a).astype(np.float32)
    w = np.full(a, 1.0 / a, np.float32)
    _, port, dd = kernels.gbm_path_stats(jnp.int32(13), mean_step, chol, w,
                                         n, steps, rebalance=True)
    assert bool(jnp.all(dd <= 1e-6)) and bool(jnp.all(dd >= -1.0))
    assert bool(jnp.all(port > -1.0))
    # law: rebalanced wealth is prod of w'exp(x_t); E[log V_T] within MC error
    # of steps * log E-ish bounds — keep it loose, the oracle lives in CI
    assert abs(float(jnp.mean(port))) < 1.0

    w_single = np.zeros(a, np.float32)
    w_single[0] = 1.0
    _, p_bh, _ = kernels.gbm_path_stats(jnp.int32(5), mean_step, chol, w_single,
                                        8_192, 8)
    _, p_rb, _ = kernels.gbm_path_stats(jnp.int32(5), mean_step, chol, w_single,
                                        8_192, 8, rebalance=True)
    assert float(jnp.max(jnp.abs(p_rb - p_bh))) < 5e-5


def test_t_kernel_compiled_law(kernels):
    """Compiled polar-t mode: covariance and fat-tail signature on hardware."""
    a, n, steps, df = 15, 262_144, 8, 5.5
    mean_step = np.full(a, 1e-3, np.float32)
    chol = _chol(a).astype(np.float32)
    term = kernels.pallas_terminal_log_returns(jnp.int32(3), mean_step, chol,
                                               n, steps, t_df=df)
    cov_true = steps * (chol @ chol.T)
    emp = jnp.cov(term.T)
    assert float(jnp.max(jnp.abs(emp / cov_true - 1))) < 0.05
    z = (term - jnp.mean(term, axis=0)) / jnp.std(term, axis=0)
    kurt = float(jnp.mean(z**4))
    # 8-step sums of t(5.5) draws: excess kurtosis 6/(df-4)/steps ≈ 0.5 → ~3.4
    assert 3.1 < kurt < 4.0


def test_prefetch_compiled_bit_identical(kernels):
    """Hardware-PRNG draw-ahead pipeline: prefetch=True must be bit-identical
    to prefetch=False on the REAL stateful PRNG stream (interpret-mode CPU
    equality does not cover this), across all three pipelined kernels."""
    from mcport.models.garch_mc import CCCGarchParams
    from mcport.ops.pallas_garch import pallas_garch_terminal_returns
    from mcport.ops.pallas_multi_dd import gbm_multi_portfolio_dd

    a, n = 15, 65_536
    mean_step = np.linspace(0.0005, 0.002, a).astype(np.float32)
    chol = _chol(a).astype(np.float32)
    w = np.full(a, 1.0 / a, np.float32)
    cand = np.random.default_rng(0).dirichlet(np.ones(a), 64).astype(np.float32)
    corr = ((1 - 0.4) * np.eye(a) + 0.4).astype(np.float64)
    gp = CCCGarchParams(
        mu=np.full(a, 5e-4, np.float32), omega=np.full(a, 1e-5, np.float32),
        alpha=np.full(a, 0.08, np.float32), beta=np.full(a, 0.9, np.float32),
        corr_chol=np.linalg.cholesky(corr).astype(np.float32),
        sigma2_0=np.full(a, 5e-4, np.float32), eps2_0=np.full(a, 5e-4, np.float32),
    )
    for steps in (31, 32):
        base = kernels.gbm_path_stats(jnp.int32(3), mean_step, chol, w, n,
                                      steps, prefetch=False)
        pipe = kernels.gbm_path_stats(jnp.int32(3), mean_step, chol, w, n,
                                      steps, prefetch=True)
        for x, y in zip(base, pipe):
            assert bool(jnp.array_equal(x, y))
        b = gbm_multi_portfolio_dd(jnp.int32(3), mean_step, chol, cand, n,
                                   steps, prefetch=False)
        p = gbm_multi_portfolio_dd(jnp.int32(3), mean_step, chol, cand, n,
                                   steps, prefetch=True)
        assert bool(jnp.array_equal(b[0], p[0])) and bool(jnp.array_equal(b[1], p[1]))
        gb = pallas_garch_terminal_returns(jnp.int32(3), gp, n, steps,
                                           prefetch=False)
        gpipe = pallas_garch_terminal_returns(jnp.int32(3), gp, n, steps,
                                              prefetch=True)
        assert bool(jnp.array_equal(gb, gpipe))


def test_multi_dd_bf16_and_rebalance_compiled():
    """Compiled bf16 screening: terminal bit-exact, dd within the bf16 bound;
    compiled rebalance mode matches the single-portfolio kernel at W=1."""
    from mcport.ops.pallas_gbm import gbm_path_stats
    from mcport.ops.pallas_multi_dd import gbm_multi_portfolio_dd

    a, n, steps = 15, 65_536, 32
    mean_step = np.linspace(0.0005, 0.002, a).astype(np.float32)
    chol = _chol(a).astype(np.float32)
    cand = np.random.default_rng(1).dirichlet(np.ones(a), 64).astype(np.float32)

    f32 = gbm_multi_portfolio_dd(jnp.int32(7), mean_step, chol, cand, n, steps)
    b16 = gbm_multi_portfolio_dd(jnp.int32(7), mean_step, chol, cand, n, steps,
                                 score_dtype="bfloat16")
    assert bool(jnp.array_equal(f32[0], b16[0]))
    from mcport.ops.pallas_multi_dd import BF16_DD_ERR_BOUND
    assert float(jnp.max(jnp.abs(f32[1] - b16[1]))) < BF16_DD_ERR_BOUND
    t32 = gbm_multi_portfolio_dd(jnp.int32(7), mean_step, chol, cand, n, steps,
                                 score_dtype="tensorfloat32")
    assert bool(jnp.array_equal(f32[0], t32[0]))
    assert float(jnp.max(jnp.abs(f32[1] - t32[1]))) < 3e-4

    w1 = cand[:1]
    term_m, dd_m = gbm_multi_portfolio_dd(jnp.int32(9), mean_step, chol, w1,
                                          8_192, 16, rebalance=True)
    _, port_s, dd_s = gbm_path_stats(jnp.int32(9), mean_step, chol, w1[0],
                                     8_192, 16, rebalance=True)
    assert float(jnp.max(jnp.abs(term_m[0] - port_s))) < 1e-5
    assert float(jnp.max(jnp.abs(dd_m[0] - dd_s))) < 1e-5


def test_bootstrap_onehot_selection_exact_compiled():
    """The one-hot selection matmul must reproduce historical values EXACTLY
    on hardware (f32 multi-pass vs the chip's bf16-operand default — a bf16
    hist would compound to ~3e-3 terminal error on this construction)."""
    from mcport.ops.pallas_bootstrap import pallas_bootstrap_terminal_returns

    a, t_len, steps, n = 15, 128, 52, 8_192
    c = 0.0123  # NOT bf16-representable: truncation would shift (1+c)^52
    hist = np.full((t_len, a), c, np.float32)
    term = pallas_bootstrap_terminal_returns(jnp.int32(3), hist, n, steps)
    want = float(np.float64(1.0 + np.float32(c)) ** steps - 1.0)
    err = float(jnp.max(jnp.abs(term - want)))
    assert err < 5e-6, f"selection not exact: max err {err}"


def test_bootstrap_risk_keyed_runs_differ_on_kernel_path():
    """Distinct keys must give distinct kernel-path results (the pre-fix
    default seed=0 made every keyed TPU run bit-identical)."""
    from mcport.models.bootstrap import bootstrap_risk

    rng = np.random.default_rng(0)
    hist = (rng.standard_normal((128, 6)) * 0.02 + 0.001).astype(np.float32)
    w = np.full(6, 1 / 6, np.float32)
    r1 = bootstrap_risk(jax.random.key(1), hist, w, n_paths=8_192, n_steps=8)
    r2 = bootstrap_risk(jax.random.key(2), hist, w, n_paths=8_192, n_steps=8)
    r1b = bootstrap_risk(jax.random.key(1), hist, w, n_paths=8_192, n_steps=8)
    assert float(r1.port_mean) != float(r2.port_mean)
    assert float(r1.port_mean) == float(r1b.port_mean)   # still deterministic
    # explicit seed pins streams regardless of key
    p1 = bootstrap_risk(jax.random.key(1), hist, w, n_paths=8_192, n_steps=8, seed=7)
    p2 = bootstrap_risk(jax.random.key(2), hist, w, n_paths=8_192, n_steps=8, seed=7)
    assert float(p1.port_mean) == float(p2.port_mean)


def test_dcc_kernel_compiled_law():
    """Round 3: the fused DCC kernel on hardware PRNG — law vs the lax
    triangle scan (same params, independent streams), on-device reductions
    only."""
    from mcport.models.dcc import DCCGarchParams, dcc_terminal_returns
    from mcport.models.garch_mc import CCCGarchParams
    from mcport.ops.pallas_dcc import pallas_dcc_terminal_returns

    a = 4
    corr = 0.4 * np.eye(a) + 0.6
    sig0 = np.full(a, 4e-4)
    base = CCCGarchParams(
        mu=np.full(a, 1e-3), omega=sig0 * 0.1, alpha=np.full(a, 0.08),
        beta=np.full(a, 0.9), corr_chol=np.linalg.cholesky(corr),
        sigma2_0=sig0, eps2_0=sig0)
    p = DCCGarchParams(base=base, a_dcc=0.06, b_dcc=0.88, q0=corr,
                       e0=np.zeros(a))
    n, steps = 65_536, 26
    got = pallas_dcc_terminal_returns(7, p, n, steps)
    ref = dcc_terminal_returns(jax.random.key(7), p, n, steps,
                               use_pallas=False)
    g_mean = np.asarray(jax.device_get(got.mean(0)))
    g_std = np.asarray(jax.device_get(got.std(0)))
    r_mean = np.asarray(jax.device_get(ref.mean(0)))
    r_std = np.asarray(jax.device_get(ref.std(0)))
    se = r_std / np.sqrt(n)
    np.testing.assert_allclose(g_mean, r_mean, atol=float(6 * se.max()))
    np.testing.assert_allclose(g_std, r_std, rtol=0.05)
    # cross-asset correlation carried through the dynamic Q state
    gc = float(jax.device_get(jnp.corrcoef(got.T)[0, 1]))
    rc = float(jax.device_get(jnp.corrcoef(ref.T)[0, 1]))
    assert abs(gc - rc) < 0.05


def test_dcc_layouts_agree_compiled():
    """Round 4: the pack layout (terminal default, 2.2x) vs the tile layout
    on hardware — same law, independent streams; and tri==full bitwise."""
    from mcport.models.dcc import DCCGarchParams
    from mcport.models.garch_mc import CCCGarchParams
    from mcport.ops.pallas_dcc import pallas_dcc_terminal_returns

    a = 15
    rng = np.random.default_rng(0)
    corr = 0.5 * np.eye(a) + 0.5
    sig0 = np.full(a, 4e-4)
    base = CCCGarchParams(
        mu=rng.normal(1e-3, 5e-4, a), omega=sig0 * 0.1,
        alpha=np.full(a, 0.08), beta=np.full(a, 0.9),
        corr_chol=np.linalg.cholesky(corr), sigma2_0=sig0, eps2_0=sig0)
    p = DCCGarchParams(base=base, a_dcc=0.05, b_dcc=0.9, q0=corr,
                       e0=np.zeros(a))
    n, steps = 262_144, 26
    pack = pallas_dcc_terminal_returns(7, p, n, steps, layout="pack")
    tile = pallas_dcc_terminal_returns(7, p, n, steps, layout="tile")
    for gm, tm in ((pack.mean(0), tile.mean(0)), (pack.std(0), tile.std(0))):
        np.testing.assert_allclose(np.asarray(jax.device_get(gm)),
                                   np.asarray(jax.device_get(tm)), rtol=0.06,
                                   atol=3e-4)
    pc = float(jax.device_get(jnp.corrcoef(pack.T)[0, 1]))
    tc = float(jax.device_get(jnp.corrcoef(tile.T)[0, 1]))
    assert abs(pc - tc) < 0.04
    # tri drops whole sublane tiles but consumed lanes run identical ops
    full = pallas_dcc_terminal_returns(3, p, 4_096, 13, layout="tile",
                                       tri=False)
    tri = pallas_dcc_terminal_returns(3, p, 4_096, 13, layout="tile",
                                      tri=True)
    assert bool(jax.device_get(jnp.array_equal(full, tri)))


def test_hedged_multi_dd_compiled():
    """Round 3: hedged per-period settlement on hardware — identity hedge
    tracks rebalance mode; protective puts lift every drawdown."""
    from mcport.ops.pallas_multi_dd import gbm_multi_portfolio_dd

    a = 4
    mean = np.full(a, 1e-3, np.float32)
    chol = _chol(a).astype(np.float32)
    s0 = np.array([100.0, 50.0, 20.0, 8.0], np.float32)
    cand = np.random.default_rng(3).dirichlet(np.ones(a), 16).astype(np.float32)
    ident = (np.ones(a, np.float32),
             np.zeros((a, 1), np.int32), np.zeros((a, 1), np.float32),
             np.zeros((a, 1), np.float32), np.ones((a, 1), np.float32))
    t_h, d_h = gbm_multi_portfolio_dd(9, mean, chol, cand, 16_384, 13,
                                      hedge_args=ident)
    t_r, d_r = gbm_multi_portfolio_dd(9, mean, chol, cand, 16_384, 13,
                                      rebalance=True)
    assert float(jax.device_get(jnp.max(jnp.abs(t_h - t_r)))) < 5e-5
    assert float(jax.device_get(jnp.max(jnp.abs(d_h - d_r)))) < 5e-5

    prot = (s0,
            np.tile(np.array([[0, 4]], np.int32), (a, 1)),
            np.stack([np.zeros(a, np.float32), s0 * 0.98], 1),
            np.zeros((a, 2), np.float32),
            np.ones((a, 2), np.float32))
    t_p, d_p = gbm_multi_portfolio_dd(9, mean, chol, cand, 16_384, 13,
                                      hedge_args=prot)
    # zero-premium puts dominate TERMINAL wealth path-by-path (each per-step
    # factor is >=) up to op-order rounding: the hedged recursion computes
    # 1 + W@r while rebalance computes W@exp(x), so paths where the puts
    # never pay agree only to ~1e-4 compounded f32 rounding. Drawdowns
    # improve in aggregate but NOT pointwise — a put payout can raise an
    # early peak and deepen a later RELATIVE drawdown.
    assert bool(jax.device_get(jnp.all(t_p >= t_r - 5e-4)))
    assert float(jax.device_get(d_p.mean())) > float(jax.device_get(d_r.mean()))


def test_unroll_compiled_same_stream(kernels):
    """unroll=1 vs the unroll=2 default consume the same hardware stream:
    path-stats outputs agree to fusion tolerance at even/odd steps."""
    a = 4
    mean = np.full(a, 1e-3, np.float32)
    chol = _chol(a).astype(np.float32)
    w = np.full(a, 0.25, np.float32)
    for steps in (12, 13):
        o1 = kernels.gbm_path_stats(11, mean, chol, w, 8_192, steps, unroll=1)
        o2 = kernels.gbm_path_stats(11, mean, chol, w, 8_192, steps, unroll=2)
        for x, y in zip(o1, o2):
            assert float(jax.device_get(jnp.max(jnp.abs(x - y)))) < 2e-6


def test_family_path_stats_compiled():
    """Round 3: GARCH + bootstrap candidate path-stats kernels on hardware —
    law parity vs the lax references (device-side moments), determinism, and
    hedged identity-leg reduction on the same hardware stream."""
    from mcport.models.bootstrap import bootstrap_path_stats
    from mcport.models.garch_mc import CCCGarchParams, garch_path_stats
    from mcport.ops.pallas_bootstrap import pallas_bootstrap_path_stats
    from mcport.ops.pallas_garch import pallas_garch_path_stats

    a, n, steps = 4, 65_536, 26
    rng = np.random.default_rng(5)
    cand = rng.dirichlet(np.ones(a), 8).astype(np.float32)
    sig0 = np.full(a, 4e-4)
    gp = CCCGarchParams(
        mu=np.full(a, 1e-3), omega=sig0 * 0.1,
        alpha=np.full(a, 0.08), beta=np.full(a, 0.9),
        corr_chol=np.linalg.cholesky(0.5 * np.eye(a) + 0.5),
        sigma2_0=sig0, eps2_0=sig0,
    )
    hist = (rng.standard_t(5, (200, a)) * 0.02 + 0.002).astype(np.float32)

    for name, kern, lax in (
        ("garch",
         lambda s: pallas_garch_path_stats(s, gp, cand, n, steps),
         lambda k: garch_path_stats(k, gp, cand, n, steps)),
        ("bootstrap",
         lambda s: pallas_bootstrap_path_stats(s, hist, cand, n, steps),
         lambda k: bootstrap_path_stats(k, hist, cand, n, steps)),
    ):
        tk, dk = kern(jnp.int32(3))
        tl, dl = lax(jax.random.key(7))
        se = jnp.std(tl, axis=1, ddof=1) / np.sqrt(n)
        m_ok = jnp.all(jnp.abs(jnp.mean(tk, 1) - jnp.mean(tl, 1)) < 6 * se)
        s_ok = jnp.all(jnp.abs(jnp.std(tk, 1) / jnp.std(tl, 1) - 1) < 0.1)
        d_ok = jnp.abs(jnp.median(dk, axis=1) - jnp.median(dl, axis=1)) < 0.02
        assert bool(jax.device_get(m_ok)), name
        assert bool(jax.device_get(s_ok)), name
        assert bool(jax.device_get(jnp.all(d_ok))), name
        # determinism on the hardware stream
        tk2, dk2 = kern(jnp.int32(3))
        assert bool(jax.device_get(jnp.array_equal(tk, tk2))), name
        assert bool(jax.device_get(jnp.array_equal(dk, dk2))), name

    # hedged identity legs reduce to the plain kernels on the SAME stream
    ident = (np.ones(a, np.float32),
             np.zeros((a, 1), np.int32), np.zeros((a, 1), np.float32),
             np.zeros((a, 1), np.float32), np.ones((a, 1), np.float32))
    tg, dg = pallas_garch_path_stats(9, gp, cand, 16_384, 13)
    th, dh = pallas_garch_path_stats(9, gp, cand, 16_384, 13, hedge_args=ident)
    assert float(jax.device_get(jnp.max(jnp.abs(th - tg)))) < 5e-5
    assert float(jax.device_get(jnp.max(jnp.abs(dh - dg)))) < 5e-5
    tb, db = pallas_bootstrap_path_stats(9, hist, cand, 16_384, 13)
    tbh, dbh = pallas_bootstrap_path_stats(9, hist, cand, 16_384, 13,
                                           hedge_args=ident)
    assert float(jax.device_get(jnp.max(jnp.abs(tbh - tb)))) < 5e-5
    assert float(jax.device_get(jnp.max(jnp.abs(dbh - db)))) < 5e-5


def test_merton_path_stats_compiled():
    """Late round 3: common-jump Merton candidate path-stats on hardware —
    law parity vs the lax reference, jump-tail worsening, determinism, and
    hedged identity reduction (all reductions on device)."""
    from mcport.models.jump import merton_path_stats
    from mcport.ops.pallas_jump import pallas_merton_path_stats

    a, n, steps = 4, 65_536, 26
    rng = np.random.default_rng(7)
    cand = rng.dirichlet(np.ones(a), 8).astype(np.float32)
    m = np.full(a, 1e-3, np.float32)
    chol = _chol(a).astype(np.float32)
    muj = np.full(a, -0.12, np.float32)
    sigj = np.full(a, 0.05, np.float32)
    lam = 0.05

    tk, dk = pallas_merton_path_stats(3, m, chol, lam, muj, sigj, cand, n,
                                      steps)
    tl, dl = merton_path_stats(jax.random.key(7), m, chol, lam, muj, sigj,
                               cand, n, steps)
    se = jnp.std(tl, axis=1, ddof=1) / np.sqrt(n)
    assert bool(jax.device_get(
        jnp.all(jnp.abs(jnp.mean(tk, 1) - jnp.mean(tl, 1)) < 6 * se)))
    assert bool(jax.device_get(
        jnp.all(jnp.abs(jnp.std(tk, 1) / jnp.std(tl, 1) - 1) < 0.1)))
    assert bool(jax.device_get(jnp.all(
        jnp.abs(jnp.median(dk, axis=1) - jnp.median(dl, axis=1)) < 0.025)))
    # jumps worsen the drawdown tail vs lam=0 on the same stream
    t0, d0 = pallas_merton_path_stats(3, m, chol, 0.0, muj, sigj, cand, n,
                                      steps)
    q_j = jnp.quantile(dk, 0.05)
    q_0 = jnp.quantile(d0, 0.05)
    assert float(jax.device_get(q_j)) < float(jax.device_get(q_0))
    # deterministic
    tk2, _ = pallas_merton_path_stats(3, m, chol, lam, muj, sigj, cand, n,
                                      steps)
    assert bool(jax.device_get(jnp.array_equal(tk, tk2)))
    # hedged identity on the same hardware stream
    ident = (np.ones(a, np.float32),
             np.zeros((a, 1), np.int32), np.zeros((a, 1), np.float32),
             np.zeros((a, 1), np.float32), np.ones((a, 1), np.float32))
    th, dh = pallas_merton_path_stats(9, m, chol, lam, muj, sigj, cand,
                                      16_384, 13, hedge_args=ident)
    tp, dp = pallas_merton_path_stats(9, m, chol, lam, muj, sigj, cand,
                                      16_384, 13)
    assert float(jax.device_get(jnp.max(jnp.abs(th - tp)))) < 5e-5
    assert float(jax.device_get(jnp.max(jnp.abs(dh - dp)))) < 5e-5


def test_dcc_path_stats_compiled():
    """Late round 3: DCC candidate path-stats on hardware — law parity vs
    the lax reference, determinism, hedged identity (device-side)."""
    from mcport.models.dcc import DCCGarchParams, dcc_path_stats
    from mcport.models.garch_mc import CCCGarchParams
    from mcport.ops.pallas_dcc import pallas_dcc_path_stats

    a, n, steps = 4, 16_384, 13
    sig0 = np.full(a, 4e-4)
    corr = 0.5 * np.eye(a) + 0.5
    base = CCCGarchParams(
        mu=np.full(a, 1e-3), omega=sig0 * 0.1, alpha=np.full(a, 0.08),
        beta=np.full(a, 0.9), corr_chol=np.linalg.cholesky(corr),
        sigma2_0=sig0, eps2_0=sig0)
    dp = DCCGarchParams(base=base, a_dcc=0.06, b_dcc=0.9, q0=corr,
                        e0=np.zeros(a))
    cand = np.random.default_rng(9).dirichlet(np.ones(a), 8).astype(np.float32)

    tk, dk = pallas_dcc_path_stats(3, dp, cand, n, steps)
    tl, dl = dcc_path_stats(jax.random.key(7), dp, cand, n, steps)
    se = jnp.std(tl, axis=1, ddof=1) / np.sqrt(n)
    assert bool(jax.device_get(
        jnp.all(jnp.abs(jnp.mean(tk, 1) - jnp.mean(tl, 1)) < 6 * se)))
    assert bool(jax.device_get(
        jnp.all(jnp.abs(jnp.std(tk, 1) / jnp.std(tl, 1) - 1) < 0.12)))
    assert bool(jax.device_get(jnp.all(
        jnp.abs(jnp.median(dk, axis=1) - jnp.median(dl, axis=1)) < 0.02)))
    tk2, _ = pallas_dcc_path_stats(3, dp, cand, n, steps)
    assert bool(jax.device_get(jnp.array_equal(tk, tk2)))
    ident = (np.ones(a, np.float32),
             np.zeros((a, 1), np.int32), np.zeros((a, 1), np.float32),
             np.zeros((a, 1), np.float32), np.ones((a, 1), np.float32))
    th, dh = pallas_dcc_path_stats(9, dp, cand, 8_192, 13, hedge_args=ident)
    tp, dpk = pallas_dcc_path_stats(9, dp, cand, 8_192, 13)
    assert float(jax.device_get(jnp.max(jnp.abs(th - tp)))) < 5e-5
    assert float(jax.device_get(jnp.max(jnp.abs(dh - dpk)))) < 5e-5


def test_family_frontier_compiled_end_to_end():
    """Late round 3: family_drawdown_frontier_search drives the compiled
    family path-stats kernels end-to-end on hardware — chunk invariance
    (shared per-chunk hardware streams) and feasible optima."""
    from mcport.engine.drawdown_frontier import family_drawdown_frontier_search
    from mcport.models.garch_mc import CCCGarchParams

    a = 4
    rng = np.random.default_rng(3)
    hist = (rng.standard_t(5, (200, a)) * 0.02 + 0.002).astype(np.float32)
    sig0 = np.full(a, 4e-4)
    gp = CCCGarchParams(
        mu=np.full(a, 1e-3), omega=sig0 * 0.1, alpha=np.full(a, 0.08),
        beta=np.full(a, 0.9),
        corr_chol=np.linalg.cholesky(0.5 * np.eye(a) + 0.5),
        sigma2_0=sig0, eps2_0=sig0)
    for model, params_ in (("garch", gp), ("bootstrap", hist)):
        r = family_drawdown_frontier_search(
            jax.random.key(1), model, params_, dd_budget=0.6,
            n_candidates=128, n_paths=8_192, n_steps=26, w_block=64,
            use_pallas=True)
        assert r.opt_idx >= 0, model
        assert r.dd_p95[r.opt_idx] >= -0.6
        r2 = family_drawdown_frontier_search(
            jax.random.key(1), model, params_, dd_budget=0.6,
            n_candidates=128, n_paths=8_192, n_steps=26, w_block=32,
            use_pallas=True)
        np.testing.assert_array_equal(r.ret, r2.ret)
        assert r.opt_idx == r2.opt_idx


def _heston_params(a: int):
    from mcport.models.heston import HestonParams

    rng = np.random.default_rng(0)
    return HestonParams(
        mu=rng.normal(1e-3, 3e-4, a), kappa=np.full(a, 0.15),
        theta=np.full(a, 4e-4), xi=np.full(a, 3e-3),
        rho=np.full(a, -0.5), v0=np.full(a, 4e-4),
        corr_chol=np.linalg.cholesky(0.5 * np.eye(a) + 0.5),
        s0=np.full(a, 100.0))


def test_heston_kernel_compiled_law_and_throughput():
    """Round 5 (VERDICT r4 weak #1): the fused Heston kernel on hardware
    PRNG — law parity vs the lax full-truncation reference (same params,
    independent streams), determinism, and the throughput gate. Mirrors the
    DCC/family compiled tests; all reductions on device."""
    from mcport.models.heston import heston_terminal_returns
    from mcport.ops.pallas_heston import pallas_heston_terminal_returns
    from mcport.utils.profiling import diff_timed

    hp = _heston_params(15)
    n, steps = 262_144, 26
    got = pallas_heston_terminal_returns(jnp.int32(7), hp, n, steps)
    ref = heston_terminal_returns(jax.random.key(7), hp, n, steps)
    se = jnp.std(ref, axis=0, ddof=1) / np.sqrt(n)
    m_ok = jnp.all(jnp.abs(jnp.mean(got, 0) - jnp.mean(ref, 0)) < 6 * se)
    s_ok = jnp.all(jnp.abs(jnp.std(got, 0) / jnp.std(ref, 0) - 1) < 0.05)
    assert bool(jax.device_get(m_ok))
    assert bool(jax.device_get(s_ok))
    # leverage law: the RAW terminal-return skew is POSITIVE at these
    # params (lognormal convexity ~ +0.32 at rho=0 dominates xi=3e-3
    # leverage — measured; the original "< 0" expectation here was wrong),
    # so assert (a) kernel matches the lax reference and (b) the leverage
    # signature in LOG space, where convexity cancels: log1p skew is -0.22
    # at rho=-0.5 vs ~0.00 at rho=0 (both kernels, both seeds measured)
    def _skew(x):
        z = (x - jnp.mean(x, 0)) / jnp.std(x, 0)
        return float(jax.device_get(jnp.mean(z**3)))

    assert abs(_skew(got) - _skew(ref)) < 0.1
    assert _skew(jnp.log1p(got)) < -0.1
    assert _skew(jnp.log1p(ref)) < -0.1
    # cross-asset correlation rides the shock correlation
    gc = float(jax.device_get(jnp.corrcoef(got.T)[0, 1]))
    rc = float(jax.device_get(jnp.corrcoef(ref.T)[0, 1]))
    assert abs(gc - rc) < 0.05
    # determinism on the hardware stream
    got2 = pallas_heston_terminal_returns(jnp.int32(7), hp, n, steps)
    assert bool(jax.device_get(jnp.array_equal(got, got2)))

    # throughput gate: two normal fields per step (2x the GBM PRNG rate);
    # r4 measured 2.78e9 path-steps/s — gate at half that under tunnel noise
    big_n = 1_048_576

    @jax.jit
    def one(seed):
        return pallas_heston_terminal_returns(seed, hp, big_n, 252).sum() * 1e-9

    def loop(k):
        acc = jnp.float32(0)
        for i in range(k):
            acc = acc + one(jnp.int32(1 + i) + (acc * 0).astype(jnp.int32))
        return acc

    tput = big_n * 252 / diff_timed(loop, k=8)
    print(f"\nheston kernel: {tput/1e9:.2f}e9 path-steps/s")
    assert tput > 1.4e9


def test_heston_path_stats_compiled():
    """Heston candidate path-stats on hardware — law parity vs the lax
    reference, determinism, hedged identity + put domination (the same
    matrix every other family kernel pins in this tier)."""
    from mcport.models.heston import heston_path_stats
    from mcport.ops.pallas_heston import pallas_heston_path_stats

    a, n, steps = 4, 65_536, 26
    hp = _heston_params(a)
    cand = np.random.default_rng(9).dirichlet(np.ones(a), 8).astype(np.float32)

    tk, dk = pallas_heston_path_stats(3, hp, cand, n, steps)
    tl, dl = heston_path_stats(jax.random.key(7), hp, cand, n, steps)
    se = jnp.std(tl, axis=1, ddof=1) / np.sqrt(n)
    assert bool(jax.device_get(
        jnp.all(jnp.abs(jnp.mean(tk, 1) - jnp.mean(tl, 1)) < 6 * se)))
    assert bool(jax.device_get(
        jnp.all(jnp.abs(jnp.std(tk, 1) / jnp.std(tl, 1) - 1) < 0.1)))
    assert bool(jax.device_get(jnp.all(
        jnp.abs(jnp.median(dk, axis=1) - jnp.median(dl, axis=1)) < 0.02)))
    tk2, dk2 = pallas_heston_path_stats(3, hp, cand, n, steps)
    assert bool(jax.device_get(jnp.array_equal(tk, tk2)))
    assert bool(jax.device_get(jnp.array_equal(dk, dk2)))
    # hedged identity legs reduce to the plain kernel on the SAME stream
    ident = (np.ones(a, np.float32),
             np.zeros((a, 1), np.int32), np.zeros((a, 1), np.float32),
             np.zeros((a, 1), np.float32), np.ones((a, 1), np.float32))
    th, dh = pallas_heston_path_stats(9, hp, cand, 16_384, 13,
                                      hedge_args=ident)
    tp, dp = pallas_heston_path_stats(9, hp, cand, 16_384, 13)
    assert float(jax.device_get(jnp.max(jnp.abs(th - tp)))) < 5e-5
    assert float(jax.device_get(jnp.max(jnp.abs(dh - dp)))) < 5e-5
    # zero-premium protective puts dominate terminal wealth
    prot = (hp.s0.astype(np.float32),
            np.tile(np.array([[0, 4]], np.int32), (a, 1)),
            np.stack([np.zeros(a, np.float32),
                      hp.s0.astype(np.float32) * 0.98], 1),
            np.zeros((a, 2), np.float32), np.ones((a, 2), np.float32))
    tpp, _ = pallas_heston_path_stats(9, hp, cand, 16_384, 13,
                                      hedge_args=prot)
    assert bool(jax.device_get(jnp.all(tpp >= th - 5e-4)))


def test_heston_unroll_compiled_same_stream():
    """two_shock_step_loop unroll=2 and the unroll=4 DEFAULT (round-5 A/B)
    must consume the same hardware stream as unroll=1: outputs agree to
    fusion tolerance at step counts exercising every tail-remainder branch
    of the main*unroll..n_steps epilogue (12 % 4 == 0, 13 % 4 == 1,
    26 % 4 == 2, 15 % 4 == 3; 13 % 2 == 1 covers unroll=2's odd tail)."""
    from mcport.ops.pallas_heston import pallas_heston_terminal_returns

    hp = _heston_params(4)
    for steps in (12, 13, 26, 15):
        o1 = pallas_heston_terminal_returns(11, hp, 8_192, steps, unroll=1)
        for unroll in (2, 4):
            ou = pallas_heston_terminal_returns(11, hp, 8_192, steps,
                                                unroll=unroll)
            assert float(jax.device_get(jnp.max(jnp.abs(o1 - ou)))) < 2e-6, \
                (steps, unroll)


def test_greeks_jacrev_compiles_and_holds_euler_on_hardware():
    """The pathwise-Greeks reverse pass (remat'd scan + top_k grads) must
    lower and run ON CHIP at a production-like shape, with the Euler
    homogeneity self-diagnostic intact (scalar fetches only)."""
    from mcport.config import GBMConfig
    from mcport.engine.greeks import portfolio_sensitivities
    from mcport.models.gbm import GBMParams

    a = 15
    params = GBMParams(mean_step=np.full(a, 1e-3, np.float32),
                       chol_step=_chol(a), s0=np.full(a, 100.0))
    w = np.full(a, 1.0 / a)
    out = portfolio_sensitivities(
        params, w, GBMConfig(n_paths=131_072, n_steps=64, seed=1), alpha=0.95)
    assert out.euler_gap_cvar < 5e-5 * max(1.0, abs(out.cvar))
    assert out.euler_gap_var < 5e-5 * max(1.0, abs(out.var))
    assert np.isfinite(out.d_cvar_dvol).all()
    assert float(w @ out.d_mean_dw) == pytest.approx(out.mean, abs=1e-5)


def test_american_lsmc_compiled_law_and_wall():
    """The LSMC tier (forward scan + backward regression scan + lax.map over
    assets) must lower and run ON CHIP, reproducing the binomial-lattice
    American put value within MC error at a production-like shape. Fetches
    are policy-sized (betas/boundaries, KBs), never path-sized."""
    import time

    from mcport.options.american import american_value
    from tests.test_american import binom_american

    t_years, steps, a = 0.5, 64, 15
    sig_step = 0.30 * np.sqrt(t_years / steps)
    r_step = 0.06 * t_years / steps
    t0 = time.perf_counter()
    pol = american_value(0, np.full(a, 100.0), sig_step, np.full(a, 100.0),
                         is_put=True, rate_step=r_step, n_paths=131_072,
                         n_steps=steps)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    pol = american_value(1, np.full(a, 100.0), sig_step, np.full(a, 100.0),
                         is_put=True, rate_step=r_step, n_paths=131_072,
                         n_steps=steps)
    warm = time.perf_counter() - t0
    oracle = binom_american(100.0, 100.0, 0.30, 0.06, t_years, put=True)
    for i in range(a):
        assert oracle - pol.value[i] < 4.0 * pol.se[i] + 0.01 * oracle
        assert pol.value[i] - oracle < 4.0 * pol.se[i]
        assert pol.early_premium[i] > 0.0
    b = pol.boundary
    assert np.isfinite(b).all() and (b < 100.0).all()
    print(f"\nlsmc 15x131072x{steps}: cold {cold:.1f}s warm {warm:.2f}s "
          f"value {pol.value[0]:.4f} (binomial {oracle:.4f})")

    # policy-frozen pathwise Greeks ON CHIP: reverse-mode AD through the
    # stopped-path scan must lower to hardware and hit the lattice FD delta
    from mcport.options.american import american_greeks

    t0 = time.perf_counter()
    g = american_greeks(pol, 11, np.full(a, 100.0), sig_step,
                        n_paths=131_072)
    gwall = time.perf_counter() - t0
    h = 1.0
    fd = (binom_american(101.0, 100.0, 0.30, 0.06, t_years, put=True)
          - binom_american(99.0, 100.0, 0.30, 0.06, t_years, put=True)) / (
        2.0 * h)
    for i in range(a):
        assert abs(g.delta[i] - fd) < 0.02
        assert g.vega[i] > 0.0
        assert abs(g.value[i] - pol.value[i]) < 4.0 * (g.se[i] + pol.se[i])
    print(f"greeks 15x131072x{steps}: {gwall:.1f}s delta {g.delta[0]:.4f} "
          f"(lattice FD {fd:.4f})")
