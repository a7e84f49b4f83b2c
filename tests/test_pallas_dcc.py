"""Pallas DCC kernel vs the lax reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from mcport.models.dcc import DCCGarchParams, dcc_terminal_returns
from mcport.models.garch_mc import CCCGarchParams
from mcport.ops.pallas_dcc import pallas_dcc_terminal_returns

A = 3
CORR = np.array([[1.0, 0.55, 0.3], [0.55, 1.0, 0.45], [0.3, 0.45, 1.0]])
BASE = CCCGarchParams(
    mu=np.array([5e-4, 1e-3, 2e-4]),
    omega=np.array([4e-6, 6e-6, 3e-6]),
    alpha=np.array([0.08, 0.12, 0.06]),
    beta=np.array([0.88, 0.82, 0.9]),
    corr_chol=np.linalg.cholesky(CORR),
    sigma2_0=np.array([1e-4, 2e-4, 8e-5]),
    eps2_0=np.array([1e-4, 2e-4, 8e-5]),
)
PARAMS = DCCGarchParams(
    base=BASE, a_dcc=0.06, b_dcc=0.90,
    q0=CORR + 0.05 * np.eye(A), e0=np.array([0.4, -1.1, 0.2]),
)
KW = dict(interpret=True, block=128)


def test_kernel_matches_lax_law():
    n, steps = 8_192, 16   # suite diet: MC tolerances below self-adjust via se
    got = np.asarray(pallas_dcc_terminal_returns(3, PARAMS, n, steps, **KW))
    ref = np.asarray(dcc_terminal_returns(jax.random.key(3), PARAMS, n, steps))
    assert got.shape == (n, A)
    se = ref.std(0) / np.sqrt(n)
    np.testing.assert_allclose(got.mean(0), ref.mean(0), atol=float(6 * se.max()))
    np.testing.assert_allclose(got.std(0), ref.std(0), rtol=0.08)
    c_got = np.corrcoef(got, rowvar=False)
    c_ref = np.corrcoef(ref, rowvar=False)
    np.testing.assert_allclose(c_got, c_ref, atol=0.06)


def test_zero_dynamics_reduces_to_ccc_law():
    """a=b=0 freezes Q_t = S every step: the law equals CCC-GARCH."""
    from mcport.models.garch_mc import garch_terminal_returns

    p0 = DCCGarchParams(base=BASE, a_dcc=0.0, b_dcc=0.0, q0=CORR,
                        e0=np.zeros(A))
    n, steps = 8_192, 12   # suite diet: corr MC error ~1/sqrt(n) ≈ 0.011 << 0.05
    got = np.asarray(pallas_dcc_terminal_returns(7, p0, n, steps, **KW))
    ref = np.asarray(garch_terminal_returns(jax.random.key(7), BASE, n, steps))
    np.testing.assert_allclose(
        np.corrcoef(got, rowvar=False), np.corrcoef(ref, rowvar=False),
        atol=0.05)
    np.testing.assert_allclose(got.std(0), ref.std(0), rtol=0.08)


def test_zero_vol_closed_form():
    base = CCCGarchParams(
        mu=np.array([0.01, -0.005, 0.002]),
        omega=np.zeros(A), alpha=np.zeros(A), beta=np.zeros(A),
        corr_chol=np.eye(A), sigma2_0=np.zeros(A), eps2_0=np.zeros(A),
    )
    p = DCCGarchParams(base=base, a_dcc=0.05, b_dcc=0.9, q0=np.eye(A),
                       e0=np.zeros(A))
    out = np.asarray(pallas_dcc_terminal_returns(1, p, 64, 6, **KW))
    # atol: f32 per-step (1 + mu) rounding accumulates ~1e-7 absolute
    np.testing.assert_allclose(out[:, 0], 1.01 ** 6 - 1, atol=3e-7)
    np.testing.assert_allclose(out[:, 1], 0.995 ** 6 - 1, atol=3e-7)
    np.testing.assert_allclose(out[:, 2], 1.002 ** 6 - 1, atol=3e-7)


def test_deterministic_and_padding_independent():
    a = np.asarray(pallas_dcc_terminal_returns(5, PARAMS, 300, 7, **KW))
    b = np.asarray(pallas_dcc_terminal_returns(5, PARAMS, 300, 7, **KW))
    np.testing.assert_array_equal(a, b)
    assert np.isfinite(a).all()
    # result must not depend on how many paths are padded into the block
    c = np.asarray(pallas_dcc_terminal_returns(5, PARAMS, 257, 7, **KW))
    np.testing.assert_array_equal(a[:257], c)


def test_prefetch_same_stream():
    """Prefetch consumes the identical draw sequence. In interpret mode the
    two loop shapes can FUSE differently (observed: 2/768 elements off by
    ~1e-7 through the rsqrt/Cholesky chain), so this asserts stream identity
    to float tolerance, not bitwise — the hardware stream is stateful and
    order-identical by construction (pallas_gbm.paired_step_loop)."""
    a = np.asarray(pallas_dcc_terminal_returns(9, PARAMS, 256, 9,
                                               prefetch=False, **KW))
    b = np.asarray(pallas_dcc_terminal_returns(9, PARAMS, 256, 9,
                                               prefetch=True, **KW))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_pack_layout_matches_lax_law():
    """Round-4 packed-scalar layout (8 paths/sublane, per-element slabs):
    same law as the lax reference, independent stream."""
    n, steps = 8_192, 16   # suite diet: MC tolerances below self-adjust via se
    got = np.asarray(pallas_dcc_terminal_returns(
        3, PARAMS, n, steps, interpret=True, block=128, layout="pack"))
    ref = np.asarray(dcc_terminal_returns(jax.random.key(3), PARAMS, n, steps))
    assert got.shape == (n, A)
    se = ref.std(0) / np.sqrt(n)
    np.testing.assert_allclose(got.mean(0), ref.mean(0), atol=float(6 * se.max()))
    np.testing.assert_allclose(got.std(0), ref.std(0), rtol=0.08)
    np.testing.assert_allclose(np.corrcoef(got, rowvar=False),
                               np.corrcoef(ref, rowvar=False), atol=0.06)


def test_pack_deterministic_and_padding_independent():
    kw = dict(interpret=True, block=128, layout="pack")
    a = np.asarray(pallas_dcc_terminal_returns(5, PARAMS, 300, 7, **kw))
    b = np.asarray(pallas_dcc_terminal_returns(5, PARAMS, 300, 7, **kw))
    np.testing.assert_array_equal(a, b)
    assert np.isfinite(a).all()
    # p = 8b + s keeps paths block-local: a longer run extends, not reshuffles
    c = np.asarray(pallas_dcc_terminal_returns(5, PARAMS, 257, 7, **kw))
    np.testing.assert_array_equal(a[:257], c)


def test_pack_zero_vol_closed_form():
    base = CCCGarchParams(
        mu=np.array([0.01, -0.005, 0.002]),
        omega=np.zeros(A), alpha=np.zeros(A), beta=np.zeros(A),
        corr_chol=np.eye(A), sigma2_0=np.zeros(A), eps2_0=np.zeros(A),
    )
    p = DCCGarchParams(base=base, a_dcc=0.05, b_dcc=0.9, q0=np.eye(A),
                       e0=np.zeros(A))
    out = np.asarray(pallas_dcc_terminal_returns(
        1, p, 64, 6, interpret=True, block=128, layout="pack"))
    np.testing.assert_allclose(out[:, 0], 1.01 ** 6 - 1, atol=3e-7)
    np.testing.assert_allclose(out[:, 1], 0.995 ** 6 - 1, atol=3e-7)
    np.testing.assert_allclose(out[:, 2], 1.002 ** 6 - 1, atol=3e-7)


def test_tile_tri_bitexact_vs_full_15_assets():
    """The triangle Q carry drops whole sublane tiles; consumed lanes run the
    identical op sequence, so tri == full bitwise ON HARDWARE — pinned by
    test_tpu_kernels.py::test_dcc_layouts_agree_compiled. In interpret mode the
    two loop bodies FUSE differently (<1% of elements off by ~1e-7 through
    the rsqrt/Cholesky chain, exactly like test_prefetch_same_stream), so
    this CPU test asserts stream identity to float tolerance. Needs A > 8
    so column tiles actually differ."""
    a15 = 15
    rng = np.random.default_rng(0)
    corr = 0.5 * np.eye(a15) + 0.5
    sig0 = np.full(a15, 4e-4)
    base = CCCGarchParams(
        mu=rng.normal(1e-3, 5e-4, a15), omega=sig0 * 0.1,
        alpha=np.full(a15, 0.08), beta=np.full(a15, 0.9),
        corr_chol=np.linalg.cholesky(corr), sigma2_0=sig0, eps2_0=sig0)
    p = DCCGarchParams(base=base, a_dcc=0.05, b_dcc=0.9, q0=corr,
                       e0=np.zeros(a15))
    kw = dict(n_paths=128, n_steps=7, block=128, interpret=True,
              layout="tile")
    full = np.asarray(pallas_dcc_terminal_returns(7, p, tri=False, **kw))
    tri = np.asarray(pallas_dcc_terminal_returns(7, p, tri=True, **kw))
    np.testing.assert_allclose(tri, full, atol=1e-6)
    assert np.isfinite(tri).all()


def test_correlation_rises_after_common_shocks():
    """The DCC point: with news weight a > 0, Q_t's off-diagonals move with
    realized shock products. Start Q below S: the mean-reverting (1-a-b)S
    pull must raise the simulated correlation relative to frozen dynamics."""
    lo = np.array([[1.0, 0.05, 0.05], [0.05, 1.0, 0.05], [0.05, 0.05, 1.0]])
    p_dyn = DCCGarchParams(base=BASE, a_dcc=0.05, b_dcc=0.6, q0=lo,
                           e0=np.zeros(A))
    p_frozen = DCCGarchParams(base=BASE, a_dcc=0.0, b_dcc=1.0, q0=lo,
                              e0=np.zeros(A))
    n, steps = 16_384, 40
    dyn = np.asarray(pallas_dcc_terminal_returns(11, p_dyn, n, steps, **KW))
    frz = np.asarray(pallas_dcc_terminal_returns(11, p_frozen, n, steps, **KW))
    c_dyn = np.corrcoef(dyn, rowvar=False)[0, 1]
    c_frz = np.corrcoef(frz, rowvar=False)[0, 1]
    assert c_dyn > c_frz + 0.1   # reverts toward S's 0.55 vs frozen 0.05


def test_pack_dd_kernel_law_chunking_and_terminal_consistency():
    """Round-5 pack-relayout experiment kernel (_dcc_pack_dd_kernel): law
    parity vs the lax candidate reference, w_block chunk invariance
    (shared path streams), and w = e_j terminal consistency with the pack
    terminal kernel on the SAME stream (fp op-order tolerance only)."""
    from mcport.models.dcc import dcc_path_stats
    from mcport.ops.pallas_dcc import pallas_dcc_path_stats

    cand = np.random.default_rng(9).dirichlet(np.ones(A), 8).astype(np.float32)
    n, steps = 8_192, 13
    tk, dk = pallas_dcc_path_stats(3, PARAMS, cand, n, steps, layout="pack",
                                   w_block=4, **KW)
    tl, dl = dcc_path_stats(jax.random.key(7), PARAMS, cand, n, steps)
    se = np.asarray(jnp.std(tl, axis=1, ddof=1)) / np.sqrt(n)
    np.testing.assert_allclose(np.asarray(tk.mean(1)), np.asarray(tl.mean(1)),
                               atol=float(6 * se.max()))
    assert bool(jnp.all(jnp.abs(jnp.std(tk, 1) / jnp.std(tl, 1) - 1) < 0.12))
    assert bool(jnp.all(
        jnp.abs(jnp.median(dk, 1) - jnp.median(dl, 1)) < 0.02))
    # drawdown invariants
    assert bool(jnp.all(dk <= 1e-6)) and bool(jnp.all(dk >= -1.0))
    # chunk invariance: same seed per chunk -> identical draw STREAMS, but
    # NOT bit-identical outputs — different w_cnt values compile different
    # programs whose fp fusion can differ ~1e-7 (review r5: bit-equality
    # here was shape-lucky; measured 1.2e-7 divergence at n=1024/steps=5)
    tk2, dk2 = pallas_dcc_path_stats(3, PARAMS, cand, n, steps,
                                     layout="pack", w_block=8, **KW)
    np.testing.assert_allclose(np.asarray(tk), np.asarray(tk2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk2),
                               rtol=1e-5, atol=1e-5)
    # unit-vector candidate reproduces the pack TERMINAL kernel's stream
    w1 = np.zeros((1, A), np.float32)
    w1[0, 1] = 1.0
    t1, _ = pallas_dcc_path_stats(5, PARAMS, w1, 2_048, 7, layout="pack",
                                  **KW)
    tt = pallas_dcc_terminal_returns(5, PARAMS, 2_048, 7, layout="pack",
                                     **KW)
    assert float(jnp.max(jnp.abs(t1[0] - tt[:, 1]))) < 2e-6
    # hedged settlement is tile-only (documented)
    import pytest

    ident = (np.ones(A, np.float32), np.zeros((A, 1), np.int32),
             np.zeros((A, 1), np.float32), np.zeros((A, 1), np.float32),
             np.ones((A, 1), np.float32))
    with pytest.raises(ValueError, match="tile"):
        pallas_dcc_path_stats(3, PARAMS, cand, 512, 4, layout="pack",
                              hedge_args=ident, **KW)


def test_pack_block_tiling_guard():
    """block % 1024 enforced on the public wrapper AND the internal jit'd
    entry points (benchmark harnesses call _pack_call/_pack_dd_call
    directly — review r5). Raises at trace time, so this runs on CPU."""
    import pytest

    from mcport.ops.pallas_dcc import (_pack_call, _pack_dd_call,
                                       pallas_dcc_path_stats)

    w1 = np.full((1, A), 1.0 / A, np.float32)
    with pytest.raises(ValueError, match="block % 1024"):
        pallas_dcc_path_stats(3, PARAMS, w1, 2_048, 4, layout="pack",
                              block=512)
    b = PARAMS.base
    args = (3, b.mu, b.omega, b.alpha, b.beta, CORR, PARAMS.a_dcc,
            PARAMS.b_dcc, PARAMS.q0, PARAMS.e0, b.sigma2_0, b.eps2_0)
    with pytest.raises(ValueError, match="block % 1024"):
        _pack_call(*args, 2_048, 4, 512, False, 2)
    with pytest.raises(ValueError, match="block % 1024"):
        _pack_dd_call(*args, w1, 2_048, 4, 512, False, 2)
