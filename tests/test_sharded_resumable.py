"""Sharded checkpoint/resume composition (VERDICT r1 item 6).

Three equivalences on the 8-device CPU mesh:
1. preemption — a sharded run split across calls (with an npz round-trip) is
   bit-identical to an uninterrupted sharded run;
2. single-chip — the sharded engine draws the SAME block streams as
   run_resumable_mc, so histogram counts / VaR / CVaR match bit-for-bit and
   moments to ~ulp;
3. guards — wrong-mesh-size and wrong-config resumes are rejected.
"""

import jax
import numpy as np
import pytest

from mcport.config import GBMConfig
from mcport.engine.mc_engine import run_resumable_mc
from mcport.models.gbm import GBMParams
from mcport.parallel.mesh import make_mesh
from mcport.parallel.sharded_resumable import (
    load_sharded_checkpoint,
    run_sharded_resumable_mc,
)

A = 3
MEAN = np.array([0.002, 0.001, 0.003])
CHOL = np.linalg.cholesky(
    0.0004 * (0.6 * np.eye(A) + 0.4 * np.ones((A, A)))
)
PARAMS = GBMParams(s0=np.ones(A), mean_step=MEAN, chol_step=CHOL)
W = np.array([0.5, 0.3, 0.2])
CFG = GBMConfig(n_paths=16_384, n_steps=8, path_block=1_024, seed=9, use_pallas=False)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh()


def test_sharded_preemption_equivalence(mesh, tmp_path):
    full, ck_full = run_sharded_resumable_mc(PARAMS, W, mesh, CFG)
    assert ck_full.done and full.n_paths == CFG.n_paths

    path = tmp_path / "sck.npz"
    _, ck1 = run_sharded_resumable_mc(PARAMS, W, mesh, CFG, max_blocks=8,
                                      checkpoint_path=path)
    assert ck1.next_block == 8 and not ck1.done
    ck2 = load_sharded_checkpoint(path)
    resumed, ck3 = run_sharded_resumable_mc(PARAMS, W, mesh, CFG, checkpoint=ck2)
    assert ck3.done

    # bit-exact: per-device accumulation order is identical across the split
    np.testing.assert_array_equal(ck3.hist, ck_full.hist)
    np.testing.assert_array_equal(ck3.sum, ck_full.sum)
    np.testing.assert_array_equal(ck3.outer, ck_full.outer)
    np.testing.assert_array_equal(ck3.sum_c, ck_full.sum_c)
    assert resumed.var == full.var and resumed.cvar == full.cvar
    np.testing.assert_array_equal(resumed.mean, full.mean)
    np.testing.assert_array_equal(resumed.cov, full.cov)


def test_max_blocks_rounds_to_mesh_multiple(mesh):
    _, ck = run_sharded_resumable_mc(PARAMS, W, mesh, CFG, max_blocks=11)
    assert ck.next_block == 8  # 11 → one lock-step sweep of 8


def test_sharded_matches_single_chip_streams(mesh):
    sharded, _ = run_sharded_resumable_mc(PARAMS, W, mesh, CFG)
    single, ck1 = run_resumable_mc(PARAMS, W, CFG)
    # identical block streams → identical sample multiset → identical counts
    assert sharded.n_paths == single.n_paths
    assert sharded.var == single.var
    assert sharded.cvar == single.cvar
    np.testing.assert_allclose(sharded.mean, single.mean, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(sharded.cov, single.cov, rtol=1e-5, atol=1e-12)
    assert sharded.port_mean == pytest.approx(single.port_mean, rel=1e-6)


def test_resume_guards(mesh, tmp_path):
    path = tmp_path / "g.npz"
    run_sharded_resumable_mc(PARAMS, W, mesh, CFG, max_blocks=8, checkpoint_path=path)
    ck = load_sharded_checkpoint(path)

    other = GBMConfig(n_paths=16_384, n_steps=16, path_block=1_024, seed=9,
                      use_pallas=False)
    with pytest.raises(ValueError, match="different run configuration"):
        run_sharded_resumable_mc(PARAMS, W, mesh, other, checkpoint=ck)

    ck_wrong = load_sharded_checkpoint(path)
    ck_wrong.n_dev = 4
    with pytest.raises(ValueError, match="mesh"):
        run_sharded_resumable_mc(PARAMS, W, mesh, CFG, checkpoint=ck_wrong)

    with pytest.raises(ValueError, match="divisible"):
        bad = GBMConfig(n_paths=1_024 * 9, n_steps=8, path_block=1_024,
                        use_pallas=False)  # 9 blocks % 8 devices != 0
        run_sharded_resumable_mc(PARAMS, W, mesh, bad)


def test_sharded_digest_guard(mesh, tmp_path):
    path = tmp_path / "dg.npz"
    run_sharded_resumable_mc(PARAMS, W, mesh, CFG, max_blocks=8, checkpoint_path=path)
    ck = load_sharded_checkpoint(path)
    with pytest.raises(ValueError, match="digest"):
        run_sharded_resumable_mc(PARAMS, np.array([0.1, 0.2, 0.7]), mesh, CFG,
                                 checkpoint=ck)


def test_sharded_student_t_matches_single_chip(mesh):
    """student_t innovations keep the bit-exact single-chip stream equality."""
    cfg_t = GBMConfig(n_paths=16_384, n_steps=8, path_block=1_024, seed=9,
                      use_pallas=False, innovations="student_t", t_dof=5.0)
    sharded, _ = run_sharded_resumable_mc(PARAMS, W, mesh, cfg_t)
    single, _ = run_resumable_mc(PARAMS, W, cfg_t)
    assert sharded.var == single.var and sharded.cvar == single.cvar
    np.testing.assert_allclose(sharded.cov, single.cov, rtol=1e-5, atol=1e-12)
