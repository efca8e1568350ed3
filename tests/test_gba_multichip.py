"""Multi-device joint global BA: shard the observation table over a mesh.

The PCG Schur solver (``slam/gba.py``) is pure batched contractions and
segment-sums over the flat observation axis, so GSPMD distributes it with
NO solver changes: shard every (M,)-leading array of the BAProblem over a
device mesh, replicate poses/points, and XLA inserts the all-reduces (the
per-device partial Hcc/Hpp/bc/bp and the W/W^T applications inside every
CG iteration psum across the mesh — the ICI pattern a real multi-chip
deployment would ride).

This extends the multi-chip story beyond the batched front-end
(``parallel/batch_frontend.py``): the map back-end's heaviest solve also
scales over the mesh, checked for numerical equality with the single-device
result and for actual collectives in the compiled module.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import test_ba as tb
from sindslam_tpu.slam.gba import joint_global_ba

pytestmark = pytest.mark.filterwarnings("ignore")


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh (see conftest)")
    return Mesh(np.array(devs[:8]), ("obs",))


def test_joint_gba_sharded_over_observations_matches_single_device(mesh):
    rng = np.random.default_rng(7)
    problem, gt_poses, _gt_pts, _n = tb._make_problem(rng)
    n_iters, n_cg = 8, 30

    res_single = joint_global_ba(problem, tb.CAM, tb.CFG,
                                 n_iters=n_iters, n_cg=n_cg)

    shard = NamedSharding(mesh, P("obs"))
    repl = NamedSharding(mesh, P())
    sharded = problem._replace(
        poses=jax.device_put(problem.poses, repl),
        points=jax.device_put(problem.points, repl),
        fixed_mask=jax.device_put(problem.fixed_mask, repl),
        obs_kf=jax.device_put(problem.obs_kf, shard),
        obs_pt=jax.device_put(problem.obs_pt, shard),
        obs_uv=jax.device_put(problem.obs_uv, shard),
        obs_ur=jax.device_put(problem.obs_ur, shard),
        obs_level=jax.device_put(problem.obs_level, shard),
        obs_valid=jax.device_put(problem.obs_valid, shard),
    )
    # observation table really is split 8 ways
    assert len({s.device.id for s in sharded.obs_uv.addressable_shards}) == 8

    res_sharded = joint_global_ba(sharded, tb.CAM, tb.CFG,
                                  n_iters=n_iters, n_cg=n_cg)

    # cross-device reduction order differs in low-order bits; both runs must
    # land on the same optimum
    np.testing.assert_allclose(np.asarray(res_sharded.poses),
                               np.asarray(res_single.poses),
                               rtol=0, atol=5e-4)
    np.testing.assert_allclose(np.asarray(res_sharded.points),
                               np.asarray(res_single.points),
                               rtol=0, atol=5e-3)
    assert abs(float(res_sharded.mean_chi2)
               - float(res_single.mean_chi2)) < 0.05

    # and the poses are actually GOOD (converged), not just equal
    for k in range(1, len(gt_poses)):
        from sindslam_tpu.geometry import se3
        e = np.asarray(se3.se3_log(jnp.asarray(
            (np.asarray(res_sharded.poses)[k]
             @ np.linalg.inv(gt_poses[k]))[None].astype(np.float32))))[0]
        assert np.linalg.norm(e) < 0.01, (k, np.linalg.norm(e))


def test_joint_gba_sharded_compiles_with_collectives(mesh):
    """The distributed solve must actually DISTRIBUTE: the compiled module
    contains cross-device reductions (all-reduce), not a gather of the
    whole observation table onto one device."""
    rng = np.random.default_rng(7)
    problem, _gt_poses, _gt_pts, _n = tb._make_problem(rng)
    shard = NamedSharding(mesh, P("obs"))
    repl = NamedSharding(mesh, P())
    sharded = problem._replace(
        poses=jax.device_put(problem.poses, repl),
        points=jax.device_put(problem.points, repl),
        fixed_mask=jax.device_put(problem.fixed_mask, repl),
        obs_kf=jax.device_put(problem.obs_kf, shard),
        obs_pt=jax.device_put(problem.obs_pt, shard),
        obs_uv=jax.device_put(problem.obs_uv, shard),
        obs_ur=jax.device_put(problem.obs_ur, shard),
        obs_level=jax.device_put(problem.obs_level, shard),
        obs_valid=jax.device_put(problem.obs_valid, shard),
    )
    lowered = joint_global_ba.lower(sharded, tb.CAM, tb.CFG,
                                    n_iters=2, n_cg=4)
    hlo = lowered.compile().as_text()
    assert "all-reduce" in hlo, "sharded GBA compiled without collectives"
