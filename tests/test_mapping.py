"""Tests for the native voxel store and the dense mapping pipeline."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from sindslam_tpu.config import CameraConfig, MappingConfig
from sindslam_tpu.datasets.synthetic import make_default_scene, make_trajectory
from sindslam_tpu.mapping.dense import DenseMapper, keyframe_to_voxels
from sindslam_tpu.runtime.native import VoxelStore

CAM = CameraConfig(cx=319.5, cy=239.5)
MCFG = MappingConfig()


# ---------------------------------------------------------------- C++ store


def test_voxel_store_basic():
    vs = VoxelStore(resolution=0.05)
    vox = np.array([[0, 0, 10], [0, 0, 10], [1, 2, 3]], np.int32)
    rgb = np.array([[200, 10, 10], [200, 10, 10], [10, 200, 10]], np.uint8)
    hit = np.ones(3, np.uint8)
    vs.insert(vox, rgb, hit)
    vs.flush()
    assert len(vs) == 2
    centers, colors = vs.export(min_log_odds=0.5, min_hits=2)
    # only the double-hit voxel passes min_hits=2
    assert len(centers) == 1
    np.testing.assert_allclose(centers[0], [0.025, 0.025, 0.525], atol=1e-5)
    np.testing.assert_array_equal(colors[0], [200, 10, 10])
    vs.close()


def test_voxel_store_misses_erode():
    vs = VoxelStore(resolution=0.05, lo_hit=0.85, lo_miss=-0.4)
    vox = np.array([[5, 5, 5]], np.int32)
    rgb = np.array([[100, 100, 100]], np.uint8)
    vs.insert(vox, rgb, np.ones(1, np.uint8))
    vs.insert(vox, rgb, np.ones(1, np.uint8))
    # now pass 5 misses through the same voxel: occupancy drops below 0
    for _ in range(5):
        vs.insert(vox, rgb, np.zeros(1, np.uint8))
    centers, _ = vs.export(min_log_odds=0.0, min_hits=1)
    assert len(centers) == 0
    vs.close()


def test_voxel_store_async_and_pcd(tmp_path):
    vs = VoxelStore(resolution=0.02)
    rng = np.random.default_rng(0)
    for _ in range(10):
        vox = rng.integers(-50, 50, (5000, 3)).astype(np.int32)
        rgb = rng.integers(0, 255, (5000, 3)).astype(np.uint8)
        vs.insert(vox, rgb, np.ones(5000, np.uint8))
    vs.flush()
    assert len(vs) > 10000
    path = str(tmp_path / "cloud.pcd")
    vs.save_pcd(path, min_log_odds=0.5, min_hits=1)
    head = open(path).read(400)
    assert "PCD" in head and "POINTS" in head
    vs.close()


def test_sor_filter_drops_floaters():
    """kNN statistical outlier removal (reference pubPointCloud.cc:291-296):
    a dense plane survives, isolated floaters are removed."""
    vs = VoxelStore(resolution=0.02)
    xs, ys = np.meshgrid(np.arange(40), np.arange(40))
    plane = np.stack([xs.ravel(), ys.ravel(), np.zeros(1600, int)],
                     axis=1).astype(np.int32)
    floaters = np.array([[200, 200, 200], [-150, 80, 300], [90, -220, 50],
                         [400, 0, 0], [0, 400, 120]], np.int32)
    vox = np.concatenate([plane, floaters])
    rgb = np.full((len(vox), 3), 128, np.uint8)
    vs.insert(vox, rgb, np.ones(len(vox), np.uint8))
    vs.flush()
    raw, _ = vs.export(min_log_odds=0.5, min_hits=1)
    assert len(raw) == 1605
    kept, _ = vs.export(min_log_odds=0.5, min_hits=1, sor_mean_k=30,
                        sor_stddev=1.0, sor_radius=6)
    kept_keys = {tuple(np.round(p / 0.02 - 0.5).astype(int)) for p in kept}
    for fl in floaters:
        assert tuple(fl) not in kept_keys
    # the plane interior survives (edges may be trimmed by the threshold)
    interior = {(x, y, 0) for x in range(5, 35) for y in range(5, 35)}
    assert len(interior - kept_keys) == 0
    assert len(kept) > 0.8 * 1600
    vs.close()


def test_export_coarse_revoxelizes():
    """Secondary-resolution export (octomap_server role, OctomapServer.cpp:80):
    2x coarser resolution merges 2x2x2 voxel blocks."""
    vs = VoxelStore(resolution=0.02)
    xs, ys, zs = np.meshgrid(np.arange(8), np.arange(8), np.arange(8))
    vox = np.stack([xs.ravel(), ys.ravel(), zs.ravel()], 1).astype(np.int32)
    rgb = np.full((len(vox), 3), 77, np.uint8)
    vs.insert(vox, rgb, np.ones(len(vox), np.uint8))
    centers, colors = vs.export_coarse(0.04, min_log_odds=0.5, min_hits=1)
    assert len(centers) == 4 * 4 * 4
    assert np.all(colors == 77)
    # centers lie on the 0.04 m grid
    np.testing.assert_allclose((centers / 0.04 - 0.5) % 1.0, 0.0, atol=1e-5)
    vs.close()


def _parse_ot(path):
    """Minimal reader for the ColorOcTree .ot container written by save_ot."""
    with open(path, "rb") as f:
        data = f.read()
    header, _, body = data.partition(b"data\n")
    lines = [ln for ln in header.decode().splitlines()
             if ln and not ln.startswith("#")]
    meta = dict(ln.split(None, 1) for ln in lines)
    nodes = []
    off = 0
    # DFS stream: float value, 3 color bytes, child mask byte
    stack = [0]
    while stack:
        stack.pop()
        value = np.frombuffer(body, np.float32, 1, off)[0]
        r, g, b, mask = body[off + 4:off + 8]
        nodes.append((value, (r, g, b), mask))
        off += 8
        for _ in range(bin(mask).count("1")):
            stack.append(0)
    assert off == len(body)
    return meta, nodes


def test_save_ot_octree_roundtrip(tmp_path):
    vs = VoxelStore(resolution=0.02)
    rng = np.random.default_rng(3)
    vox = rng.integers(-40, 40, (500, 3)).astype(np.int32)
    rgb = rng.integers(0, 255, (500, 3)).astype(np.uint8)
    vs.insert(vox, rgb, np.ones(500, np.uint8))
    centers, _ = vs.export(min_log_odds=0.5, min_hits=1)
    path = str(tmp_path / "map.ot")
    vs.save_ot(path, min_hits=1)
    meta, nodes = _parse_ot(path)
    assert meta["id"] == "ColorOcTree"
    assert abs(float(meta["res"]) - 0.02) < 1e-9
    assert int(meta["size"]) == len(nodes)
    leaves = [n for n in nodes if n[2] == 0]
    assert len(leaves) == len(centers)
    # inner-node occupancy is the max over children -> root carries the max
    assert nodes[0][0] == max(n[0] for n in nodes)
    # secondary-resolution octree has fewer leaves
    path2 = str(tmp_path / "map2.ot")
    vs.save_ot(path2, resolution2=0.05, min_hits=1)
    meta2, nodes2 = _parse_ot(path2)
    assert abs(float(meta2["res"]) - 0.05) < 1e-9
    assert len([n for n in nodes2 if n[2] == 0]) < len(centers)
    vs.close()


# ------------------------------------------------------------- device side


@pytest.fixture(scope="module")
def kf_data():
    scene = make_default_scene(0, with_dynamic=True)
    poses = make_trajectory(3, 0.05)
    out = []
    for i in range(2):
        rgb, depth, dyn = scene.render(poses[i], np.array([0.3 * i, 0, 0]))
        mask = np.where(dyn, 255, np.where(depth > 0, 125, 0)).astype(np.int32)
        label = np.where(depth > 0, 1 + (depth > 3.0).astype(np.int32), 0)
        # give the dynamic board its own cluster id
        label[dyn] = 3
        out.append((rgb, depth, dyn, mask, label, poses[i]))
    return out


def test_keyframe_to_voxels_masks_dynamic(kf_data):
    rgb, depth, dyn, mask, label, pose = kf_data[0]
    batch = keyframe_to_voxels(
        jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(mask),
        jnp.asarray(label), jnp.asarray(pose.astype(np.float32)),
        jnp.asarray(depth), jnp.asarray(mask),
        jnp.asarray(np.linalg.inv(pose).astype(np.float32)), CAM, MCFG)
    valid = np.asarray(batch.valid)
    hit = np.asarray(batch.hit)
    vox = np.asarray(batch.vox)
    assert valid.sum() > 10000
    # hits reconstruct world geometry: back wall voxels near z=5.5/0.02=275
    wall_z = vox[valid & hit][:, 2]
    assert (np.abs(wall_z - 5.5 / MCFG.voxel_size_m) < 30).sum() > 1000
    # no dynamic pixels contributed hits: mask>=240 excluded
    # (board is at z~1.7: no hit voxels in that slab around board x-range)
    board_hits = valid & hit & (np.abs(vox[:, 2] - 1.7 / MCFG.voxel_size_m) < 5)
    assert board_hits.sum() < 200


def test_occlusion_veto_drops_moved_cluster(kf_data):
    """Render the 'same' scene but the board moved between the two frames and
    is NOT masked: the reprojection veto must drop its cluster."""
    rgb0, depth0, dyn0, mask0, label0, pose0 = kf_data[0]
    rgb1, depth1, dyn1, mask1, label1, pose1 = kf_data[1]
    # pretend detection missed the board: static mask everywhere valid
    mask_miss = np.where(depth1 > 0, 125, 0).astype(np.int32)
    batch = keyframe_to_voxels(
        jnp.asarray(rgb1), jnp.asarray(depth1), jnp.asarray(mask_miss),
        jnp.asarray(label1), jnp.asarray(pose1.astype(np.float32)),
        jnp.asarray(depth0), jnp.asarray(mask0),
        jnp.asarray(np.linalg.inv(pose0).astype(np.float32)), CAM, MCFG)
    occ = np.asarray(batch.cluster_occluded)
    assert occ[3]                       # the board cluster is vetoed
    assert not occ[1]                   # far static cluster survives
    um = np.asarray(batch.updated_mask)
    assert (um[dyn1] == 255).mean() > 0.6   # written back into the mask


def test_dense_mapper_end_to_end(tmp_path, kf_data):
    mapper = DenseMapper(CAM, MCFG)
    for rgb, depth, dyn, mask, label, pose in kf_data:
        Tcw = np.linalg.inv(pose)
        mapper.insert_keyframe(jnp.asarray(rgb), jnp.asarray(depth),
                               jnp.asarray(mask), jnp.asarray(label), Tcw)
    centers, colors = mapper.export_cloud()
    assert len(centers) > 5000
    # static structure present (back wall band)
    assert ((np.abs(centers[:, 2] - 5.5) < 0.5).sum() > 500)
    # dynamic board region (z ~ 1.7) nearly absent
    board = np.abs(centers[:, 2] - 1.7) < 0.1
    assert board.sum() < 0.02 * len(centers)
    path = str(tmp_path / "map.pcd")
    mapper.save_pcd(path)
    assert os.path.getsize(path) > 1000
    mapper.close()


def test_export_free_and_occupancy_2d(kf_data):
    """Projected 2-D occupancy map (octomap_server downprojected_map role,
    OctomapServer.cpp:1285): occupied walls become 100-cells, ray-carved
    interior becomes known-free 0-cells, untouched space stays -1."""
    mapper = DenseMapper(CAM, MCFG)
    for rgb, depth, dyn, mask, label, pose in kf_data:
        Tcw = np.linalg.inv(pose)
        mapper.insert_keyframe(jnp.asarray(rgb), jnp.asarray(depth),
                               jnp.asarray(mask), jnp.asarray(label), Tcw)
    free = mapper.store.export_free()
    assert len(free) > 1000          # ray misses carved interior space
    origin, grid = mapper.export_occupancy_2d(y_min=-1.0, y_max=1.5)
    assert grid.ndim == 2 and grid.dtype == np.int8
    n_occ = (grid == 100).sum()
    n_free = (grid == 0).sum()
    n_unknown = (grid == -1).sum()
    assert n_occ > 50, n_occ
    assert n_free > 50, n_free
    assert n_unknown > 0
    # the back wall (z ~ 5.5) must appear as occupied cells at the far rows
    res = MCFG.secondary_resolution_m
    zi = int((5.5 - origin[1]) / res)
    band = grid[max(zi - 3, 0):zi + 4]
    assert (band == 100).sum() > 10
    mapper.close()
