#!/usr/bin/env python3
"""Per-stage on-chip timing of the front-end at 640x480 (dev tool).

Each stage is jitted separately and timed with a forced host readback (the
axon tunnel makes block_until_ready a no-op). Numbers include one ~20-25 ms
tunnel round trip each — compare deltas, not absolutes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from sindslam_tpu.utils import setup_compilation_cache
setup_compilation_cache()

from sindslam_tpu.config import SystemConfig
from sindslam_tpu.datasets.synthetic import generate_sequence
from sindslam_tpu.frontend.clustering import seg_by_kmeans
from sindslam_tpu.frontend.edges import cal_occluded
from sindslam_tpu.frontend.flow_mask import flow_residual_mask
from sindslam_tpu.frontend.fusion import fuse_masks
from sindslam_tpu.frontend.orb import extract_orb
from sindslam_tpu.frontend.pipeline import frontend_step, init_state
from sindslam_tpu.frontend.rag_merge import rag_merge
from sindslam_tpu.ops import flow as flow_ops
from sindslam_tpu.ops import image as im

cfg = SystemConfig()
frames = list(generate_sequence(n_frames=4, seed=0, amplitude=0.05))
rgb = jnp.asarray(frames[1][0])
rgb0 = jnp.asarray(frames[0][0])
depth = jnp.asarray(frames[1][1])
gray = im.rgb_to_gray(rgb)
gray0 = im.rgb_to_gray(rgb0)
valid = (depth > 0.05) & (depth <= cfg.dyna.max_depth_m)
key = jax.random.PRNGKey(0)

N = int(os.environ.get("PROF_ITERS", "20"))


def timeit(name, fn, *args):
    out = fn(*args)   # compile
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf).ravel()[0]
    t0 = time.perf_counter()
    for _i in range(N):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf).ravel()[0]
    dt = (time.perf_counter() - t0) / N * 1000
    print(f"{name:34s} {dt:8.2f} ms")
    return out


fflow = jax.jit(lambda a, b: flow_ops.flow_at_working_scale(a, b, cfg.flow))
u, v = timeit("flow_at_working_scale", fflow, gray, gray0)

fkm = jax.jit(lambda d: seg_by_kmeans(d, cfg.camera, cfg.dyna, None))
kml, _ = timeit("seg_by_kmeans", fkm, depth)

fed = jax.jit(lambda d: cal_occluded(d, cfg.camera, cfg.dyna))
er = timeit("cal_occluded", fed, depth)

frm = jax.jit(lambda k, o1, o2, ta, d: rag_merge(k, o1, o2, ta, d, cfg.dyna))
rr = timeit("rag_merge", frm, kml, er.occluded1, er.occluded2, er.total_area,
            depth)

ffm = jax.jit(lambda u, v, w, va, k: flow_residual_mask(u, v, w, va,
                                                        cfg.dyna, k))
fm = timeit("flow_residual_mask", ffm, u, v, jnp.ones_like(gray), valid, key)

ffu = jax.jit(lambda lm, hm, ph, li, va: fuse_masks(lm, hm, ph, li, va,
                                                    cfg.dyna))
fu = timeit("fuse_masks", ffu, fm.low_mask, fm.high_mask,
            jnp.zeros_like(valid), rr.label_img, valid)

forb = jax.jit(lambda g, m: extract_orb(g, m, cfg.orb, height=480, width=640))
timeit("extract_orb", forb, gray, fu.dyna_mask)

state = init_state(cfg, gray0)
out, state = frontend_step(rgb, depth, state, cfg)
timeit("frontend_step (fused)", lambda r, d, s: frontend_step(r, d, s, cfg)[0],
       rgb, depth, state)

# flow sub-breakdown: pyramid construction vs level solves
wh, ww = cfg.flow.working_height, cfg.flow.working_width


def _pyr_only(a, b):
    g1 = im.resize_bilinear(a, (wh, ww))
    g2 = im.resize_bilinear(b, (wh, ww))
    i1 = im.gaussian_blur(g1.astype(jnp.float32) / 255.0, 5, 0.8)
    i2 = im.gaussian_blur(g2.astype(jnp.float32) / 255.0, 5, 0.8)
    shapes = flow_ops.pyramid_shapes(wh, ww, cfg.flow.pyramid_scale,
                                     cfg.flow.n_levels)
    p1, p2 = [i1], [i2]
    for (nh, nw) in shapes[1:]:
        p1.append(im.resize_bilinear(im.gaussian_blur(p1[-1], 5, 0.8), (nh, nw)))
        p2.append(im.resize_bilinear(im.gaussian_blur(p2[-1], 5, 0.8), (nh, nw)))
    return sum(jnp.sum(x) for x in p1 + p2)


timeit("flow: pyramid build only", jax.jit(_pyr_only), gray, gray0)

# single warp + gradient round at the working resolution
i1 = im.gaussian_blur(im.resize_bilinear(gray, (wh, ww)).astype(jnp.float32)
                      / 255.0, 5, 0.8)
i2 = im.gaussian_blur(im.resize_bilinear(gray0, (wh, ww)).astype(jnp.float32)
                      / 255.0, 5, 0.8)
uu = jnp.zeros((wh, ww), jnp.float32)


def _warp_grad(i2, u, v):
    i2w, inb = im.warp_by_flow(i2, u, v)
    gx, gy = im.image_gradients(i2w)
    return jnp.sum(i2w) + jnp.sum(gx) + jnp.sum(gy) + jnp.sum(inb)


timeit("flow: ONE warp+grad @288x384", jax.jit(_warp_grad), i2, uu, uu)

from sindslam_tpu.ops.pallas_kernels import sor_inner_pallas

gx, gy = im.image_gradients(i1)


def _inner(i1, i2, u, v):
    ix, iy = im.image_gradients(i2)
    iz = i2 - i1
    ixx, ixy = im.image_gradients(ix)
    _, iyy = im.image_gradients(iy)
    ixz, _ = im.image_gradients(iz)
    _, iyz = im.image_gradients(iz)
    return sor_inner_pallas(ix, iy, iz, ixx, ixy, iyy, ixz, iyz, u, v,
                            alpha=cfg.flow.alpha, gamma=cfg.flow.gamma,
                            omega=cfg.flow.sor_omega,
                            inner=cfg.flow.inner_iterations,
                            sweeps=cfg.flow.solver_iterations)


timeit("flow: ONE inner solve @288x384", jax.jit(_inner), i1, i2, uu, uu)

fmed = jax.jit(lambda x: im.median_filter(x, 3))
timeit("flow: ONE median filter @288x384", fmed, uu)
