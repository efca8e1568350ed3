#!/usr/bin/env python3
"""Sub-stage timing of extract_orb on TPU (dev tool)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from sindslam_tpu.utils import setup_compilation_cache
setup_compilation_cache()

from sindslam_tpu.config import ORBConfig
from sindslam_tpu.frontend import orb as orb_mod
from sindslam_tpu.ops import image as im

N = int(os.environ.get("PROF_ITERS", "10"))
R = int(os.environ.get("PROF_REPS", "10"))

cfg = ORBConfig()
H, W = 480, 640
shapes, offs, atlas_h = orb_mod._atlas_layout(H, W, cfg.n_levels,
                                              cfg.scale_factor)
rng = np.random.default_rng(0)
atlas = jnp.asarray(rng.standard_normal((atlas_h, W)).astype(np.float32) * 30
                    + 128)
gray = jnp.asarray(rng.standard_normal((H, W)).astype(np.float32) * 30 + 128)
print(f"atlas {atlas_h}x{W} = {atlas_h*W/1e6:.2f} Mpx "
      f"(useful {sum(h*w for h, w in shapes)/1e6:.2f} Mpx)")


def timeit_op(name, op, x0):
    @jax.jit
    def looped(x):
        return lax.fori_loop(0, R, lambda i, x: op(x) * 1e-9 + x, x)

    out = looped(x0)
    _ = np.asarray(out).ravel()[0]
    t0 = time.perf_counter()
    for _i in range(N):
        out = looped(out)
    _ = np.asarray(out).ravel()[0]
    dt = (time.perf_counter() - t0) / (N * R) * 1000
    print(f"{name:44s} {dt:8.3f} ms/op", flush=True)


timeit_op("fast_score_map atlas",
          lambda x: orb_mod.fast_score_map(x, 7.0), atlas)
timeit_op("nms3 atlas", lambda x: orb_mod._nms3(x), atlas)
timeit_op("ic_angle_fields atlas",
          lambda x: sum(orb_mod.ic_angle_fields(x)), atlas)
timeit_op("gaussian_blur7 atlas",
          lambda x: im.gaussian_blur(x, 7, 2.0), atlas)


def cells_all(score_atlas):
    quotas = orb_mod.level_quotas(cfg.n_features, cfg.n_levels,
                                  cfg.scale_factor)
    acc = 0.0
    for (lh, lw), y0, quota in zip(shapes, offs, quotas):
        s = lax.dynamic_slice(score_atlas, (y0, 0), (lh, lw))
        s = orb_mod._border_mask(s, orb_mod._EDGE_MARGIN)
        yx, sc = orb_mod._cell_candidates(s, quota)
        acc = acc + jnp.sum(yx) * 1e-9 + jnp.sum(jnp.where(jnp.isfinite(sc),
                                                           sc, 0.0)) * 1e-9
    return acc + score_atlas[0, 0] * 0


timeit_op("cell_candidates x8 (top_k)", cells_all, atlas)

yx = jnp.asarray(rng.integers(20, 400, (1000, 2)).astype(np.int32))
ang = jnp.asarray(rng.uniform(-3, 3, 1000).astype(np.float32))


def brief(x):
    d = orb_mod.brief_descriptors(x, yx, ang)
    return d.sum().astype(jnp.float32)


timeit_op("brief_descriptors 1000 kp", brief, atlas)

timeit_op("resize chain 8 levels", lambda x: sum(
    jnp.sum(im.resize_bilinear(x[:shapes[l][0] * 2, :shapes[l][1] * 2]
                               if False else gray, shapes[l]))
    for l in range(cfg.n_levels)) * 1e-9 + x[0, 0] * 0, atlas)
