"""Depth occlusion edges + blockwise plane segmentation (PEAC equivalent).

Re-implements ``CalOccluded`` (reference ``ORB_SLAM2/src/DynaDetect.cc:
429-642``) and the role of the vendored PEAC AHC plane fitter
(``include/PEAC/``) with TPU-native formulations:

- Depth gradient ("occlusion") edges: 5x5 median-filtered depth, local 5x5
  max |diff| > max(3% depth, 400 mm)  (``:436-482``).
- Edge endpoints: 12-point ring neighbor count <= 4, NMS radius 6
  (``:498-536``, ring ``include/DynaDetect.h:113-125``).
- Plane segmentation: instead of PEAC's sequential agglomerative merge queue
  (``AHCPlaneFitter.hpp:186-237``) — inherently serial — planes are fitted
  per 16x16 block by closed-form 3x3 eigendecomposition (the same primitive
  as PEAC's ``eig33sym.hpp``), compatible neighboring blocks are merged by
  fixed-iteration min-label propagation on the block graph, and pixels join
  their block's plane by point-to-plane distance with a few geodesic growth
  sweeps (the role of ``refineDetails``). Plane contours (thickness 2) are
  emitted like the reference's modified PEAC (``AHCPlaneFitter.hpp:340-401``).
- Output: imgTotalArea (valid 0-6 m), imgOccluded1 (gradient + kept plane
  edges), imgOccluded2 (plane edges), per ``:639-641``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from sindslam_tpu.config import CameraConfig, DynaConfig
from sindslam_tpu.ops import image as im

# 12-point ring (radius ~3) used for the endpoint test.
_RING12 = [(-3, -1), (-3, 1), (-1, -3), (-1, 3), (1, -3), (1, 3), (3, -1),
           (3, 1), (-3, -3), (-3, 3), (3, -3), (3, 3)]


class EdgeResult(NamedTuple):
    total_area: jnp.ndarray   # bool (H, W): valid depth 0-6 m
    occluded1: jnp.ndarray    # bool: gradient edges + kept plane edges
    occluded2: jnp.ndarray    # bool: kept plane edges only
    grad_edge: jnp.ndarray    # bool: depth gradient edges
    endpoints: jnp.ndarray    # bool: NMS'd edge endpoints
    plane_labels: jnp.ndarray  # int32 (H, W): plane id or -1


def depth_gradient_edges(depth_m: jnp.ndarray, cfg: DynaConfig
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(grad_edge bool, total_area bool)."""
    valid = (depth_m > 0.05) & (depth_m <= cfg.max_depth_m)
    dmm = jnp.where(valid, depth_m * 1000.0, 0.0)
    med = im.median_filter(dmm, cfg.median_ksize)
    diff = im.local_max_abs_diff(med, cfg.median_ksize)
    thresh = jnp.maximum(cfg.depth_edge_rel * med, cfg.depth_edge_abs_mm)
    edge = (diff > thresh) & valid
    return edge, valid


def edge_endpoints(edge: jnp.ndarray, cfg: DynaConfig) -> jnp.ndarray:
    """Endpoints of edge curves: edge pixels with <= 4 edge neighbors on the
    12-point ring, locally suppressed within ``endpoint_nms_radius``."""
    h, w = edge.shape
    e = edge.astype(jnp.float32)
    p = jnp.pad(e, 3)
    ring_count = sum(p[3 + dy:3 + dy + h, 3 + dx:3 + dx + w] for dy, dx in _RING12)
    # also require some local edge support so isolated noise pixels don't count
    local = im.box_filter(e, 3) * 9.0
    cand = edge & (ring_count <= 4) & (local >= 2.0)
    # NMS: keep the strongest candidate in each radius-6 disc. Priority =
    # endpoint-ness (fewer edge neighbors on the ring = more terminal, the
    # quantity the reference's along-curve suppression favors,
    # DynaDetect.cc:110-143), tie-broken by scan order (earlier pixel wins).
    idx = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
           + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1))
    strength = (5 - ring_count.astype(jnp.int32)) << 20
    pri = jnp.where(cand, strength + (h * w - idx), 0)
    k = 2 * cfg.endpoint_nms_radius + 1
    local_max = im.dilate(pri, k)
    return cand & (pri == local_max)


def _block_plane_fit(depth_m: jnp.ndarray, cam: CameraConfig, cfg: DynaConfig):
    """Fit a plane per BxB block. Returns (normals (bh, bw, 3), offsets
    (bh, bw), mse (bh, bw), frac_valid (bh, bw), mean (bh, bw, 3))."""
    B = cfg.plane_block
    h, w = depth_m.shape
    bh, bw = h // B, w // B
    vs = jnp.arange(h, dtype=jnp.float32)[:, None]
    us = jnp.arange(w, dtype=jnp.float32)[None, :]
    zmin = cfg.plane_z_min_mm / 1000.0
    zmax = cfg.plane_z_max_mm / 1000.0
    valid = (depth_m > zmin) & (depth_m <= zmax)
    z = jnp.where(valid, depth_m, 0.0)
    x = (us - cam.cx) / cam.fx * z
    y = (vs - cam.cy) / cam.fy * z
    pts = jnp.stack([x, y, z], axis=-1)

    pb = pts[:bh * B, :bw * B].reshape(bh, B, bw, B, 3).transpose(0, 2, 1, 3, 4
                 ).reshape(bh, bw, B * B, 3)
    vb = valid[:bh * B, :bw * B].reshape(bh, B, bw, B).transpose(0, 2, 1, 3
                 ).reshape(bh, bw, B * B).astype(jnp.float32)
    n = jnp.sum(vb, axis=-1)
    mean = jnp.sum(pb * vb[..., None], axis=2) / jnp.maximum(n[..., None], 1.0)
    d = (pb - mean[:, :, None, :]) * vb[..., None]
    cov = jnp.einsum("ijka,ijkb->ijab", d, d,
                     precision=jax.lax.Precision.HIGHEST) / jnp.maximum(
        n[..., None, None], 1.0)
    mse, normal = _sym3x3_min_eig(cov)
    # orient normals toward the camera (z component negative)
    normal = normal * jnp.where(normal[..., 2:3] > 0, -1.0, 1.0)
    offset = jnp.sum(normal * mean, axis=-1)
    return normal, offset, mse, n / (B * B), mean


def _sym3x3_min_eig(A: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Smallest eigenvalue + eigenvector of batched symmetric 3x3 matrices.

    Closed form (the same primitive as PEAC's ``eig33sym.hpp``): eigenvalues
    by the trigonometric method (Smith 1961), eigenvector as the largest
    cross product of two rows of (A - lambda_min I). Pure element-wise ops —
    batched ``jnp.linalg.eigh`` lowers to an iterative solver that is far
    slower on TPU for tiny matrices.
    """
    a00 = A[..., 0, 0]
    a11 = A[..., 1, 1]
    a22 = A[..., 2, 2]
    a01 = A[..., 0, 1]
    a02 = A[..., 0, 2]
    a12 = A[..., 1, 2]
    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = (b00 * b00 + b11 * b11 + b22 * b22
          + 2.0 * (a01 * a01 + a02 * a02 + a12 * a12))
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    # det(B) / (2 p^3), clamped into arccos domain
    detB = (b00 * (b11 * b22 - a12 * a12)
            - a01 * (a01 * b22 - a12 * a02)
            + a02 * (a01 * a12 - b11 * a02))
    r = jnp.clip(detB / (2.0 * p * p * p), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    # eig1 >= eig2 >= eig3
    eig1 = q + 2.0 * p * jnp.cos(phi)
    eig3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    lam = jnp.where(p2 > 1e-24, eig3, q)        # isotropic fallback

    # rows of (A - lam I); eigenvector = the largest pairwise cross product
    r0 = jnp.stack([a00 - lam, a01, a02], axis=-1)
    r1 = jnp.stack([a01, a11 - lam, a12], axis=-1)
    r2 = jnp.stack([a02, a12, a22 - lam], axis=-1)
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    best = jnp.where(((n01 >= n02) & (n01 >= n12))[..., None], c01,
                     jnp.where((n02 >= n12)[..., None], c02, c12))
    nrm = jnp.sqrt(jnp.maximum(jnp.sum(best * best, axis=-1, keepdims=True),
                               1e-30))
    v = best / nrm
    # degenerate (isotropic) blocks: any unit vector is valid; use +z
    iso = (jnp.maximum(n01, jnp.maximum(n02, n12)) < 1e-24)[..., None]
    v = jnp.where(iso, jnp.array([0.0, 0.0, 1.0]), v)
    return jnp.maximum(lam, 0.0), v


def plane_segmentation(depth_m: jnp.ndarray, cam: CameraConfig, cfg: DynaConfig
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Segment near-planar regions. Returns ((H, W) int32 plane labels or -1,
    (H, W) bool plane contours)."""
    B = cfg.plane_block
    h, w = depth_m.shape
    normal, offset, mse, frac, mean = _block_plane_fit(depth_m, cam, cfg)
    bh, bw = mse.shape
    z_mean = jnp.maximum(mean[..., 2], 0.3)
    # depth-dependent planarity tolerance (PEAC's sigma grows ~ z^2)
    tol = jnp.maximum(0.009, 0.004 * z_mean + 0.002 * z_mean * z_mean)
    planar = (frac > 0.75) & (mse < tol * tol)

    # --- merge compatible neighbor blocks: min-label propagation
    init = jnp.where(planar,
                     jnp.arange(bh * bw, dtype=jnp.int32).reshape(bh, bw) + 1, 0)

    def compatible(shift_y, shift_x):
        n2 = jnp.roll(jnp.roll(normal, shift_y, 0), shift_x, 1)
        o2 = jnp.roll(jnp.roll(offset, shift_y, 0), shift_x, 1)
        p2 = jnp.roll(jnp.roll(planar, shift_y, 0), shift_x, 1)
        dot = jnp.sum(normal * n2, axis=-1)
        ok = (dot > cfg.plane_merge_cos) & (jnp.abs(offset - o2) < 3.0 * tol)
        # forbid wrap-around at borders
        ys = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1)
        inb = jnp.ones((bh, bw), bool)
        if shift_y == 1:
            inb &= ys > 0
        if shift_y == -1:
            inb &= ys < bh - 1
        if shift_x == 1:
            inb &= xs > 0
        if shift_x == -1:
            inb &= xs < bw - 1
        return ok & planar & p2 & inb

    comp = [(compatible(dy, dx), dy, dx)
            for dy, dx in [(1, 0), (-1, 0), (0, 1), (0, -1)]]

    def prop(labels, _):
        best = labels
        for ok, dy, dx in comp:
            neigh = jnp.roll(jnp.roll(labels, dy, 0), dx, 1)
            cand = jnp.where(ok & (neigh > 0), neigh, jnp.iinfo(jnp.int32).max)
            best = jnp.minimum(best, jnp.where(best > 0, cand, best))
        # pointer jumping on the flat block grid
        jumped = jnp.take(best.reshape(-1), jnp.maximum(best - 1, 0).reshape(-1)
                          ).reshape(bh, bw)
        best = jnp.where((best > 0) & (jumped > 0), jnp.minimum(best, jumped), best)
        return best, None

    # unrolled: each iteration is ~10 tiny block-grid ops, pure loop latency
    # as a while-loop (r3 ablation)
    block_labels, _ = lax.scan(prop, init, None, length=24, unroll=24)

    # --- per-pixel assignment: point-to-plane distance against own block
    vs = jnp.arange(h, dtype=jnp.float32)[:, None]
    us = jnp.arange(w, dtype=jnp.float32)[None, :]
    zmin = cfg.plane_z_min_mm / 1000.0
    zmax = cfg.plane_z_max_mm / 1000.0
    pvalid = (depth_m > zmin) & (depth_m <= zmax)
    z = jnp.where(pvalid, depth_m, 0.0)
    pts = jnp.stack([(us - cam.cx) / cam.fx * z, (vs - cam.cy) / cam.fy * z, z],
                    axis=-1)
    # block->pixel broadcast by repeat + edge pad (NOT row/col gathers: the
    # arr[by][:, bx] form lowered to ~2 Mpx of point gathers on this TPU
    # runtime — r3 trace, edges.py:236-239)
    def _block_up(a):
        up = jnp.repeat(jnp.repeat(a, B, axis=0), B, axis=1)
        ph, pw = h - up.shape[0], w - up.shape[1]
        if ph or pw:
            up = jnp.pad(up, [(0, ph), (0, pw)] + [(0, 0)] * (a.ndim - 2),
                         mode="edge")
        return up

    n_img = _block_up(normal)
    o_img = _block_up(offset)
    lbl_img = _block_up(block_labels)
    tol_img = _block_up(3.0 * tol)
    dist = jnp.abs(jnp.sum(n_img * pts, axis=-1) - o_img)
    plane_px = jnp.where((lbl_img > 0) & (dist < tol_img) & pvalid, lbl_img, 0)

    # --- drop small planes (min support, PEAC FitterAllParams minSupport=2000).
    # Pixel labels are block labels broadcast per pixel, so per-label support
    # = segment_sum of per-BLOCK pass counts over the tiny block grid — a
    # 1.2k-element scatter instead of a 307k-element one (scatters serialize
    # on TPU).
    passed = (plane_px > 0).astype(jnp.float32)
    blk_cnt = passed[:bh * B, :bw * B].reshape(bh, B, bw, B).sum(axis=(1, 3))
    areas = jax.ops.segment_sum(blk_cnt.reshape(-1),
                                block_labels.reshape(-1),
                                num_segments=bh * bw + 1)
    keep = areas >= cfg.plane_min_support
    # broadcast keep back through the block grid (static row/col indexing)
    # rather than a 307k-pixel dynamic gather
    keep_img = _block_up(keep[block_labels])
    plane_px = jnp.where(keep_img & (plane_px > 0), plane_px, 0)

    labels = jnp.where(plane_px > 0, plane_px, -1).astype(jnp.int32)

    # --- contours: plane boundary pixels, thickness 2 (dilate the boundary)
    lab = plane_px
    p = jnp.pad(lab, 1, mode="edge")
    differs = ((p[0:h, 1:w + 1] != lab) | (p[2:h + 2, 1:w + 1] != lab)
               | (p[1:h + 1, 0:w] != lab) | (p[1:h + 1, 2:w + 2] != lab))
    boundary = differs & (lab > 0)
    contours = im.dilate(boundary.astype(jnp.float32), 3) > 0.5
    return labels, contours


@functools.partial(jax.jit, static_argnames=("cam", "cfg"))
def cal_occluded(depth_m: jnp.ndarray, cam: CameraConfig, cfg: DynaConfig
                 ) -> EdgeResult:
    """Full CalOccluded pipeline (reference ``DynaDetect.cc:429-642``)."""
    grad_edge, total_area = depth_gradient_edges(depth_m, cfg)
    endpoints = edge_endpoints(grad_edge, cfg)
    plane_labels, plane_contours = plane_segmentation(depth_m, cam, cfg)

    # plane contours that are NOT already explained by gradient edges, kept
    # only where they touch an (dilated) endpoint — the reference's rule for
    # promoting plane-intersection edges (``:558-637``)
    grad_wide = im.dilate(grad_edge.astype(jnp.float32), 3) > 0.5
    cand = plane_contours & ~grad_wide
    near_endpoint = im.dilate(endpoints.astype(jnp.float32), 13) > 0.5
    kept_plane = cand & near_endpoint

    occluded1 = (grad_edge | kept_plane) & total_area
    occluded2 = kept_plane & total_area
    return EdgeResult(total_area=total_area, occluded1=occluded1,
                      occluded2=occluded2, grad_edge=grad_edge,
                      endpoints=endpoints, plane_labels=plane_labels)
