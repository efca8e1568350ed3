"""Monocular map initializer: parallel H/F model selection + pose recovery.

TPU re-design of the reference's ``Initializer``
(``ORB_SLAM2/src/Initializer.cc``, 931 LoC): the reference launches two
threads that RANSAC a homography and a fundamental matrix over the same 200
eight-point samples (``Initializer.cc:79-96``), scores both by symmetric
transfer error with the chi-square robust weight (``:131-227``), picks H when
``SH / (SH + SF) > 0.40`` (``:100-105``), and reconstructs R, t (+
triangulated structure) from the winning model (``:449-755``).

Here both model families are ONE batched least-squares each (vmapped over all
RANSAC hypotheses at once — the TPU replacement for the thread pair), scoring
is a dense (hypotheses x points) residual matrix, and the H/F decomposition +
cheirality test run on the host on the tiny winning model. Unused by the
RGB-D pipeline (like the reference's RGB-D path); exercised by the monocular
initialization tests.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from sindslam_tpu.config import CameraConfig

# bf16 MXU default would round DLT design matrices / rotations (see
# geometry/se3.py::_mm); all initializer algebra is tiny, force exact f32.
_HI = jax.lax.Precision.HIGHEST


class InitResult(NamedTuple):
    ok: bool
    model: str                 # "H" or "F"
    R: np.ndarray              # (3, 3) rotation cam1 -> cam2
    t: np.ndarray              # (3,) unit-norm translation
    points3d: np.ndarray       # (N, 3) triangulated points (cam1 frame)
    inliers: np.ndarray        # (N,) bool
    score_h: float
    score_f: float


def _normalize(pts: jnp.ndarray, valid: jnp.ndarray
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hartley normalization (mean 0, mean abs dev 1), as the reference's
    ``Initializer::Normalize`` (``Initializer.cc:768-799``)."""
    w = valid.astype(jnp.float32)
    n = jnp.maximum(w.sum(), 1.0)
    mean = (pts * w[:, None]).sum(0) / n
    d = jnp.abs(pts - mean) * w[:, None]
    md = jnp.maximum(d.sum(0) / n, 1e-6)
    s = 1.0 / md
    T = jnp.array([[s[0], 0.0, -mean[0] * s[0]],
                   [0.0, s[1], -mean[1] * s[1]],
                   [0.0, 0.0, 1.0]], jnp.float32)
    return (pts - mean) * s[None, :], T


def _dlt_homography(p1: jnp.ndarray, p2: jnp.ndarray,
                    w: jnp.ndarray | None = None) -> jnp.ndarray:
    """H from N >= 4 correspondences (DLT, ``Initializer::ComputeH21``);
    optional per-correspondence weights enable the all-inlier refit."""
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    r1 = jnp.stack([z, z, z, -x1, -y1, -o, y2 * x1, y2 * y1, y2], -1)
    r2 = jnp.stack([x1, y1, o, z, z, z, -x2 * x1, -x2 * y1, -x2], -1)
    A = jnp.concatenate([r1, r2], 0)                     # (2N, 9)
    if w is not None:
        A = A * jnp.concatenate([w, w], 0)[:, None]
    # smallest right singular vector via eigh of A^T A (9x9)
    M = jnp.matmul(A.T, A, precision=_HI)
    w_, v = jnp.linalg.eigh(M)
    h = v[:, 0]
    return h.reshape(3, 3)


def _eight_point_f(p1: jnp.ndarray, p2: jnp.ndarray,
                   w: jnp.ndarray | None = None) -> jnp.ndarray:
    """F from N >= 8 correspondences (``Initializer::ComputeF21``), with the
    rank-2 projection; optional weights enable the all-inlier refit."""
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    o = jnp.ones_like(x1)
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, o], -1)
    if w is not None:
        A = A * w[:, None]
    M = jnp.matmul(A.T, A, precision=_HI)
    w_, v = jnp.linalg.eigh(M)
    F = v[:, 0].reshape(3, 3)
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[2].set(0.0)
    return jnp.matmul(U * S[None, :], Vt, precision=_HI)


def _h_transfer_err(H: jnp.ndarray, p1: jnp.ndarray, p2: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Squared symmetric transfer errors (1->2, 2->1)."""
    def apply(H, p):
        q = jnp.matmul(p, H[:, :2].T, precision=_HI) + H[:, 2][None, :]
        return q[:, :2] / jnp.where(jnp.abs(q[:, 2:3]) > 1e-9, q[:, 2:3], 1e-9)

    e12 = jnp.sum((apply(H, p1) - p2) ** 2, -1)
    Hi = jnp.linalg.inv(H + 1e-12 * jnp.eye(3))
    e21 = jnp.sum((apply(Hi, p2) - p1) ** 2, -1)
    return e12, e21


def _f_epipolar_err(F: jnp.ndarray, p1: jnp.ndarray, p2: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Squared point-to-epipolar-line distances (both directions)."""
    o = jnp.ones((p1.shape[0], 1), p1.dtype)
    h1 = jnp.concatenate([p1, o], -1)
    h2 = jnp.concatenate([p2, o], -1)
    l2 = jnp.matmul(h1, F.T, precision=_HI)            # lines in image 2
    l1 = jnp.matmul(h2, F, precision=_HI)
    num2 = jnp.sum(l2 * h2, -1) ** 2
    num1 = jnp.sum(l1 * h1, -1) ** 2
    e2 = num2 / jnp.maximum(l2[:, 0] ** 2 + l2[:, 1] ** 2, 1e-12)
    e1 = num1 / jnp.maximum(l1[:, 0] ** 2 + l1[:, 1] ** 2, 1e-12)
    return e1, e2


@functools.partial(jax.jit, static_argnames=("n_hyp",))
def _ransac_models(p1: jnp.ndarray, p2: jnp.ndarray, valid: jnp.ndarray,
                  key: jax.Array, sigma: float = 1.0, n_hyp: int = 200):
    """All RANSAC hypotheses for H and F in two batched solves.

    Returns (best H, score) and (best F, score) under the reference's
    chi-square truncated scoring (``Initializer.cc:462-568``: th 5.991 for H,
    3.84/5.991 for F, score accumulates (thScore - err/sigma^2))."""
    n = p1.shape[0]
    p1n, T1 = _normalize(p1, valid)
    p2n, T2 = _normalize(p2, valid)

    # sample 8-point minimal sets WITHOUT replacement per hypothesis
    # (Gumbel top-k over the valid indices — duplicate correspondences in a
    # minimal set make the DLT solve degenerate; the reference samples
    # without replacement, Initializer.cc RANSAC set construction)
    logw = jnp.log(valid.astype(jnp.float32) + 1e-12)
    g = jax.random.gumbel(key, (n_hyp, n)) + logw[None]
    _, idx = jax.lax.top_k(g, 8)                        # (n_hyp, 8) distinct
    s1 = p1n[idx]                                       # (n_hyp, 8, 2)
    s2 = p2n[idx]

    Hs = jax.vmap(_dlt_homography)(s1, s2)              # (n_hyp, 3, 3)
    Fs = jax.vmap(_eight_point_f)(s1, s2)

    inv_s2 = 1.0 / (sigma * sigma)
    th = 5.991

    def score_h(H):
        e12, e21 = _h_transfer_err(H, p1n, p2n)
        # normalized coords: rescale errors to pixel^2 via T scales
        c1 = e21 / (T1[0, 0] * T1[1, 1])
        c2 = e12 / (T2[0, 0] * T2[1, 1])
        s = (jnp.where((c1 * inv_s2 < th) & valid, th - c1 * inv_s2, 0.0)
             + jnp.where((c2 * inv_s2 < th) & valid, th - c2 * inv_s2, 0.0))
        return s.sum()

    def score_f(F):
        e1, e2 = _f_epipolar_err(F, p1n, p2n)
        c1 = e1 / (T1[0, 0] * T1[1, 1])
        c2 = e2 / (T2[0, 0] * T2[1, 1])
        ok1 = c1 * inv_s2 < 3.841
        ok2 = c2 * inv_s2 < 3.841
        s = (jnp.where(ok1 & valid, th - c1 * inv_s2, 0.0)
             + jnp.where(ok2 & valid, th - c2 * inv_s2, 0.0))
        return s.sum()

    sh = jax.vmap(score_h)(Hs)
    sf = jax.vmap(score_f)(Fs)
    bh = jnp.argmax(sh)
    bf = jnp.argmax(sf)

    # refit each winner on ITS FULL INLIER SET (overdetermined, weighted
    # rows): an 8-point minimal-sample model is noisy; the reference
    # effectively achieves this through 200 iterations of scoring — the
    # all-inlier least-squares refit is the direct estimator
    def refit(model_n, is_h):
        if is_h:
            e12, e21 = _h_transfer_err(model_n, p1n, p2n)
            c1 = e21 / (T1[0, 0] * T1[1, 1])
            c2 = e12 / (T2[0, 0] * T2[1, 1])
            w = ((c1 * inv_s2 < th) & (c2 * inv_s2 < th) & valid
                 ).astype(jnp.float32)
            return _dlt_homography(p1n, p2n, w)
        e1, e2 = _f_epipolar_err(model_n, p1n, p2n)
        c1 = e1 / (T1[0, 0] * T1[1, 1])
        c2 = e2 / (T2[0, 0] * T2[1, 1])
        w = ((c1 * inv_s2 < 3.841) & (c2 * inv_s2 < 3.841) & valid
             ).astype(jnp.float32)
        return _eight_point_f(p1n, p2n, w)

    Hn = refit(Hs[bh], True)
    Fn = refit(Fs[bf], False)
    # keep the refit only if it scores at least as well
    Hn = jnp.where(score_h(Hn) >= sh[bh], Hn, Hs[bh])
    Fn = jnp.where(score_f(Fn) >= sf[bf], Fn, Fs[bf])
    sh_best = jnp.maximum(score_h(Hn), sh[bh])
    sf_best = jnp.maximum(score_f(Fn), sf[bf])

    # denormalize: H21 = T2^-1 Hn T1 ; F21 = T2^T Fn T1
    H = jnp.linalg.inv(T2) @ Hn @ T1
    F = jnp.matmul(jnp.matmul(T2.T, Fn, precision=_HI), T1, precision=_HI)

    # inlier flags for the winners (pixel-space errors)
    eh12, eh21 = _h_transfer_err(H, p1, p2)
    inl_h = (eh12 * inv_s2 < th) & (eh21 * inv_s2 < th) & valid
    ef1, ef2 = _f_epipolar_err(F, p1, p2)
    inl_f = (ef1 * inv_s2 < 3.841) & (ef2 * inv_s2 < 3.841) & valid
    return H, sh_best, inl_h, F, sf_best, inl_f


def _triangulate(R: np.ndarray, t: np.ndarray, K: np.ndarray,
                 p1: np.ndarray, p2: np.ndarray) -> np.ndarray:
    """Linear two-view triangulation (``Initializer::Triangulate``)."""
    P1 = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
    P2 = K @ np.hstack([R, t[:, None]])
    n = p1.shape[0]
    out = np.zeros((n, 3))
    A = np.zeros((n, 4, 4))
    A[:, 0] = p1[:, 0:1] * P1[2] - P1[0]
    A[:, 1] = p1[:, 1:2] * P1[2] - P1[1]
    A[:, 2] = p2[:, 0:1] * P2[2] - P2[0]
    A[:, 3] = p2[:, 1:2] * P2[2] - P2[1]
    _, _, Vt = np.linalg.svd(A)
    X = Vt[:, 3]
    out = X[:, :3] / np.where(np.abs(X[:, 3:]) > 1e-12, X[:, 3:], 1e-12)
    return out


def _check_rt(R: np.ndarray, t: np.ndarray, K: np.ndarray, p1: np.ndarray,
              p2: np.ndarray, max_reproj: float = 4.0
              ) -> Tuple[int, np.ndarray, np.ndarray, float]:
    """Cheirality + reprojection test (``Initializer::CheckRT``). Also
    measures the triangulation parallax (degrees) of the reconstruction —
    the reference's CheckRT returns it and ReconstructF/H require a floor
    before accepting a pose."""
    X = _triangulate(R, t, K, p1, p2)
    z1 = X[:, 2]
    X2 = jnp.matmul(X, R.T, precision=_HI) + t
    z2 = X2[:, 2]
    pr1 = (X / np.maximum(z1[:, None], 1e-9)) @ K.T
    pr2 = (X2 / np.maximum(z2[:, None], 1e-9)) @ K.T
    e1 = np.sum((pr1[:, :2] - p1) ** 2, -1)
    e2 = np.sum((pr2[:, :2] - p2) ** 2, -1)
    good = (z1 > 0) & (z2 > 0) & (e1 < max_reproj ** 2) & (e2 < max_reproj ** 2)
    parallax_deg = 0.0
    if good.any():
        O2 = -jnp.matmul(R.T, t, precision=_HI)  # camera-2 center in cam-1 frame
        n1 = X[good]
        n2 = X[good] - O2
        cosp = np.sum(n1 * n2, -1) / np.maximum(
            np.linalg.norm(n1, axis=-1) * np.linalg.norm(n2, axis=-1), 1e-12)
        cosp = np.sort(np.clip(cosp, -1.0, 1.0))
        # the reference takes the 50th-largest-parallax point (CheckRT)
        idx = min(50, len(cosp)) - 1
        parallax_deg = float(np.degrees(np.arccos(cosp[idx])))
    return int(good.sum()), good, X, parallax_deg


def _decompose_f(F: np.ndarray, K: np.ndarray):
    """E = K^T F K -> 4 (R, t) candidates (``Initializer::ReconstructF``)."""
    E = jnp.matmul(jnp.matmul(K.T, F, precision=_HI), K, precision=_HI)
    U, _S, Vt = np.linalg.svd(E)
    if np.linalg.det(U) < 0:
        U = -U
    if np.linalg.det(Vt) < 0:
        Vt = -Vt
    W = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], float)
    R1 = jnp.matmul(jnp.matmul(U, W, precision=_HI), Vt, precision=_HI)
    R2 = jnp.matmul(jnp.matmul(U, W.T, precision=_HI), Vt, precision=_HI)
    tt = U[:, 2]
    tt = tt / max(np.linalg.norm(tt), 1e-12)
    return [(R1, tt), (R1, -tt), (R2, tt), (R2, -tt)]


def _decompose_h(H: np.ndarray, K: np.ndarray):
    """Faugeras-style homography decomposition candidates
    (``Initializer::ReconstructH``, 8 solutions reduced to the physical set
    by the cheirality test downstream)."""
    A = np.linalg.inv(K) @ H @ K
    U, S, Vt = np.linalg.svd(A)
    s = np.linalg.det(U) * np.linalg.det(Vt)
    d1, d2, d3 = S
    if d1 / d2 < 1.0001 or d2 / d3 < 1.0001:
        return []  # degenerate (pure rotation); reference rejects too
    # Faugeras SVD-based solutions
    aux1 = np.sqrt(max((d1 * d1 - d2 * d2) / (d1 * d1 - d3 * d3), 0.0))
    aux3 = np.sqrt(max((d2 * d2 - d3 * d3) / (d1 * d1 - d3 * d3), 0.0))
    x1s = [aux1, aux1, -aux1, -aux1]
    x3s = [aux3, -aux3, aux3, -aux3]
    out = []
    aux_st = np.sqrt(max((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / \
        ((d1 + d3) * d2)
    ct = (d2 * d2 + d1 * d3) / ((d1 + d3) * d2)
    for x1, x3 in zip(x1s, x3s):
        st = aux_st * np.sign(x1 * x3) if x1 * x3 != 0 else aux_st
        Rp = np.array([[ct, 0, -st], [0, 1, 0], [st, 0, ct]])
        tp = (d1 - d3) * np.array([x1, 0, -x3])
        R = s * jnp.matmul(jnp.matmul(U, Rp, precision=_HI), Vt, precision=_HI)
        t = jnp.matmul(U, tp, precision=_HI)
        t = t / max(np.linalg.norm(t), 1e-12)
        out.append((R, t))
    # n'=(x1,0,x3) negative-depth branch
    aux_sp = np.sqrt(max((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / \
        ((d1 - d3) * d2)
    cp = (d1 * d3 - d2 * d2) / ((d1 - d3) * d2)
    for x1, x3 in zip(x1s, x3s):
        sp = aux_sp * np.sign(x1 * x3) if x1 * x3 != 0 else aux_sp
        Rp = np.array([[cp, 0, sp], [0, -1, 0], [sp, 0, -cp]])
        tp = (d1 + d3) * np.array([x1, 0, x3])
        R = s * jnp.matmul(jnp.matmul(U, Rp, precision=_HI), Vt, precision=_HI)
        t = jnp.matmul(U, tp, precision=_HI)
        t = t / max(np.linalg.norm(t), 1e-12)
        out.append((R, t))
    return out


def initialize_monocular(
    kp1: np.ndarray, kp2: np.ndarray, valid: np.ndarray,
    cam: CameraConfig, seed: int = 0, sigma: float = 1.0,
    min_inliers: int = 50, ambiguity_ratio: float = 0.75,
    min_parallax_deg: float = 1.0,
) -> Optional[InitResult]:
    """Two-view monocular initialization over matched keypoint arrays.

    kp1/kp2: (N, 2) pixel coords of matched keypoints, valid: (N,) bool.
    Returns None when no model wins (low support / degenerate geometry).
    Model selection: SH / (SH + SF) > 0.40 -> homography
    (``Initializer.cc:100-105``).
    """
    K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]], float)
    key = jax.random.PRNGKey(seed)
    H, sh, inl_h, F, sf, inl_f = _ransac_models(
        jnp.asarray(kp1, jnp.float32), jnp.asarray(kp2, jnp.float32),
        jnp.asarray(valid), key, sigma)
    H = np.asarray(H, float)
    F = np.asarray(F, float)
    sh = float(sh)
    sf = float(sf)
    use_h = sh / max(sh + sf, 1e-9) > 0.40
    inl = np.asarray(inl_h if use_h else inl_f)
    if inl.sum() < min_inliers:
        return None
    cands = _decompose_h(H, K) if use_h else _decompose_f(F, K)
    if not cands:
        return None
    p1 = kp1[inl]
    p2 = kp2[inl]
    best = None
    counts = []
    for R, t in cands:
        n_good, good, X, par = _check_rt(R, t, K, p1, p2)
        counts.append(n_good)
        if best is None or n_good > best[0]:
            best = (n_good, R, t, good, X, par)
    counts.sort(reverse=True)
    # the winner must dominate ambiguity at the reference's ratio
    # (ReconstructF: secondBest < 0.75 * best) AND reconstruct with real
    # triangulation parallax (minParallax 1.0 deg) — a near-tie or a
    # zero-parallax cheirality outcome is a confidently wrong pose
    if best[0] < min_inliers or (len(counts) > 1
                                 and counts[1] > ambiguity_ratio * counts[0]):
        return None
    if best[5] < min_parallax_deg:
        return None
    n_good, R, t, good, X, _par = best
    inliers = np.zeros(len(kp1), bool)
    inliers[np.where(inl)[0][good]] = True
    return InitResult(ok=True, model="H" if use_h else "F", R=R, t=t,
                      points3d=X[good], inliers=inliers,
                      score_h=sh, score_f=sf)
