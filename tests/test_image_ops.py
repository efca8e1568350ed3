"""Golden tests for sindslam_tpu.ops.image against OpenCV/scipy references.

OpenCV is used here ONLY as a test oracle — the compute path is pure JAX.
"""

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from sindslam_tpu.ops import image as im


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, (64, 80)).astype(np.float32)
    return cv2.GaussianBlur(base, (5, 5), 1.2)  # smooth-ish natural test image


def test_rgb_to_gray():
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, (32, 40, 3), dtype=np.uint8)
    ours = np.asarray(im.rgb_to_gray(jnp.asarray(rgb)))
    ref = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY).astype(np.float32)
    assert np.abs(ours - ref).max() < 1.0  # rounding differences only


def test_gaussian_blur_interior(img):
    ours = np.asarray(im.gaussian_blur(jnp.asarray(img), ksize=5, sigma=1.5))
    ref = cv2.GaussianBlur(img, (5, 5), 1.5, borderType=cv2.BORDER_REPLICATE)
    np.testing.assert_allclose(ours, ref, atol=1e-2)


def test_median_filter(img):
    ours = np.asarray(im.median_filter(jnp.asarray(img), 5))
    ref = cv2.medianBlur(img.astype(np.float32), 5)
    # cv2 medianBlur on float32 requires ksize<=5; borders differ (replicate both)
    np.testing.assert_allclose(ours[2:-2, 2:-2], ref[2:-2, 2:-2], atol=1e-4)


def test_dilate_erode(img):
    k = np.ones((3, 3), np.uint8)
    ours_d = np.asarray(im.dilate(jnp.asarray(img), 3))
    ref_d = cv2.dilate(img, k, borderType=cv2.BORDER_REPLICATE)
    np.testing.assert_allclose(ours_d, ref_d, atol=1e-5)
    ours_e = np.asarray(im.erode(jnp.asarray(img), 3))
    ref_e = cv2.erode(img, k, borderType=cv2.BORDER_REPLICATE)
    np.testing.assert_allclose(ours_e, ref_e, atol=1e-5)


def test_dilate_iterations(img):
    ours = np.asarray(im.dilate(jnp.asarray(img), 3, iterations=4))
    ref = cv2.dilate(img, np.ones((3, 3), np.uint8), iterations=4,
                     borderType=cv2.BORDER_REPLICATE)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_dilate_ellipse_binary():
    mask = np.zeros((41, 41), np.float32)
    mask[20, 20] = 1.0
    ours = np.asarray(im.dilate_ellipse(jnp.asarray(mask), 15)) > 0.5
    k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (15, 15))
    ref = cv2.dilate(mask, k) > 0.5
    # allow a 1-pixel rim difference in the disc rasterization
    assert (ours & ~ref).sum() + (ref & ~ours).sum() <= 0.15 * ref.sum()
    assert ours[20, 20] and ours[20, 27] and not ours[20, 29]


def test_sobel(img):
    ours_dx, ours_dy = im.sobel(jnp.asarray(img))
    ref_dx = cv2.Sobel(img, cv2.CV_32F, 1, 0, ksize=3, borderType=cv2.BORDER_REPLICATE)
    ref_dy = cv2.Sobel(img, cv2.CV_32F, 0, 1, ksize=3, borderType=cv2.BORDER_REPLICATE)
    np.testing.assert_allclose(np.asarray(ours_dx), ref_dx, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ours_dy), ref_dy, atol=1e-3)


def test_warp_identity(img):
    j = jnp.asarray(img)
    zero = jnp.zeros_like(j)
    out, inb = im.warp_by_flow(j, zero, zero)
    np.testing.assert_allclose(np.asarray(out), img, atol=1e-5)
    assert bool(np.asarray(inb).all())


def test_warp_translation(img):
    j = jnp.asarray(img)
    u = jnp.full(j.shape, 3.0)
    v = jnp.full(j.shape, 2.0)
    out, inb = im.warp_by_flow(j, u, v)
    np.testing.assert_allclose(np.asarray(out)[:-2, :-3], img[2:, 3:], atol=1e-4)
    inb = np.asarray(inb)
    assert not inb[-1, -1] and inb[0, 0]


def test_warp_subpixel_matches_cv2(img):
    j = jnp.asarray(img)
    rng = np.random.default_rng(2)
    u = rng.uniform(-1.5, 1.5, img.shape).astype(np.float32)
    v = rng.uniform(-1.5, 1.5, img.shape).astype(np.float32)
    out, inb = im.warp_by_flow(j, jnp.asarray(u), jnp.asarray(v))
    h, w = img.shape
    mx, my = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    ref = cv2.remap(img, mx + u, my + v, cv2.INTER_LINEAR, borderMode=cv2.BORDER_REPLICATE)
    m = np.asarray(inb)
    np.testing.assert_allclose(np.asarray(out)[m], ref[m], atol=1e-3)


def test_local_max_abs_diff():
    d = np.zeros((16, 16), np.float32)
    d[8:, :] = 10.0
    out = np.asarray(im.local_max_abs_diff(jnp.asarray(d), 5))
    assert out[8, 8] == 10.0 and out[6, 8] == 10.0
    assert out[0, 0] == 0.0 and out[15, 15] == 0.0


def test_histogram_and_otsu():
    rng = np.random.default_rng(3)
    vals = np.concatenate([rng.normal(50, 5, 4000), rng.normal(150, 10, 2000)])
    vals = np.clip(vals, 0, 255).astype(np.float32)
    hist = np.asarray(im.histogram_fixed(jnp.asarray(vals), 256, 0.0, 256.0))
    assert hist.sum() == pytest.approx(len(vals))
    th = float(np.asarray(im.otsu_threshold(jnp.asarray(hist))))
    ref_th, _ = cv2.threshold(vals.reshape(-1, 1).astype(np.uint8), 0, 255,
                              cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    assert abs(th - ref_th) <= 2.0


def test_triangle_threshold():
    rng = np.random.default_rng(4)
    # heavily skewed distribution: big peak near 0, long tail (typical flow
    # residual magnitudes)
    vals = np.concatenate([np.abs(rng.normal(5, 3, 8000)), rng.uniform(30, 120, 400)])
    vals = np.clip(vals, 0, 255).astype(np.uint8)
    hist = np.asarray(im.histogram_fixed(jnp.asarray(vals.astype(np.float32)), 256, 0.0, 256.0))
    th = float(np.asarray(im.triangle_threshold(jnp.asarray(hist))))
    ref_th, _ = cv2.threshold(vals.reshape(-1, 1), 0, 255,
                              cv2.THRESH_BINARY + cv2.THRESH_TRIANGLE)
    assert abs(th - ref_th) <= 4.0


def test_resize_bilinear_shape(img):
    out = im.resize_bilinear(jnp.asarray(img), (32, 40))
    assert out.shape == (32, 40)
    # downsample then upsample roughly preserves smooth content
    back = np.asarray(im.resize_bilinear(out, img.shape))
    assert np.abs(back - img).mean() < 8.0


def test_pyramid_static_shapes(img):
    levels = im.build_pyramid(jnp.asarray(img), 4, 0.5)
    # min_size=16 stops the default pyramid at (16, 20)
    assert len(levels) == 3
    assert levels[1].shape == (32, 40)
    assert levels[2].shape == (16, 20)
    deeper = im.build_pyramid(jnp.asarray(img), 4, 0.5, min_size=8)
    assert len(deeper) == 4 and deeper[3].shape == (8, 10)


def test_connected_relabel():
    mask = np.zeros((32, 48), bool)
    mask[2:10, 2:10] = True          # blob 1
    mask[20:30, 30:45] = True        # blob 2
    mask[5, 20:25] = True            # thin line blob 3
    labels = np.asarray(im.connected_relabel(jnp.asarray(mask), n_iters=16))
    assert (labels[~mask] == 0).all()
    l1 = labels[3, 3]
    assert (labels[2:10, 2:10] == l1).all()
    l2 = labels[25, 35]
    assert (labels[20:30, 30:45] == l2).all()
    ids = np.unique(labels[mask])
    assert len(ids) == 3


def test_connected_relabel_spiral_converges():
    # worst case for pure neighbor propagation; pointer jumping must cover it
    mask = np.zeros((64, 64), bool)
    mask[0, :] = True
    mask[:, -1] = True
    mask[-1, :] = True
    mask[1:, 0] = False
    mask[10:, 5] = True
    mask[10, 5:40] = True
    labels = np.asarray(im.connected_relabel(jnp.asarray(mask), n_iters=64))
    comp_ids = np.unique(labels[mask])
    assert len(comp_ids) == 2  # the C-shaped rim and the T piece


def test_warp_by_flow_mm_matches_gather():
    """The one-hot-matmul warp (TPU fast path) must agree with the gather
    warp: same clamped bilinear semantics, same in-bounds mask."""
    import numpy as np
    from sindslam_tpu.ops import image as im

    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.standard_normal((48, 64)).astype(np.float32))
    u = jnp.asarray((rng.standard_normal((48, 64)) * 4).astype(np.float32))
    v = jnp.asarray((rng.standard_normal((48, 64)) * 4).astype(np.float32))
    a, inb_a = im.warp_by_flow(img, u, v)
    b, inb_b = im.warp_by_flow_mm(img, u, v)
    np.testing.assert_array_equal(np.asarray(inb_a), np.asarray(inb_b))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-2, rtol=0)
    # on CPU (f32 contractions) the agreement is tight
    assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-4


def test_subsample_mm_matches_slice():
    """The selection-matmul subsample (TPU fast path — strided slices lower
    to ~0.8 ms scalar-unit gathers there) must equal the strided slice
    EXACTLY for f32, int32 and bool, at strides 2 and 4, odd and even dims."""
    import numpy as np

    rng = np.random.default_rng(7)
    for (h, w) in [(480, 640), (241, 323)]:
        f = rng.standard_normal((h, w)).astype(np.float32)
        i = rng.integers(0, 33, (h, w)).astype(np.int32)
        b = rng.random((h, w)) > 0.5
        for stride in (2, 4):
            for arr in (f, i, b):
                got = np.asarray(im.subsample(jnp.asarray(arr), stride,
                                              _force_mm=True))
                np.testing.assert_array_equal(got, arr[::stride, ::stride])


def test_block_or2_mm_matches_phases():
    import numpy as np

    rng = np.random.default_rng(8)
    for (h, w) in [(480, 640), (121, 161)]:
        x = rng.random((h, w)) > 0.8
        got = np.asarray(im.block_or2(jnp.asarray(x), _force_mm=True))
        p = np.zeros((h + h % 2, w + w % 2), bool)
        p[:h, :w] = x
        ref = p[::2, ::2] | p[1::2, ::2] | p[::2, 1::2] | p[1::2, 1::2]
        np.testing.assert_array_equal(got, ref)


def test_median_network_matches_sort():
    """The pruned Batcher min/max network is bit-identical to sorting and
    taking the middle element, for every odd k used in the code base."""
    from sindslam_tpu.ops.image import _median_network

    rng = np.random.default_rng(7)
    for k in (3, 5, 9, 25):
        x = rng.normal(size=(k, 23, 31)).astype(np.float32)
        got = np.asarray(_median_network([jnp.asarray(x[i]) for i in range(k)]))
        np.testing.assert_array_equal(got, np.median(x, axis=0))
