"""Real-TPU compile smoke tests (ADVICE r3: interpret-mode parity alone
cannot catch Mosaic-only lowering failures, e.g. the dynamic-slice alignment
class fixed in ``extract_patches_pallas``).

The test suite proper runs on a virtual CPU mesh (conftest forces
JAX_PLATFORMS=cpu), so these tests compile in a SUBPROCESS with the axon TPU
backend. They are @slow and SKIP when no TPU is reachable (tunnel down /
backend init timeout) — on TPU-connected hosts they gate the Mosaic path.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_SCRIPT = r"""
import numpy as np
import jax, jax.numpy as jnp
assert jax.default_backend() == "tpu", jax.default_backend()
from sindslam_tpu.utils import setup_compilation_cache
setup_compilation_cache()
from sindslam_tpu.ops.pallas_kernels import extract_patches_pallas
img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (480, 640)
                                                   ).astype(np.float32))
rng = np.random.default_rng(1)
y0 = jnp.asarray(rng.integers(0, 480 - 28, 125).astype(np.int32))
x0 = jnp.asarray(rng.integers(0, 640 - 28, 125).astype(np.int32))
out = extract_patches_pallas(img, y0, x0, patch=28, group=125,
                             interpret=False)
got = np.asarray(out)
ref = np.stack([np.asarray(img)[int(y):int(y) + 28, int(x):int(x) + 28]
                for y, x in zip(np.asarray(y0), np.asarray(x0))])
np.testing.assert_allclose(got, ref, atol=0)
print("TPU_SMOKE_OK")
"""


def _run_tpu_child(script: str, timeout: int = 600):
    env = dict(os.environ)
    # undo the conftest CPU override for the child: let axon claim the TPU
    env.pop("JAX_PLATFORM_NAME", None)
    env["JAX_PLATFORMS"] = "axon,cpu"
    try:
        r = subprocess.run([sys.executable, "-c", script], env=env,
                           capture_output=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        pytest.skip("TPU backend init/compile timed out (tunnel down?)")
    out = r.stdout.decode(errors="replace")
    err = r.stderr.decode(errors="replace")
    if "TPU_SMOKE_OK" in out:
        return
    # default_backend != tpu (no chip / tunnel down / plugin absent): skip —
    # anything past that assert is a real Mosaic lowering or parity failure
    if "assert jax.default_backend()" in err or "known backends" in err:
        pytest.skip(f"no TPU backend available: {err[-300:]}")
    assert r.returncode == 0 and "TPU_SMOKE_OK" in out, err[-2000:]


def test_extract_patches_compiles_on_tpu():
    _run_tpu_child(_SCRIPT)


# Real-TPU ORB golden parity (r4 verdict #2 done-criterion): the Pallas
# FAST+NMS kernel, the patch extraction, and the one-hot-matmul BRIEF path
# must be EXACT vs the XLA/gather formulations ON THE CHIP. Interpret-mode
# parity missed two real divergences in r4 (approx_max_k recall, bf16 MXU
# rounding before the bit comparisons); this gate runs the same checks as
# tools/diff_orb_tpu.py. Match: the reference's extractor is backend-exact
# between its CPU and CUDA paths (ORBextractor.cc:765-1149).
_ORB_GOLDEN = r"""
import numpy as np
import jax, jax.numpy as jnp
assert jax.default_backend() == "tpu", jax.default_backend()
from sindslam_tpu.utils import setup_compilation_cache
setup_compilation_cache()
from sindslam_tpu.frontend import orb
from sindslam_tpu.ops import image as im
from sindslam_tpu.ops.pallas_kernels import fast_nms_pallas

rng = np.random.RandomState(0)
yy, xx = np.mgrid[0:480, 0:640].astype(np.float32)
img_np = np.clip(96.0 + 60.0 * np.sin(xx / 23.0) * np.cos(yy / 31.0)
                 + 40.0 * ((xx // 40 + yy // 40) % 2)
                 + rng.randn(480, 640).astype(np.float32) * 6.0, 0, 255)
img = jnp.asarray(img_np.astype(np.float32))
blur = im.gaussian_blur(img, 7, 2.0)

# descriptors: mm path vs exact gather path on bin-center angles
r1 = np.random.RandomState(1)
n = 1000
yx = jnp.asarray(np.stack([r1.randint(20, 460, n), r1.randint(20, 620, n)],
                          -1).astype(np.int32))
tau = 2.0 * np.pi / orb._N_ANGLE_BINS
bins = r1.randint(0, orb._N_ANGLE_BINS, n)
ang = jnp.asarray((bins * tau).astype(np.float32))
d_mm = np.asarray(orb._brief_descriptors_mm(blur, yx, ang))
d_gt = np.asarray(orb._brief_descriptors_gather(blur, yx, ang))
assert (d_mm == d_gt).all(), "BRIEF mm path diverges on real TPU"

# FAST + NMS: Pallas kernel vs the XLA field path (19 px interior)
s_pal = np.asarray(fast_nms_pallas(img, 7.0, 20.0))
s_lo = orb.fast_score_map(img, 7.0)
s_hi = jnp.where(s_lo > 20.0, s_lo, 0.0)
s_xla = np.asarray(orb._nms3(jnp.where(s_hi > 0, s_hi + 1000.0, s_lo)))
inner = np.s_[19:-19, 19:-19]
assert ((s_pal > 0) == (s_xla > 0))[inner].all(), "FAST corner set diverges"
both = (s_pal > 0) & (s_xla > 0)
assert np.abs(s_pal - s_xla)[inner][both[inner]].max() == 0.0
print("TPU_SMOKE_OK")
"""


def test_orb_golden_exact_on_tpu():
    _run_tpu_child(_ORB_GOLDEN, timeout=900)
