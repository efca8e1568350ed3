"""sindslam_tpu — a TPU-native (JAX/XLA/Pallas) dynamic RGB-D SLAM framework.

A brand-new implementation of the capabilities of SInDSLAM (IEEE TCSVT 2024,
reference: qimao7213/SInDSLAM): semantic-independent dynamic-scene RGB-D SLAM
that detects moving regions from dense optical-flow residuals fused with
depth-guided geometric re-clustering, erases dynamic ORB features before
tracking, and builds a dense static point-cloud/voxel map.

Architecture (TPU-first, not a port):
  - The whole per-frame front-end (variational optical flow, k-means
    re-clustering, depth/plane edges, region-adjacency merging, flow-residual
    masking, ORB extraction) is one fused, statically-shaped XLA computation
    per frame; the hot inner loops are Pallas TPU kernels.
  - Pose tracking and bundle adjustment are batched Gauss-Newton in JAX
    (replacing the reference's g2o pointer-graph optimizer).
  - Dense mapping is batched back-projection + scatter voxelization
    (replacing octomap insertRay loops); a C++ runtime provides the
    asynchronous host-side pipeline and spatially-hashed voxel store.

Layer map mirrors SURVEY.md:
  L1 front-end   -> sindslam_tpu.frontend  (+ sindslam_tpu.ops kernels)
  L2 SLAM core   -> sindslam_tpu.slam
  L3 dense map   -> sindslam_tpu.mapping
  L4 drivers     -> examples/ + sindslam_tpu.system
  L5 evaluation  -> sindslam_tpu.evaluation
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS") == "cpu" or \
        _os.environ.get("JAX_PLATFORM_NAME") == "cpu":
    # The axon TPU plugin (sitecustomize) forces jax_platforms="axon,cpu"
    # via jax.config, which OVERRIDES these env vars; when the TPU tunnel
    # is down, initializing the axon backend then blocks forever inside
    # make_c_api_client, hanging every jax.devices() call — including in
    # CPU-only subprocesses (CLI tools, the multichip dryrun child, tests).
    # Honor an explicit env request for CPU at the config layer so those
    # never touch the tunnel.
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

from sindslam_tpu.config import (  # noqa: F401
    CameraConfig,
    DynaConfig,
    FlowConfig,
    MappingConfig,
    ORBConfig,
    SystemConfig,
    TrackingConfig,
)
