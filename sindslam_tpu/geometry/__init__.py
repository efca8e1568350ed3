from sindslam_tpu.geometry import camera, se3  # noqa: F401
