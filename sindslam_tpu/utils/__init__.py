

def setup_compilation_cache(repo_root: str | None = None) -> None:
    """Wire the persistent XLA compilation cache, split by backend.

    TPU artifacts go to ``.jax_cache`` (device-targeted, safe to share);
    CPU AOT executables go to ``.jax_cache_cpu`` (machine-specific —
    entries written by a different host type load with SIGILL-risk
    warnings and have segfaulted mid-run; see tests/conftest.py).
    Call AFTER jax is importable; reads the default backend lazily.
    """
    import os

    import jax

    if repo_root is None:
        repo_root = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    sub = ".jax_cache" if jax.default_backend() == "tpu" else ".jax_cache_cpu"
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo_root, sub))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
