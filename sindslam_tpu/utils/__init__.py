

def cpu_cache_dirname() -> str:
    """``.jax_cache_cpu_<fingerprint>`` — a CPU-cache directory name keyed
    by this machine's CPU feature set.

    CPU AOT executables are machine-specific: entries written by a
    different host type load with SIGILL-risk warnings and have segfaulted
    mid-suite (jax compilation_cache.get_executable_and_time). The rounds
    of this build run on heterogeneous VMs, so a bare ``.jax_cache_cpu``
    eventually mixes hosts; fingerprinting the dir name gives each CPU
    type its own cache and makes a machine switch a cold cache instead of
    a crash.
    """
    import hashlib
    import platform

    key = platform.machine()
    got_flags = got_model = False
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                # flags alone are NOT enough: two VMs with identical flag
                # sets still got different LLVM model-based tuning features
                # (+prefer-no-scatter/+prefer-no-gather), so their AOT
                # executables cross-loaded with SIGILL-risk warnings (and
                # run-to-run numeric drift — r4 verdict #1a). Key on the
                # model name too.
                if not got_flags and line.startswith(("flags", "Features")):
                    key += " " + " ".join(sorted(line.split(":", 1)[1].split()))
                    got_flags = True
                elif not got_model and line.startswith("model name"):
                    key += " " + line.split(":", 1)[1].strip()
                    got_model = True
                if got_flags and got_model:
                    break
    except OSError:
        pass
    return ".jax_cache_cpu_" + hashlib.sha1(key.encode()).hexdigest()[:10]


def setup_compilation_cache(repo_root: str | None = None) -> None:
    """Wire the persistent XLA compilation cache, split by backend.

    TPU artifacts go to ``.jax_cache`` (device-targeted, safe to share);
    CPU AOT executables go to a per-machine ``.jax_cache_cpu_<hash>``
    (see :func:`cpu_cache_dirname`).
    Call AFTER jax is importable; reads the default backend lazily.
    """
    import os

    import jax

    if repo_root is None:
        repo_root = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    sub = ".jax_cache" if jax.default_backend() == "tpu" else cpu_cache_dirname()
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo_root, sub))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def host_prefetch(*arrays) -> None:
    """Start device->host transfers WITHOUT blocking (copy_to_host_async).

    Through the axon tunnel a blocking np.asarray pays the full ~21-34 ms
    round trip at the moment of the read; prefetching at DISPATCH time lets
    the transfer ride out while the host does other work — measured 33.8 ms
    -> 0.2 ms for a result read one frame later. No-op for arrays/backends
    without the API (host numpy, interpret mode)."""
    for a in arrays:
        try:
            a.copy_to_host_async()
        except (AttributeError, TypeError):
            pass
