

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
    # flags alone are NOT enough: two VMs with identical flag sets still got
    # different LLVM model-based tuning features (+prefer-no-scatter/
    # +prefer-no-gather), cross-loading AOT executables with SIGILL-risk
    # warnings and run-to-run numeric drift (r4 verdict #1a). The "model
    # name" STRING is also not enough: cloud VMs report a generic
    # "Intel(R) Xeon(R) Processor @ 2.10GHz" across different
    # microarchitectures — LLVM's tuning keys on cpuid family/model, so key
    # on the NUMERIC family/model/stepping lines (faithful in VMs).
    want = ("flags", "Features", "model name", "cpu family", "model",
            "stepping")
    got: dict = {}
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                name = line.split(":", 1)[0].strip()
                if name in want and name not in got:
                    got[name] = " ".join(sorted(line.split(":", 1)[1].split()))
                if len(got) == len(want):
                    break
    except OSError:
        pass
    key += "".join(f" {k}={got[k]}" for k in sorted(got))
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
