"""Shared small utilities."""

import jax.numpy as jnp


def host_cpu_fingerprint() -> str:
    """Short fingerprint of the host CPU identity + jaxlib version.

    XLA:CPU persistent-cache entries are AOT-compiled against the compiling
    host's ISA extensions AND model-derived LLVM tuning prefs (e.g.
    ``+prefer-no-gather`` on Downfall-era Intel — set by CPU *model*, not by
    any /proc/cpuinfo flag), and this VM's host varies across boots —
    loading a foreign entry risks SIGILL. Every CPU compile-cache directory
    is keyed by this value (here, tests/conftest.py); the hash covers the
    model identity lines, the flag set, and the jaxlib version so any of
    them rolling moves the cache to a fresh dir.

    Note: XLA:CPU logs a scary "machine type doesn't match" warning on
    every persistent-cache load even on the identical host (its load-side
    feature probe never reports tuning prefs) — that warning alone does not
    indicate a real mismatch; this key is about preventing the real thing.
    """
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            head = f.read().split("\n\n", 1)[0]     # first CPU's record
        keep = ("vendor_id", "cpu family", "model", "model name",
                "stepping", "flags")
        ident = "\n".join(ln for ln in head.splitlines()
                          if ln.split("\t")[0].strip() in keep)
    except OSError:
        ident = "nofp"
    try:
        import jaxlib
        ident += "\njaxlib=" + jaxlib.__version__
    except Exception:
        pass
    return hashlib.sha1(ident.encode()).hexdigest()[:10]


def is_pd(mat, tol: float = 1e-9) -> bool:
    """All eigenvalues >= tol (parity: /root/reference/src/utils.py:9)."""
    return bool(jnp.all(jnp.linalg.eigvalsh(0.5 * (mat + mat.T)) >= tol))


def setup_compile_cache(path: str | None = None) -> None:
    """Enable the persistent XLA compilation cache.

    Remote compiles through the axon tunnel are slow (minutes for grad
    graphs); caching makes them one-time. Separate directories per backend
    avoid machine-feature mismatches between locally- and remotely-compiled
    entries; the CPU dir is additionally keyed by a host-CPU-feature
    fingerprint — XLA:CPU entries are AOT-compiled against the compiling
    host's ISA and this VM's visible feature set varies across boots
    (loading a foreign entry risks SIGILL).
    """
    import os

    import jax

    if path is None:
        backend = os.environ.get("JAX_PLATFORMS", "tpu") or "tpu"
        backend = backend.split(",")[0]
        path = f"/tmp/jax_cache_{backend}"
        if backend == "cpu":
            path += "_" + host_cpu_fingerprint()
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


_TPU_LOCK_FD = None          # held for process lifetime once acquired


def acquire_tpu_lock(max_wait_s: float = 1800.0, verbose: bool = True) -> bool:
    """Serialize this repo's TPU/host access through one flock.

    The tunneled chip is single-client AND the single host core is the
    bench's contact-probe budget: a leftover experiment starved the round-3
    driver bench into a CPU-fallback artifact. Every long-running script
    takes this lock before touching the device (``bench.py`` holds the same
    file with a short grace window). No-op (returns True) on non-TPU
    backends. Returns False if the wait times out — callers may proceed,
    but should say so.
    """
    global _TPU_LOCK_FD
    import os
    import time
    if (os.environ.get("JAX_PLATFORMS", "") or "tpu").split(",")[0] == "cpu":
        return True
    if _TPU_LOCK_FD is not None:
        return True
    import fcntl
    fd = os.open("/tmp/lipt_tpu.lock", os.O_CREAT | os.O_RDWR, 0o666)
    deadline = time.monotonic() + max_wait_s
    while True:
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            _TPU_LOCK_FD = fd
            return True
        except OSError:
            if time.monotonic() >= deadline:
                if verbose:
                    print("[tpu-lock] WARNING: lock still held after "
                          f"{max_wait_s:.0f}s — proceeding unserialized")
                os.close(fd)
                return False
            if verbose:
                print("[tpu-lock] waiting (another repo process holds "
                      "the TPU)...", flush=True)
            time.sleep(10.0)
