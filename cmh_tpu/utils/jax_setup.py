"""Shared JAX runtime configuration.

The persistent compilation cache matters far more here than in a typical
JAX deployment: remote TPU compiles through the axon tunnel take 10-25
minutes cold for the big scan-chunked training/eval programs, and the CPU
parity/measurement tools pay single-core XLA compiles of the same programs.
bench.py has configured the cache since round 2 (`bench._configure_jax`);
this helper brings the trainer CLI and the measurement tools onto the same
repo-local cache directory.
"""

from __future__ import annotations

import os

REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
DEFAULT_CACHE_DIR = os.path.join(REPO_ROOT, ".jax_cache")


def apply_platform_escape() -> str | None:
    """Honor the ``CMH_TPU_PLATFORM`` escape hatch: the axon sitecustomize
    pins ``JAX_PLATFORMS=axon`` in EVERY python process (overriding the
    shell env var), so off-TPU runs must force the platform through
    jax.config before any backend use. One shared helper — the condition
    had started to drift across entry points. Returns the platform applied,
    or None. No-op once a backend is initialized (jax raises; swallowed
    because the caller's platform is then already decided)."""
    platform = os.environ.get("CMH_TPU_PLATFORM")
    if platform:
        import jax

        try:
            jax.config.update("jax_platforms", platform)
        except Exception:
            return None
    return platform or None


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Point JAX's persistent compilation cache at the repo-local directory
    (override with CMH_TPU_JAX_CACHE; same dir bench.py uses). Safe to call
    multiple times and before/after backend init."""
    import jax

    cache_dir = (cache_dir or os.environ.get("CMH_TPU_JAX_CACHE")
                 or DEFAULT_CACHE_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
