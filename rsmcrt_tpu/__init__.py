"""rsmcrt_tpu: TPU-native differentiable SDF Monte Carlo radiation
transfer (see SURVEY.md for the reference map)."""

import os


def _enable_compile_cache():
    """Persistent XLA compile cache: chained megastep programs for
    complex scenes (quartic raycasts, marched CSG models) take minutes
    to compile over the remote TPU tunnel; caching makes every run after
    the first start instantly.  Opt out with RSMCRT_NO_COMPILE_CACHE=1."""
    if os.environ.get("RSMCRT_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        cache_dir = os.environ.get(
            "RSMCRT_COMPILE_CACHE",
            os.path.join(os.path.dirname(__file__), os.pardir,
                         ".jax_cache"),
        )
        jax.config.update("jax_compilation_cache_dir",
                          os.path.abspath(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          5.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compile_cache()
