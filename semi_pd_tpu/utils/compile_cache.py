"""Persistent XLA compilation cache (reference analog: CUDA-graph capture +
torch.compile caches; on TPU the equivalent startup cost is XLA compilation,
which jax can cache on disk across processes — incl. through the axon
remote-compile helper)."""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)


def enable_compile_cache(path: str | None = None) -> None:
    import jax

    cache = (
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache")
    )
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        logger.info("compilation cache at %s", cache)
    except Exception as e:  # noqa: BLE001 — cache is an optimization only
        logger.warning("compilation cache unavailable: %s", e)
