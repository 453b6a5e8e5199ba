"""ctypes binding for the native radix tree (csrc/radix_tree.cpp).

Drop-in alternative to mem/radix_cache.py with the same scheduler-facing
interface; built lazily with g++ on first use and cached next to the source.
Falls back to the pure-python tree when no compiler is available.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Callable, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_CSRC = os.path.join(os.path.dirname(os.path.dirname(__file__)), "csrc")
_SO = os.path.join(_CSRC, "libradixtree.so")
_SRC = os.path.join(_CSRC, "radix_tree.cpp")

_lib = None


def load_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    try:
        # The .so is never checked in (unreviewable binaries must not shadow
        # the source): always build from radix_tree.cpp when absent or stale.
        # Build to a temp path + atomic rename so parallel imports race safely.
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            tmp = f"{_SO}.{os.getpid()}.tmp"
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp, _SO)
        lib = ctypes.CDLL(_SO)
    except Exception as e:  # noqa: BLE001
        logger.warning("native radix tree unavailable (%s); using python tree", e)
        return None

    lib.rtree_new.restype = ctypes.c_void_p
    lib.rtree_new.argtypes = [ctypes.c_int32]
    lib.rtree_free.argtypes = [ctypes.c_void_p]
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.rtree_match.restype = ctypes.c_int64
    lib.rtree_match.argtypes = [
        ctypes.c_void_p, i32p, ctypes.c_int64, i32p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.rtree_insert.restype = ctypes.c_int64
    lib.rtree_insert.argtypes = [
        ctypes.c_void_p, i32p, ctypes.c_int64, i32p,
        ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.rtree_lock.argtypes = [ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int32]
    lib.rtree_evict.restype = ctypes.c_int64
    lib.rtree_evict.argtypes = [ctypes.c_void_p, ctypes.c_int64, i32p, ctypes.c_int64]
    lib.rtree_evictable.restype = ctypes.c_int64
    lib.rtree_evictable.argtypes = [ctypes.c_void_p]
    lib.rtree_protected.restype = ctypes.c_int64
    lib.rtree_protected.argtypes = [ctypes.c_void_p]
    lib.rtree_reset.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class NativeRadixCache:
    """Same interface as mem/radix_cache.py::RadixCache; nodes are opaque
    uint64 ids."""

    def __init__(self, page_size: int, free_pages_fn: Callable[[np.ndarray], None]):
        self.lib = load_lib()
        if self.lib is None:
            raise RuntimeError("native radix tree unavailable")
        self.page_size = page_size
        self.free_pages_fn = free_pages_fn
        self._h = ctypes.c_void_p(self.lib.rtree_new(page_size))
        self.root = 0
        self.version = 0  # lpm-memo invalidation (see schedule_policy)

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self.lib.rtree_free(self._h)
        except Exception:  # noqa: BLE001
            pass

    def reset(self):
        self.version += 1
        self.lib.rtree_reset(self._h)

    def match_prefix(self, token_ids: List[int]) -> Tuple[np.ndarray, int]:
        toks = np.asarray(token_ids, dtype=np.int32)
        cap = max(len(toks) // self.page_size + 1, 1)
        out = np.empty(cap, dtype=np.int32)
        node = ctypes.c_uint64()
        n = self.lib.rtree_match(
            self._h, toks, len(toks), out, cap, ctypes.byref(node)
        )
        return out[:n].copy(), int(node.value)

    def insert(self, token_ids: List[int], pages: np.ndarray) -> Tuple[int, int]:
        self.version += 1
        toks = np.asarray(token_ids, dtype=np.int32)
        pages = np.ascontiguousarray(pages, dtype=np.int32)
        node = ctypes.c_uint64()
        dup = self.lib.rtree_insert(
            self._h, toks, len(toks), pages, ctypes.byref(node)
        )
        return int(dup), int(node.value)

    def inc_lock_ref(self, node: int):
        self.lib.rtree_lock(self._h, node, 1)

    def dec_lock_ref(self, node: int):
        self.lib.rtree_lock(self._h, node, -1)

    def evict(self, num_pages: int) -> int:
        self.version += 1
        # cap >= all evictable pages so the C side never truncates (which
        # would leak pages)
        cap = max(self.evictable_pages, 1)
        out = np.empty(cap, dtype=np.int32)
        n = self.lib.rtree_evict(self._h, num_pages, out, cap)
        if n > 0:
            self.free_pages_fn(out[:n])
        return int(n)

    @property
    def evictable_pages(self) -> int:
        return int(self.lib.rtree_evictable(self._h))

    @property
    def protected_pages(self) -> int:
        return int(self.lib.rtree_protected(self._h))

    def total_cached_pages(self) -> int:
        return self.evictable_pages + self.protected_pages
