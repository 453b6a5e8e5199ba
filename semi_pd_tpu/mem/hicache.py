"""Hierarchical KV cache: host-RAM second tier behind the device pool.

Reference: srt/mem_cache/hiradix_cache.py + srt/managers/cache_controller.py
(935 LoC — GPU↔host write-through/back prefix cache with async load/write
queues). TPU-native simplification: a host-side prefix tree (the same
page-granular radix structure) whose pages are numpy buffers; write-through
happens when a finished request's pages enter the device tree, and a
device-tree miss falls back to a host match + upload before prefill.

Enabled by ``--enable-hierarchical-cache``; default off because every
transfer crosses the host↔device link (and on this deployment, a network
tunnel) — it pays off when prompt reuse outlives device KV capacity.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional, Tuple

import numpy as np

from semi_pd_tpu.mem.radix_cache import RadixCache

logger = logging.getLogger(__name__)


class HostKVStore:
    """Token-prefix tree over host KV buffers.

    "Pages" in the internal tree are indices into ``self.buffers``; each
    buffer holds one page of KV for all layers: [L, ncomp, page_size, H, D].
    """

    def __init__(self, page_size: int, max_bytes: int = 8 << 30):
        self.page_size = page_size
        self.max_bytes = max_bytes
        self.buffers: Dict[int, np.ndarray] = {}
        self._next = 1
        self._bytes = 0
        self.tree = RadixCache(page_size, self._free_buffers)

    def _free_buffers(self, ids) -> None:
        for i in np.asarray(ids).ravel():
            buf = self.buffers.pop(int(i), None)
            if buf is not None:
                self._bytes -= buf.nbytes

    def insert(self, tokens: List[int], page_data: List[np.ndarray]) -> None:
        """Store full-page KV data for ``tokens`` (len == n_pages *
        page_size)."""
        ids = []
        for d in page_data:
            self.buffers[self._next] = d
            self._bytes += d.nbytes
            ids.append(self._next)
            self._next += 1
        dup, _ = self.tree.insert(tokens, np.asarray(ids, np.int32))
        if dup:
            # already-present prefix: drop our fresh copies of those pages
            self._free_buffers(ids[:dup])
        while self._bytes > self.max_bytes:
            if self.tree.evict(1) == 0:
                break

    def match(self, tokens: List[int]) -> Tuple[List[np.ndarray], int]:
        """Longest host-cached prefix: returns (page buffers, n_tokens)."""
        ids, _ = self.tree.match_prefix(tokens)
        bufs = []
        for i in ids.tolist():
            b = self.buffers.get(int(i))
            if b is None:
                break
            bufs.append(b)
        return bufs, len(bufs) * self.page_size

    def n_pages(self) -> int:
        return len(self.buffers)
