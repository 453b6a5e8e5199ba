"""Hierarchical KV cache: host-RAM second tier behind the device pool.

Reference: srt/mem_cache/hiradix_cache.py + srt/managers/cache_controller.py
(935 LoC — GPU↔host write-through/back prefix cache with async load/write
queues). TPU-native shape:

- ``HostKVStore``: a host-side prefix tree (the same page-granular radix
  structure) whose pages are numpy buffers; thread-safe (the async
  controller inserts from its worker thread while the scheduler matches
  from the tick thread).
- ``HiCacheController``: the async transfer controller (reference
  cache_controller.py write queue). Device->host downloads are DISPATCHED
  on the scheduler tick thread — dispatch order against the donated-buffer
  step programs is what guarantees the pages are read before a later step
  or reallocation overwrites them — but the BLOCKING device_get happens on
  the controller's worker thread, so a finished request's write-through
  never stalls the decode cadence (the failure mode the reference's async
  queues exist to prevent).
- Host->device loads on a prefix hit stay on the admission path but are
  pure async dispatches (jax.device_put + a jitted scatter): the tick
  thread never waits on the wire; the upload serializes on-device before
  the prefill that consumes it, which is the semantically required order.

Enabled by ``--enable-hierarchical-cache``; default off because every
transfer crosses the host↔device link (and on this deployment, a network
tunnel) — it pays off when prompt reuse outlives device KV capacity.
``--hicache-write-policy write_through_selective`` (reference
server_args.py hicache_write_policy) only writes back prefixes that have
shown reuse, halving write traffic for one-shot prompts.
"""

from __future__ import annotations

import logging
import queue
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

from semi_pd_tpu.mem.radix_cache import RadixCache

logger = logging.getLogger(__name__)


class HostKVStore:
    """Token-prefix tree over host KV buffers (thread-safe).

    "Pages" in the internal tree are indices into ``self.buffers``; each
    buffer holds one page of KV for all layers: [L, ncomp, page_size, H, D].
    """

    def __init__(self, page_size: int, max_bytes: int = 8 << 30):
        self.page_size = page_size
        self.max_bytes = max_bytes
        self.buffers: Dict[int, np.ndarray] = {}
        self._next = 1
        self._bytes = 0
        self._lock = threading.Lock()
        self.tree = RadixCache(page_size, self._free_buffers)

    def _free_buffers(self, ids) -> None:
        # called under self._lock (every tree mutation goes through it)
        for i in np.asarray(ids).ravel():
            buf = self.buffers.pop(int(i), None)
            if buf is not None:
                self._bytes -= buf.nbytes

    def insert(self, tokens: List[int], page_data: List[np.ndarray]) -> None:
        """Store full-page KV data for ``tokens`` (len == n_pages *
        page_size)."""
        with self._lock:
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
        with self._lock:
            ids, _ = self.tree.match_prefix(tokens)
            bufs = []
            for i in ids.tolist():
                b = self.buffers.get(int(i))
                if b is None:
                    break
                bufs.append(b)
            return bufs, len(bufs) * self.page_size

    def has_prefix(self, tokens: List[int]) -> bool:
        with self._lock:
            ids, _ = self.tree.match_prefix(tokens)
            return len(ids) > 0

    def n_pages(self) -> int:
        return len(self.buffers)


class HiCacheController:
    """Async write-through queue (reference cache_controller.py
    HiCacheController.write_queue + write_thread_func)."""

    def __init__(self, store: HostKVStore, split_fn, policy: str = "write_through"):
        self.store = store
        self._split = split_fn  # (device_data, n_pages) -> [per-page np]
        self.policy = policy
        self._q: "queue.Queue" = queue.Queue()
        self._seen_hot: set = set()
        self.n_written = 0
        self.n_skipped = 0
        self._thread = threading.Thread(
            target=self._worker, daemon=True, name="hicache-write")
        self._thread.start()

    # ---- tick-thread side ------------------------------------------------
    def should_write(self, req) -> bool:
        """write_through_selective (reference hicache_write_policy): only
        prefixes with demonstrated reuse go to the host tier — a request
        whose prefix was prefix-cache-hit, or whose prompt head was seen
        before. One-shot prompts skip the transfer entirely."""
        if self.policy != "write_through_selective":
            return True
        key = hash(tuple(req.input_ids[: self.store.page_size * 2]))
        hot = req.cached_tokens > 0 or key in self._seen_hot
        self._seen_hot.add(key)
        if not hot:
            self.n_skipped += 1
        return hot

    def enqueue_write(self, tokens: List[int], dev_data, n_pages: int) -> None:
        """``dev_data`` is an ALREADY-DISPATCHED device gather of the pages
        (ModelRunner.download_pages_async) — only the blocking device_get
        moves to the worker."""
        self._q.put((list(tokens), dev_data, n_pages))

    def drain(self) -> None:
        """Block until every queued write has landed in the host store
        (tests / flush)."""
        self._q.join()

    def stats(self) -> dict:
        return {"written": self.n_written, "skipped": self.n_skipped,
                "queued": self._q.qsize()}

    # ---- worker side -----------------------------------------------------
    def _worker(self) -> None:
        import jax

        while True:
            tokens, dev_data, n_pages = self._q.get()
            try:
                data = np.asarray(jax.device_get(dev_data))
                self.store.insert(tokens, self._split(data, n_pages))
                self.n_written += n_pages
            except Exception:  # noqa: BLE001 — cache writes are best-effort
                logger.exception("host-tier write-through failed")
            finally:
                self._q.task_done()
