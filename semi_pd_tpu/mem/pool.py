"""Paged KV memory: page allocator, request page table, device KV cache.

TPU-native counterpart of the reference's two-level paged KV design
(reference: python/sglang/srt/mem_cache/memory_pool.py — ReqToTokenPool
``[max_reqs, max_context_len]`` page table at :46-96, TokenToKVPoolAllocator
freelist at :124-185, MHATokenToKVPool per-layer K/V buffers at :187-377,
MLATokenToKVPool compressed-KV at :379-453; and paged_allocator.py for
page_size>1).

Differences by design:

- **Single owner, single process.** Both prefill and decode phases are jitted
  programs in one process sharing the *same* jax.Arrays; the reference's CUDA
  IPC export/import (model_runner.py:346-624) and ``bypass_create_buffers``
  role split collapse away. Host-side allocation state is plain numpy owned
  by the (decode-side) scheduler — the same single-owner invariant the
  reference enforces across processes.
- **Page-granular allocator** (default page_size=16): TPU attention kernels
  gather KV page-contiguously; token-granular paging (reference default
  page_size=1) would defeat vectorized DMA.
- **Functional updates**: KV arrays are threaded through jitted step
  functions with donation, so XLA aliases the multi-GB buffers in place —
  the "unified storage" crux on TPU.

Layout: KV lives as flat token-slot arrays ``[num_layers, num_slots, heads,
head_dim]`` with ``num_slots = num_pages * page_size``; slot = page_id *
page_size + offset. Page 0 is reserved as a dump page: padded positions in a
batch write there and padded page-table entries point there.
"""

from __future__ import annotations

import dataclasses
import heapq
import logging
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


class PageAllocator:
    """Freelist allocator over KV pages (reference: TokenToKVPoolAllocator
    memory_pool.py:124-185, generalized to page granularity like
    paged_allocator.py:29).

    With ``partitions > 1`` (DP-attention, reference layers/dp_attention.py):
    pages split into equal contiguous ranges, one per dp rank, so the pool's
    slot axis shards cleanly over the "dp" mesh axis; each partition reserves
    its FIRST page as a rank-local dump page (local page id 0 after the
    shard-local offset subtraction), and a request allocates only from its
    assigned partition.

    The free list is a MIN-HEAP (lowest page first), not the reference's
    LIFO stack: the Pallas attention kernels issue ONE DMA per KV block when
    the block's pages are consecutive pool slots (_kv_block_copies) instead
    of one per page, and decode attention is DMA-issue-bound on this
    hardware. Lowest-first reuse keeps freed ranges re-coalescing, so
    multi-page allocations keep landing as consecutive runs long after the
    initial ascending sweep."""

    def __init__(self, num_pages: int, page_size: int, partitions: int = 1):
        assert num_pages % partitions == 0, (num_pages, partitions)
        self.num_pages = num_pages
        self.page_size = page_size
        self.partitions = partitions
        self.pages_per_part = num_pages // partitions
        # First page of each partition reserved as its dump page (page 0 for
        # the single-partition case — padding writes land there). An
        # ascending range is already a valid min-heap.
        self._free: List[List[int]] = [
            list(range(r * self.pages_per_part + 1,
                       (r + 1) * self.pages_per_part))
            for r in range(partitions)
        ]
        self._total_free = sum(len(f) for f in self._free)

    @property
    def usable_pages(self) -> int:
        return self.num_pages - self.partitions

    def available_pages(self, part: Optional[int] = None) -> int:
        if part is not None:
            return len(self._free[part])
        return sum(len(f) for f in self._free)

    def available_tokens(self) -> int:
        return self.available_pages() * self.page_size

    def alloc(self, n_pages: int, part: int = 0) -> Optional[np.ndarray]:
        free = self._free[part]
        if n_pages > len(free):
            return None
        if n_pages == 0:
            return np.empty((0,), dtype=np.int32)
        return np.array(
            [heapq.heappop(free) for _ in range(n_pages)], dtype=np.int32
        )

    def free(self, pages: np.ndarray) -> None:
        for p in pages.tolist() if isinstance(pages, np.ndarray) else pages:
            p = int(p)
            if p % self.pages_per_part != 0:  # dump pages are never freed
                heapq.heappush(self._free[p // self.pages_per_part], p)

    def least_loaded_partition(self) -> int:
        return max(range(self.partitions), key=lambda r: len(self._free[r]))

    def check_leak(self) -> bool:
        """Reference scheduler.py:981-1030 crashes with 'memory leak' when the
        pool is not full at idle; we expose the same invariant."""
        return self.available_pages() == self._total_free


class ReqToPagePool:
    """Request-slot pool + host page table (reference: ReqToTokenPool
    memory_pool.py:46-96, but mapping request → *pages* not tokens).

    ``page_table[rid_slot, j]`` = page id backing tokens
    ``[j*page_size, (j+1)*page_size)`` of that request. The authoritative
    copy is host numpy; per-batch slices are shipped to the device with each
    step (no persistent device mirror to keep in sync)."""

    def __init__(self, max_reqs: int, max_context_len: int, page_size: int):
        self.max_reqs = max_reqs
        self.page_size = page_size
        self.max_pages_per_req = (max_context_len + page_size - 1) // page_size
        self.page_table = np.zeros(
            (max_reqs, self.max_pages_per_req), dtype=np.int32
        )
        self.free_slots: List[int] = list(range(max_reqs - 1, -1, -1))

    def available_slots(self) -> int:
        return len(self.free_slots)

    def alloc(self) -> Optional[int]:
        if not self.free_slots:
            return None
        return self.free_slots.pop()

    def free(self, slot: int) -> None:
        self.page_table[slot, :] = 0
        self.free_slots.append(slot)

    def write(self, slot: int, start_page: int, pages: np.ndarray) -> None:
        self.page_table[slot, start_page : start_page + len(pages)] = pages


@dataclasses.dataclass
class KVCacheSpec:
    num_layers: int
    num_pages: int
    page_size: int
    num_kv_heads: int  # 1 for MLA
    head_dim: int  # kv_lora_rank + qk_rope_head_dim for MLA
    dtype: jnp.dtype = jnp.bfloat16
    use_mla: bool = False
    # Chunked combined layout [L, S, CT, 128] (TPU fast path): K chunks then
    # V chunks per slot row; requires (ncomp*H*D) % 128 == 0. Set by the
    # runner when the Pallas backend benefits (head_dim not a lane-tile
    # multiple — avoids both XLA pool padding and a per-layer relayout copy).
    chunked: bool = False
    # Double-sparsity label cache width (0 = off): adds a second buffer
    # [L, S, H, ds_channels] of per-token heavy-channel K labels (reference
    # DoubleSparseTokenToKVPool memory_pool.py:455-529).
    ds_channels: int = 0

    @property
    def num_slots(self) -> int:
        return self.num_pages * self.page_size

    @property
    def chunks_total(self) -> int:
        ncomp = 1 if self.use_mla else 2
        return ncomp * self.num_kv_heads * self.head_dim // 128

    def bytes_total(self) -> int:
        per = np.dtype(self.dtype).itemsize
        n = self.num_layers * self.num_slots * self.num_kv_heads * self.head_dim * per
        return n if self.use_mla else 2 * n


class KVCache:
    """Device KV arrays threaded through the jitted step programs.

    MHA/GQA: ONE buffer ``[L, 2, S, H, D]`` — component axis 0 is K, 1 is V
    (the reference keeps separate per-layer K/V buffers, MHATokenToKVPool
    memory_pool.py:187-377; one array here keeps donation/aliasing across the
    two phase programs trivial). The component axis is NOT folded into the
    minor dims because Mosaic requires lane-dim (and sublane) slices to be
    tile-aligned — head_dim 32/64 models would break a [..., 2D] layout.
    MLA: ``[L, 1, S, 1, rank+rope]`` (reference MLATokenToKVPool :379-453).
    FP8 KV stores e4m3 values directly (jax has native fp8 dtypes; no uint8
    view dance as at reference :205-208).
    """

    def __init__(self, spec: KVCacheSpec, sharding=None):
        self.spec = spec
        ncomp = 1 if spec.use_mla else 2
        if spec.chunked:
            assert (ncomp * spec.num_kv_heads * spec.head_dim) % 128 == 0
            shape = (
                spec.num_layers, spec.num_slots, spec.chunks_total, 128,
            )
        else:
            shape = (
                spec.num_layers, ncomp, spec.num_slots, spec.num_kv_heads,
                spec.head_dim,
            )

        arr = jnp.zeros(shape, dtype=spec.dtype)
        if sharding is not None:
            arr = jax.device_put(arr, sharding)
        bufs = [arr]
        if spec.ds_channels:
            assert not spec.use_mla and not spec.chunked
            bufs.append(jnp.zeros(
                (spec.num_layers, spec.num_slots, spec.num_kv_heads,
                 spec.ds_channels), dtype=spec.dtype,
            ))
        self.buffers: Tuple[jax.Array, ...] = tuple(bufs)

    @property
    def arrays(self) -> Tuple[jax.Array, ...]:
        return self.buffers

    def update(self, new_buffers: Tuple[jax.Array, ...]) -> None:
        self.buffers = new_buffers

    def hbm_bytes(self) -> int:
        return self.spec.bytes_total()


def write_kv_slots(
    cache_layer: jax.Array, new_kv: jax.Array, slots: jax.Array
) -> jax.Array:
    """Scatter freshly-computed K or V rows into the flat slot dimension.

    ``cache_layer``: [S, H, D]; ``new_kv``: [T, H, D]; ``slots``: [T] int32.
    Padded positions carry slot ids inside page 0 (the dump page). Under
    donation XLA lowers this to an in-place scatter (role of the reference's
    set_kv_buffer, memory_pool.py:316)."""
    return cache_layer.at[slots].set(new_kv.astype(cache_layer.dtype))
