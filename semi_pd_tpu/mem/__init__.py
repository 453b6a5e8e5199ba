from semi_pd_tpu.mem.pool import KVCache, PageAllocator, ReqToPagePool
from semi_pd_tpu.mem.radix_cache import RadixCache
from semi_pd_tpu.mem.chunk_cache import ChunkCache

__all__ = ["KVCache", "PageAllocator", "ReqToPagePool", "RadixCache", "ChunkCache"]
