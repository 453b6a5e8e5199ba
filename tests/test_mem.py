"""Memory subsystem tests: page allocator, page table, radix cache invariants
(reference test analog: allocator behavior exercised implicitly via
scheduler.check_memory, scheduler.py:981-1030)."""

import numpy as np
import pytest

from semi_pd_tpu.mem.pool import PageAllocator, ReqToPagePool
from semi_pd_tpu.mem.radix_cache import RadixCache


def test_page_allocator_basics():
    a = PageAllocator(num_pages=10, page_size=16)
    assert a.available_pages() == 9  # page 0 reserved
    p = a.alloc(4)
    assert len(p) == 4 and 0 not in p
    assert a.available_pages() == 5
    a.free(p)
    assert a.available_pages() == 9
    assert a.check_leak()
    assert a.alloc(10) is None  # over-subscribe fails without side effects
    assert a.available_pages() == 9


def test_req_pool():
    pool = ReqToPagePool(max_reqs=4, max_context_len=64, page_size=16)
    slots = [pool.alloc() for _ in range(4)]
    assert sorted(slots) == [0, 1, 2, 3]
    assert pool.alloc() is None
    pool.write(slots[0], 0, np.array([5, 6], dtype=np.int32))
    assert pool.page_table[slots[0], 0] == 5
    pool.free(slots[0])
    assert pool.page_table[slots[0], 0] == 0
    assert pool.available_slots() == 1


class FreeList:
    def __init__(self):
        self.freed = []

    def __call__(self, pages):
        self.freed.extend(np.asarray(pages).tolist())


def test_radix_cache_match_insert():
    P = 4
    fl = FreeList()
    rc = RadixCache(page_size=P, free_pages_fn=fl)
    toks = list(range(16))  # 4 pages
    pages = np.array([1, 2, 3, 4], dtype=np.int32)
    dup, node = rc.insert(toks, pages)
    assert dup == 0
    assert rc.total_cached_pages() == 4

    # Full-prefix match
    m, n = rc.match_prefix(toks)
    assert m.tolist() == [1, 2, 3, 4]

    # Partial page-granular match: first 2 pages shared, then diverge
    toks2 = list(range(8)) + [99] * 8
    m2, _ = rc.match_prefix(toks2)
    assert m2.tolist() == [1, 2]

    # Insert the divergent sequence; shared prefix detected as duplicate
    pages2 = np.array([1, 2, 7, 8], dtype=np.int32)
    dup2, _ = rc.insert(toks2, pages2)
    assert dup2 == 2  # caller would free its duplicate copies of pages 1,2
    assert rc.total_cached_pages() == 6  # 1,2 shared + 3,4 + 7,8


def test_radix_cache_lock_and_evict():
    P = 4
    fl = FreeList()
    rc = RadixCache(page_size=P, free_pages_fn=fl)
    toks_a = list(range(8))
    toks_b = list(range(4)) + [50, 51, 52, 53]
    _, na = rc.insert(toks_a, np.array([1, 2], dtype=np.int32))
    _, nb = rc.insert(toks_b, np.array([1, 3], dtype=np.int32))

    rc.inc_lock_ref(na)
    assert rc.protected_pages == 2
    assert rc.evictable_pages == 1

    freed = rc.evict(100)
    assert freed == 1 and fl.freed == [3]

    rc.dec_lock_ref(na)
    freed = rc.evict(100)
    assert freed == 2
    assert rc.total_cached_pages() == 0


def test_radix_cache_sub_page_tail_ignored():
    rc = RadixCache(page_size=4, free_pages_fn=FreeList())
    # 6 tokens = 1 full page + tail; only the full page is cached
    dup, _ = rc.insert(list(range(6)), np.array([1, 2], dtype=np.int32))
    assert rc.total_cached_pages() == 1
    m, _ = rc.match_prefix(list(range(6)))
    assert m.tolist() == [1]


def test_chunked_pool_engine_parity():
    """Engine on a chunked KV pool produces identical greedy tokens to the
    legacy 5D layout (exercises the chunked write + reference-backend view
    conversion end-to-end)."""
    import dataclasses

    import numpy as np

    from semi_pd_tpu.config.model_config import ModelConfig
    from semi_pd_tpu.config.server_args import ServerArgs
    from semi_pd_tpu.mem.pool import KVCache
    from semi_pd_tpu.runtime.engine import Engine
    from semi_pd_tpu.sampling.sampling_params import SamplingParams
    from transformers import LlamaConfig

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=8,
        max_position_embeddings=256, tie_word_embeddings=False,
    )
    cfg.architectures = ["LlamaForCausalLM"]
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, 128, size=10).tolist() for _ in range(2)]
    sp = SamplingParams(max_new_tokens=6, temperature=0.0, ignore_eos=True)

    # chunkable config: 4 kv heads x head_dim 64 -> CT = 4 (sublane-padded on
    # TPU but fine for the CPU conversion-path check)
    cfg2 = LlamaConfig(
        vocab_size=128, hidden_size=256, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256, tie_word_embeddings=False,
    )
    cfg2.architectures = ["LlamaForCausalLM"]
    res = []
    for chunked in (False, True):
        mc = ModelConfig.from_hf_config(cfg2, dtype="float32")
        eng = Engine(server_args=ServerArgs(
            model_path="", random_weights=True, page_size=4,
            max_total_tokens=512, dtype="float32"), model_config=mc)
        if chunked:
            r = eng.runner
            r.kv_spec = dataclasses.replace(r.kv_spec, chunked=True)
            r.kv_cache = KVCache(r.kv_spec)
            assert r.kv_cache.arrays[0].ndim == 4
        res.append([o["output_ids"] for o in eng.generate(
            input_ids=prompts, sampling_params=sp)])
    assert res[0] == res[1]
