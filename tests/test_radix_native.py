"""Differential test: native C++ radix tree vs pure-python tree under a
randomized op sequence (match/insert/lock/evict). The native tree backs the
scheduler's admission hot path; any divergence is a correctness bug."""

import numpy as np
import pytest

from semi_pd_tpu.mem.radix_cache import RadixCache
from semi_pd_tpu.mem.radix_native import NativeRadixCache, load_lib

pytestmark = pytest.mark.skipif(load_lib() is None, reason="no g++/native lib")


class Freed:
    def __init__(self):
        self.pages = []

    def __call__(self, pages):
        self.pages.extend(int(p) for p in np.asarray(pages).ravel())


def test_differential_random_ops():
    P = 4
    rng = np.random.default_rng(0)
    fa, fb = Freed(), Freed()
    py = RadixCache(P, fa)
    cc = NativeRadixCache(P, fb)

    next_page = [1]
    live = []  # (tokens, py_node, cc_node) locked entries

    for step in range(300):
        op = rng.choice(["insert", "match", "lock", "unlock", "evict"],
                        p=[0.35, 0.3, 0.1, 0.1, 0.15])
        if op == "insert":
            # build a sequence sharing a prefix with an earlier one sometimes
            n_pages = int(rng.integers(1, 6))
            if live and rng.random() < 0.5:
                base = list(live[rng.integers(0, len(live))][0])
                toks = base[: (rng.integers(0, len(base) // P + 1)) * P]
            else:
                toks = []
            while len(toks) < n_pages * P:
                toks.extend(int(rng.integers(0, 30)) for _ in range(P))
            toks = toks[: n_pages * P]
            pages = np.arange(next_page[0], next_page[0] + n_pages, dtype=np.int32)
            next_page[0] += n_pages
            d1, n1 = py.insert(toks, pages)
            d2, n2 = cc.insert(toks, pages)
            assert d1 == d2, (step, d1, d2)
            live.append((toks, n1, n2))
        elif op == "match" and live:
            base = list(live[rng.integers(0, len(live))][0])
            # sometimes extend with garbage
            q = base + ([9999] * P if rng.random() < 0.3 else [])
            m1, _ = py.match_prefix(q)
            m2, _ = cc.match_prefix(q)
            assert m1.tolist() == m2.tolist(), (step, m1, m2)
        elif op == "lock" and live:
            toks, n1, n2 = live[rng.integers(0, len(live))]
            py.inc_lock_ref(n1)
            cc.inc_lock_ref(n2)
            live.append((toks, n1, n2))  # remember to unlock
        elif op == "unlock":
            locked = [e for e in live[len(live)//2:]]
            if locked:
                pass  # simplistic: skip explicit unlock tracking here
        elif op == "evict":
            want = int(rng.integers(1, 8))
            f1 = py.evict(want)
            f2 = cc.evict(want)
            assert f1 == f2, (step, f1, f2)
            assert sorted(fa.pages) == sorted(fb.pages), step

        assert py.evictable_pages == cc.evictable_pages, step
        assert py.protected_pages == cc.protected_pages, step

    # full drain
    py.evict(10**9)
    cc.evict(10**9)
    assert sorted(fa.pages) == sorted(fb.pages)


def test_native_basic_semantics():
    P = 4
    f = Freed()
    cc = NativeRadixCache(P, f)
    toks = list(range(16))
    dup, node = cc.insert(toks, np.array([1, 2, 3, 4], np.int32))
    assert dup == 0
    m, n2 = cc.match_prefix(toks)
    assert m.tolist() == [1, 2, 3, 4]
    assert cc.total_cached_pages() == 4

    cc.inc_lock_ref(node)
    assert cc.protected_pages == 4
    assert cc.evict(100) == 0
    cc.dec_lock_ref(node)
    assert cc.evict(100) == 4
    assert sorted(f.pages) == [1, 2, 3, 4]


def test_engine_uses_native_tree():
    from semi_pd_tpu.config.model_config import ModelConfig
    from semi_pd_tpu.config.server_args import ServerArgs
    from semi_pd_tpu.runtime.engine import Engine
    from semi_pd_tpu.sampling.sampling_params import SamplingParams

    cfg = ModelConfig(
        architecture="LlamaForCausalLM", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, max_position_embeddings=256,
        context_length=256, dtype="float32",
    )
    eng = Engine(
        server_args=ServerArgs(model_path="", random_weights=True,
                               page_size=4, max_total_tokens=512),
        model_config=cfg,
    )
    assert isinstance(eng.scheduler.tree_cache, NativeRadixCache)
    sp = SamplingParams(max_new_tokens=6, temperature=0.0, ignore_eos=True)
    p = list(range(20))
    o1 = eng.generate(input_ids=p, sampling_params=sp)
    o2 = eng.generate(input_ids=p, sampling_params=sp)
    assert o2["meta_info"]["cached_tokens"] >= 16
    assert o1["output_ids"] == o2["output_ids"]
    eng.flush_cache()
    eng.scheduler.check_memory()
