"""Scheduling priority policies (reference schedule_policy.py:58-71
calc_priority and :213 _sort_by_dfs_weight)."""

import numpy as np

from semi_pd_tpu.mem.radix_cache import RadixCache
from semi_pd_tpu.runtime.req import Req
from semi_pd_tpu.runtime.schedule_policy import sort_waiting_queue
from semi_pd_tpu.sampling.sampling_params import SamplingParams


def _req(ids, out=8):
    return Req(
        rid=str(ids), input_ids=list(ids),
        sampling_params=SamplingParams(max_new_tokens=out),
    )


def _tree(page_size=2):
    freed = []
    return RadixCache(page_size, freed.extend)


def test_lpm_orders_by_prefix_and_memoizes():
    tree = _tree()
    tree.insert([1, 2, 3, 4, 5, 6], np.arange(3, dtype=np.int32))
    a = _req([9, 9, 9, 9])          # no match
    b = _req([1, 2, 3, 4, 7, 7])    # 2 pages
    c = _req([1, 2, 8, 8])          # 1 page
    out = sort_waiting_queue("lpm", [a, b, c], tree)
    assert out == [b, c, a]
    v = tree.version
    out2 = sort_waiting_queue("lpm", [a, b, c], tree)
    assert out2 == [b, c, a] and tree.version == v
    # memo invalidates on tree mutation
    tree.insert([9, 9, 9, 9], np.arange(100, 102, dtype=np.int32))
    out3 = sort_waiting_queue("lpm", [a, b, c], tree)
    assert out3[0] in (a, b)  # a now matches 2 pages too


def test_dfs_weight_groups_shared_prefixes():
    tree = _tree()
    tree.insert([1, 2, 3, 4], np.arange(2, dtype=np.int32))
    tree.insert([5, 6], np.arange(10, 11, dtype=np.int32))
    # heavy family: three requests under the [1, 2] subtree
    f1 = _req([1, 2, 3, 4, 9])
    f2 = _req([1, 2, 3, 4, 8])
    f3 = _req([1, 2, 7, 7])
    # light family: one request under [5, 6]
    g1 = _req([5, 6, 9, 9])
    # no match at all
    z = _req([9, 9, 9, 9])
    out = sort_waiting_queue("dfs-weight", [g1, z, f1, f3, f2], tree)
    # the [1,2,...] family (weight 3) schedules before the [5,6] family
    # (weight 1); unmatched requests land at the root, last
    idx = {id(r): i for i, r in enumerate(out)}
    assert max(idx[id(r)] for r in (f1, f2, f3)) < idx[id(g1)]
    assert idx[id(z)] == len(out) - 1
    assert sorted(idx.values()) == list(range(5))


def test_dfs_weight_native_tree_falls_back():
    try:
        from semi_pd_tpu.mem.radix_native import NativeRadixCache
    except Exception:
        return
    try:
        tree = NativeRadixCache(2, lambda pages: None)
    except RuntimeError:
        return  # native lib unavailable in this environment
    tree.insert([1, 2, 3, 4], np.arange(2, dtype=np.int32))
    a = _req([1, 2, 3, 4, 5])
    b = _req([9, 9])
    out = sort_waiting_queue("dfs-weight", [b, a], tree)
    assert set(map(id, out)) == {id(a), id(b)}  # lpm fallback, no crash
    assert out[0] is a
