"""Router policy tests (reference analog: sgl-router tree.rs unit tests +
py_test)."""

import pytest

from semi_pd_tpu.router.router import Router, WorkerTree


def test_worker_tree_prefix_match():
    t = WorkerTree()
    t.insert("the quick brown fox jumps")
    assert t.match_len("the quick brown cat") == len("the quick brown ")
    assert t.match_len("unrelated") == 0


def test_cache_aware_routing():
    r = Router(["http://a", "http://b"], policy="cache_aware",
               cache_threshold=0.5)
    w1 = r.pick("SYSTEM PROMPT ALPHA + question one")
    # same prefix routes to the same worker (cache hit)
    w2 = r.pick("SYSTEM PROMPT ALPHA + question two about something")
    assert w2 is w1
    # unrelated text balances to the other (least-loaded ties -> either, but
    # after loading w1 it must avoid it)
    w1.inflight = 5
    w3 = r.pick("completely different text with no shared prefix at all")
    assert w3 is not w1


def test_round_robin_and_admin():
    r = Router(["http://a", "http://b"], policy="round_robin")
    picks = [r.pick("x").url for _ in range(4)]
    assert picks == ["http://a", "http://b", "http://a", "http://b"]
    r.add_worker("http://c")
    assert len(r.workers) == 3
    assert r.remove_worker("http://a")
    assert not r.remove_worker("http://nope")
    # dead workers are skipped
    r.workers[0].healthy = False
    assert all(r.pick("y").url != r.workers[0].url for _ in range(3))
