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


def test_shortest_queue_routing():
    r = Router(["http://a", "http://b", "http://c"], policy="shortest_queue")
    r.workers[0].inflight = 3
    r.workers[1].inflight = 1
    r.workers[2].inflight = 2
    assert r.pick("anything").url == "http://b"
    r.workers[1].inflight = 9
    assert r.pick("anything").url == "http://c"
    # dead workers are skipped even when least loaded
    r.workers[2].inflight = 0
    r.workers[2].healthy = False
    assert r.pick("x").url == "http://a"
