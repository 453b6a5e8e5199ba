"""Hierarchical (host-tier) KV cache test: evict the device tree, then a
repeat prompt must restore its prefix from host RAM and produce identical
greedy output (reference analog: hiradix cache load/write tests)."""

import numpy as np
import pytest

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.config.server_args import ServerArgs
from semi_pd_tpu.runtime.engine import Engine
from semi_pd_tpu.sampling.sampling_params import SamplingParams


def test_host_tier_restore():
    cfg = ModelConfig(
        architecture="LlamaForCausalLM", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, max_position_embeddings=256,
        context_length=256, dtype="float32",
    )
    eng = Engine(
        server_args=ServerArgs(
            model_path="", random_weights=True, page_size=4,
            max_total_tokens=512, enable_hierarchical_cache=True,
        ),
        model_config=cfg,
    )
    rng = np.random.default_rng(7)
    prompt = rng.integers(0, 64, size=24).tolist()
    sp = SamplingParams(max_new_tokens=6, temperature=0.0, ignore_eos=True)

    o1 = eng.generate(input_ids=prompt, sampling_params=sp)
    eng.scheduler.hicache_ctl.drain()  # write-through is async now
    assert eng.scheduler.host_cache.n_pages() > 0  # write-through happened

    # Nuke the DEVICE tree: only the host tier still holds the prefix
    eng.scheduler.tree_cache.evict(10**9)
    assert eng.scheduler.tree_cache.total_cached_pages() == 0

    o2 = eng.generate(input_ids=prompt, sampling_params=sp)
    assert o2["meta_info"]["cached_tokens"] > 0, "host tier not used"
    assert o2["output_ids"] == o1["output_ids"]
    eng.flush_cache()
    eng.scheduler.check_memory()


def _mk_engine(**kw):
    cfg = ModelConfig(
        architecture="LlamaForCausalLM", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, max_position_embeddings=256,
        context_length=256, dtype="float32",
    )
    return Engine(
        server_args=ServerArgs(
            model_path="", random_weights=True, page_size=4,
            max_total_tokens=512, enable_hierarchical_cache=True, **kw,
        ),
        model_config=cfg,
    )


def test_write_through_never_blocks_tick():
    """Cadence assertion (reference cache_controller.py async write queue):
    with an artificially slow host-tier transfer, decode ticks must keep
    flowing — the blocking device_get happens on the controller thread, not
    the scheduler tick path."""
    import time

    eng = _mk_engine(enable_semi_pd=True, decode_slo_ms=50)
    ctl = eng.scheduler.hicache_ctl

    # compile warmup: the measured gaps must be transfer-wait, not XLA.
    # Mirror the measured workload exactly (1 long decode + 4 one-token
    # shorts) so every decode bucket the run passes through — batch 5 down
    # to batch 1 as the shorts retire — is already compiled.
    rng0 = np.random.default_rng(99)

    def run_mixed(rng):
        sp_long = SamplingParams(
            max_new_tokens=12, temperature=0.0, ignore_eos=True)
        long_req = eng.make_request(
            input_ids=rng.integers(0, 64, size=8).tolist(),
            sampling_params=sp_long)
        eng.scheduler.add_request(long_req)
        shorts = []
        for _ in range(4):
            r = eng.make_request(
                input_ids=rng.integers(0, 64, size=12).tolist(),
                sampling_params=SamplingParams(
                    max_new_tokens=1, temperature=0.0, ignore_eos=True))
            shorts.append(r)
            eng.scheduler.add_request(r)
        gaps = []
        t_last = None
        guard = 0
        while not long_req.finished and guard < 3000:
            produced = eng.scheduler.tick()
            guard += 1
            if any(r is long_req and t >= 0 for r, t in produced):
                now = time.monotonic()
                if t_last is not None:  # inter-token gaps only (not TTFT)
                    gaps.append(now - t_last)
                t_last = now
        return long_req, shorts, gaps

    run_mixed(rng0)  # warmup pass: compiles every bucket the run touches
    ctl.drain()

    slow_s = 0.25
    orig_split = ctl._split

    def slow_split(data, n):
        time.sleep(slow_s)  # simulated slow D2H readback on the worker
        return orig_split(data, n)

    ctl._split = slow_split

    # one long-lived decode + a stream of short finishing requests whose
    # write-throughs continuously occupy the controller
    long_req, shorts, gaps = run_mixed(np.random.default_rng(3))
    assert long_req.finished
    assert all(r.finished for r in shorts)
    # ticks kept flowing: no decode gap approaches even ONE slow transfer
    assert max(gaps) < slow_s, f"decode stalled behind write-through: {gaps}"
    ctl.drain()
    assert eng.scheduler.host_cache.n_pages() > 0


def test_write_through_selective_policy():
    """write_through_selective: one-shot prompts skip the host tier; a
    reused prefix is written (reference hicache_write_policy)."""
    eng = _mk_engine(hicache_write_policy="write_through_selective")
    rng = np.random.default_rng(11)
    sp = SamplingParams(max_new_tokens=2, temperature=0.0, ignore_eos=True)

    p1 = rng.integers(0, 64, size=16).tolist()
    eng.generate(input_ids=p1, sampling_params=sp)
    eng.scheduler.hicache_ctl.drain()
    assert eng.scheduler.host_cache.n_pages() == 0  # first sight: skipped

    eng.generate(input_ids=p1, sampling_params=sp)  # same head: now hot
    eng.scheduler.hicache_ctl.drain()
    assert eng.scheduler.host_cache.n_pages() > 0
    assert eng.scheduler.hicache_ctl.n_skipped >= 1
