"""Prometheus metrics.

Reference: srt/metrics/collector.py:32-281 — scheduler gauges
(num_running_reqs, num_used_tokens, token_usage, gen_throughput,
num_queue_reqs, cache_hit_rate) and tokenizer counters/histograms
(prompt_tokens_total, generation_tokens_total, TTFT/TPOT/ITL, e2e latency).
Same metric names (sglang:*-compatible namespace semi_pd_tpu:*) so dashboards
port over."""

from __future__ import annotations

import time
from typing import Optional

try:
    from prometheus_client import Counter, Gauge, Histogram

    _HAVE_PROM = True
except ImportError:  # pragma: no cover
    _HAVE_PROM = False

_metrics = {}


def _get(kind, name, doc, **kw):
    if name not in _metrics:
        _metrics[name] = kind(name, doc, **kw)
    return _metrics[name]


def update_gauges(engine) -> None:
    if not _HAVE_PROM:
        return
    s = engine.scheduler
    alloc = engine.runner.page_allocator
    total_pages = alloc.usable_pages
    used = total_pages - alloc.available_pages()

    _get(Gauge, "semi_pd_tpu_num_running_reqs", "running requests").set(len(s.running))
    _get(Gauge, "semi_pd_tpu_num_queue_reqs", "queued requests").set(len(s.waiting))
    _get(Gauge, "semi_pd_tpu_num_used_tokens", "KV tokens in use").set(
        used * s.page_size
    )
    _get(Gauge, "semi_pd_tpu_token_usage", "KV pool utilization").set(
        used / max(total_pages, 1)
    )
    _get(Gauge, "semi_pd_tpu_cache_hit_rate", "radix prefix hit rate").set(
        s.n_cached_prefix_tokens / max(s.n_prefill_tokens + s.n_cached_prefix_tokens, 1)
    )
    _get(Gauge, "semi_pd_tpu_num_retracted_reqs", "retracted requests").set(s.n_retracted)
    _get(Gauge, "semi_pd_tpu_prefill_tokens_total", "prefill tokens").set(s.n_prefill_tokens)
    _get(Gauge, "semi_pd_tpu_generation_tokens_total", "decode tokens").set(s.n_decode_tokens)


def observe_request(prompt_tokens: int, completion_tokens: int, ttft_s: Optional[float], e2e_s: float):
    if not _HAVE_PROM:
        return
    _get(Counter, "semi_pd_tpu_prompt_tokens", "total prompt tokens").inc(prompt_tokens)
    _get(Counter, "semi_pd_tpu_completion_tokens", "total completion tokens").inc(completion_tokens)
    if ttft_s is not None:
        _get(
            Histogram, "semi_pd_tpu_time_to_first_token_seconds", "TTFT",
            buckets=[0.05, 0.1, 0.2, 0.5, 1, 2, 5, 10, 30],
        ).observe(ttft_s)
    _get(
        Histogram, "semi_pd_tpu_e2e_request_latency_seconds", "E2E latency",
        buckets=[0.1, 0.5, 1, 2, 5, 10, 30, 60, 120],
    ).observe(e2e_s)
