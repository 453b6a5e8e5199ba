"""Named warmup registry.

Reference: ``srt/warmup.py`` — a ``@warmup("name")`` decorator registry plus
``execute_warmups(names, tokenizer_manager)`` driven by ``--warmups``; the
in-tree example ("voice_chat") sweeps generation sizes to pre-populate the
kernel caches. Here warmups run against the in-process Engine and their job
is to pre-compile jit buckets (the TPU analog of warming Triton caches):
the first request at a new (T, B, maxP) bucket pays a 10-40s XLA compile,
so a deployment that knows its traffic shape warms those buckets up front.
"""

from __future__ import annotations

import logging
import time
from typing import Callable, Dict, List

logger = logging.getLogger(__name__)

_warmup_registry: Dict[str, Callable] = {}


def warmup(name: str) -> Callable:
    def decorator(fn: Callable) -> Callable:
        _warmup_registry[name] = fn
        return fn

    return decorator


def execute_warmups(names: List[str], engine) -> None:
    for name in names:
        fn = _warmup_registry.get(name)
        if fn is None:
            logger.warning("Could not find custom warmup %r (known: %s)",
                           name, sorted(_warmup_registry))
            continue
        t0 = time.monotonic()
        logger.info("Running warmup %s", name)
        fn(engine)
        logger.info("warmup %s done in %.1fs", name, time.monotonic() - t0)


@warmup("all_buckets")
def all_buckets(engine) -> None:
    """Compile every decode batch bucket and every prefill token bucket
    (the full CUDA-graph-capture-sweep analog; reference captures all decode
    graph sizes at startup, cuda_graph_runner.py:109)."""
    from semi_pd_tpu.sampling.sampling_params import SamplingParams

    args = engine.server_args
    for t in args.prefill_token_buckets:
        prompt = [[1] * max(1, min(t, engine.runner.model_config.context_length - 8))]
        engine.generate(
            input_ids=prompt,
            sampling_params=SamplingParams(
                max_new_tokens=1, temperature=0.0, ignore_eos=True),
        )
    for b in args.decode_bs_buckets:
        if b > (args.max_running_requests or b):
            break
        engine.generate(
            input_ids=[[1, 2, 3, 4]] * b,
            sampling_params=SamplingParams(
                max_new_tokens=2, temperature=0.0, ignore_eos=True),
        )


@warmup("voice_chat")
def voice_chat(engine) -> None:
    """Short-prompt latency shape (the reference's example warmup sweeps
    small generation sizes; srt/warmup.py:32-47). Sweeps the small prefill
    buckets with sampled decoding."""
    from semi_pd_tpu.sampling.sampling_params import SamplingParams

    for size in (8, 32, 128):
        engine.generate(
            input_ids=[list(range(1, size + 1))],
            sampling_params=SamplingParams(
                max_new_tokens=8, temperature=0.8, top_p=0.9, ignore_eos=True),
        )
