"""Static one-batch latency benchmark CLI.

Reference: python/sglang/bench_one_batch.py — fixed batch size / input len /
output len, reports prefill latency, decode latency and throughput (the
reference's CI perf gate, test_bench_one_batch.py).

Usage:
  python -m semi_pd_tpu.bench_one_batch --model-path ... [--random-weights]
      --batch-size 8 --input-len 512 --output-len 32
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", default="")
    p.add_argument("--random-weights", action="store_true")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--input-len", type=int, default=512)
    p.add_argument("--output-len", type=int, default=32)
    p.add_argument("--page-size", type=int, default=16)
    p.add_argument("--max-total-tokens", type=int, default=None)
    p.add_argument("--quantization", default=None)
    p.add_argument("--bench-layers", type=int, default=16)
    args = p.parse_args(argv)

    from semi_pd_tpu.config.server_args import ServerArgs
    from semi_pd_tpu.runtime.engine import Engine
    from semi_pd_tpu.sampling.sampling_params import SamplingParams

    sa = ServerArgs(
        model_path=args.model_path,
        random_weights=args.random_weights or not args.model_path,
        page_size=args.page_size,
        max_total_tokens=args.max_total_tokens
        or (args.batch_size * (args.input_len + args.output_len) + 4096),
        chunked_prefill_size=max(args.input_len * args.batch_size, 2048),
    )
    model_config = None
    if sa.random_weights and not args.model_path:
        from __graft_entry__ import _llama_config

        model_config = _llama_config(layers=args.bench_layers)
    eng = Engine(server_args=sa, model_config=model_config)

    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(10, 1000, size=args.input_len).tolist()
        for _ in range(args.batch_size)
    ]
    sp = SamplingParams(
        max_new_tokens=args.output_len, temperature=0.0, ignore_eos=True
    )

    # Warmup (compiles prefill + decode buckets)
    eng.generate(input_ids=prompts, sampling_params=SamplingParams(
        max_new_tokens=2, temperature=0.0, ignore_eos=True))

    # Timed run: measure TTFT-ish prefill and decode phases via tick timing
    reqs = [eng.make_request(input_ids=pr, sampling_params=sp) for pr in prompts]
    for r in reqs:
        eng.scheduler.add_request(r)
    t0 = time.monotonic()
    t_first = None
    n_tokens = 0
    while eng.scheduler.has_work():
        produced = eng.scheduler.tick()
        for req, tok in produced:
            if tok >= 0:
                n_tokens += 1
                if t_first is None:
                    t_first = time.monotonic()
    t_end = time.monotonic()

    prefill_lat = (t_first - t0) if t_first else 0.0
    decode_time = t_end - (t_first or t0)
    decode_tokens = n_tokens - args.batch_size
    out = {
        "batch_size": args.batch_size,
        "input_len": args.input_len,
        "output_len": args.output_len,
        "prefill_latency_s": round(prefill_lat, 4),
        "prefill_throughput_tok_s": round(
            args.batch_size * args.input_len / max(prefill_lat, 1e-9), 1
        ),
        "median_decode_latency_s": round(
            decode_time / max(args.output_len - 1, 1), 5
        ),
        "decode_throughput_tok_s": round(
            decode_tokens / max(decode_time, 1e-9), 1
        ),
        "total_throughput_tok_s": round(n_tokens / (t_end - t0), 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
