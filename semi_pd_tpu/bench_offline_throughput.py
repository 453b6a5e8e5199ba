"""Offline throughput benchmark CLI.

Reference: python/sglang/bench_offline_throughput.py — submit all requests at
once through the offline Engine, report end-to-end token throughput.
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
    p.add_argument("--num-prompts", type=int, default=64)
    p.add_argument("--input-len", type=int, default=512)
    p.add_argument("--output-len", type=int, default=64)
    p.add_argument("--enable-semi-pd", action="store_true")
    p.add_argument("--bench-layers", type=int, default=16)
    args = p.parse_args(argv)

    from semi_pd_tpu.config.server_args import ServerArgs
    from semi_pd_tpu.runtime.engine import Engine
    from semi_pd_tpu.sampling.sampling_params import SamplingParams

    sa = ServerArgs(
        model_path=args.model_path,
        random_weights=args.random_weights or not args.model_path,
        enable_semi_pd=args.enable_semi_pd,
    )
    model_config = None
    if sa.random_weights and not args.model_path:
        from __graft_entry__ import _llama_config

        model_config = _llama_config(layers=args.bench_layers)
    eng = Engine(server_args=sa, model_config=model_config)

    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(10, 1000, size=args.input_len).tolist()
        for _ in range(args.num_prompts)
    ]
    sp = SamplingParams(max_new_tokens=args.output_len, temperature=0.0,
                        ignore_eos=True)
    eng.generate(input_ids=prompts[:2], sampling_params=SamplingParams(
        max_new_tokens=2, temperature=0.0, ignore_eos=True))  # warmup

    t0 = time.monotonic()
    outs = eng.generate(input_ids=prompts, sampling_params=sp)
    dt = time.monotonic() - t0
    total_out = sum(len(o["output_ids"]) for o in outs)
    total_in = args.num_prompts * args.input_len
    print(json.dumps({
        "num_prompts": args.num_prompts,
        "duration_s": round(dt, 2),
        "input_throughput_tok_s": round(total_in / dt, 1),
        "output_throughput_tok_s": round(total_out / dt, 1),
        "total_throughput_tok_s": round((total_in + total_out) / dt, 1),
    }))


if __name__ == "__main__":
    main()
