"""Online serving benchmark CLI.

Reference: python/sglang/bench_serving.py (+ semi-PD additions
--benchmark-save-path and --request-rate-extent rate sweeping,
bench_serving.py:1402-1415,1642-1653) and evaluation/show_result.py's
percentile extraction — the experimental design BASELINE.md reproduces.

Drives an HTTP server (/generate streaming) with poisson open-loop arrivals
and reports mean/p50/p80/p90/p95/p99 TTFT, mean/p90/p95/p99 TPOT, p90/95/99
ITL, output throughput, and goodput under TTFT+TPOT SLOs.

Usage:
  python -m semi_pd_tpu.bench_serving --host 127.0.0.1 --port 30000 \
      --num-prompts 200 --request-rate 5 --request-rate-extent 10 \
      --benchmark-save-path out.jsonl
"""

from __future__ import annotations

import argparse
import asyncio
import json
import sys
import time
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

try:
    import aiohttp
except ImportError:  # pragma: no cover
    aiohttp = None


@dataclass
class ReqResult:
    arrival: float
    token_times: List[float] = field(default_factory=list)
    prompt_len: int = 0
    output_len: int = 0
    error: Optional[str] = None


def synth_requests(n, prompt_mean, output_len, tokenizer=None, seed=0):
    """ShareGPT-like synthetic lengths (lognormal-ish around the mean)."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        pl = int(np.clip(rng.normal(prompt_mean, prompt_mean / 3), 16, 4 * prompt_mean))
        ids = rng.integers(10, 1000, size=pl).tolist()
        out.append((ids, output_len))
    return out


async def _one_request(session, url, ids, out_len, res: ReqResult, t0):
    payload = {
        "input_ids": ids,
        "stream": True,
        "sampling_params": {
            "max_new_tokens": out_len, "temperature": 0.0, "ignore_eos": True,
        },
    }
    res.prompt_len = len(ids)
    try:
        async with session.post(url, json=payload) as resp:
            async for line in resp.content:
                if not line.startswith(b"data:"):
                    continue
                body = line[5:].strip()
                if body == b"[DONE]":
                    break
                res.token_times.append(time.monotonic() - t0)
        res.output_len = len(res.token_times)
    except Exception as e:  # noqa: BLE001
        res.error = str(e)


async def run_rate(base_url, requests, rate, seed=0):
    rng = np.random.default_rng(seed)
    arrivals = np.cumsum(rng.exponential(1.0 / rate, size=len(requests)))
    results = [ReqResult(arrival=a) for a in arrivals]
    t0 = time.monotonic()
    url = base_url + "/generate"
    async with aiohttp.ClientSession(
        timeout=aiohttp.ClientTimeout(total=1800)
    ) as session:
        tasks = []
        for (ids, out_len), res, a in zip(requests, results, arrivals):
            delay = a - (time.monotonic() - t0)
            if delay > 0:
                await asyncio.sleep(delay)
            tasks.append(
                asyncio.create_task(
                    _one_request(session, url, ids, out_len, res, t0)
                )
            )
        await asyncio.gather(*tasks)
    wall = time.monotonic() - t0
    return results, wall


def pct(a, q):
    return float(np.percentile(a, q)) if len(a) else 0.0


def summarize(results: List[ReqResult], wall: float, ttft_slo=None, tpot_slo=None):
    ttfts, tpots, itls = [], [], []
    n_tokens = 0
    ok_slo = 0
    errors = 0
    for r in results:
        if r.error or not r.token_times:
            errors += 1 if r.error else 0
            continue
        ttft = r.token_times[0] - r.arrival
        ttfts.append(ttft)
        n_tokens += len(r.token_times)
        tpot = None
        if len(r.token_times) > 1:
            d = np.diff(r.token_times)
            itls.extend(d.tolist())
            tpot = (r.token_times[-1] - r.token_times[0]) / (len(r.token_times) - 1)
            tpots.append(tpot)
        if ttft_slo and tpot_slo and tpot is not None:
            if ttft <= ttft_slo and tpot <= tpot_slo:
                ok_slo += 1
    itls = np.array(itls)
    s = {
        "completed": len(ttfts),
        "errors": errors,
        "duration_s": round(wall, 2),
        "output_throughput_tok_s": round(n_tokens / wall, 2),
        "mean_ttft_ms": round(float(np.mean(ttfts)) * 1e3, 1) if ttfts else 0,
        **{f"p{q}_ttft_ms": round(pct(ttfts, q) * 1e3, 1) for q in (50, 80, 90, 95, 99)},
        "mean_tpot_ms": round(float(np.mean(tpots)) * 1e3, 2) if tpots else 0,
        **{f"p{q}_tpot_ms": round(pct(tpots, q) * 1e3, 2) for q in (90, 95, 99)},
        **{f"p{q}_itl_ms": round(pct(itls, q) * 1e3, 2) for q in (90, 95, 99)},
    }
    if ttft_slo and tpot_slo:
        s["goodput_rps"] = round(ok_slo / wall, 3)
    return s


async def amain(args):
    base = f"http://{args.host}:{args.port}"
    reqs = synth_requests(
        args.num_prompts, args.prompt_len, args.output_len, seed=args.seed
    )
    rates = [args.request_rate]
    if args.request_rate_extent and args.request_rate_extent > args.request_rate:
        # sweep like the reference: 5 evenly spaced rates up to the extent
        rates = list(
            np.linspace(args.request_rate, args.request_rate_extent, args.num_sweep)
        )
    all_out = []
    for rate in rates:
        results, wall = await run_rate(base, reqs, rate, seed=args.seed)
        s = summarize(results, wall, args.ttft_slo, args.tpot_slo)
        s["request_rate"] = round(float(rate), 3)
        all_out.append(s)
        print(json.dumps(s))
    if args.benchmark_save_path:
        with open(args.benchmark_save_path, "w") as f:
            for s in all_out:
                f.write(json.dumps(s) + "\n")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=30000)
    p.add_argument("--num-prompts", type=int, default=200)
    p.add_argument("--prompt-len", type=int, default=512)
    p.add_argument("--output-len", type=int, default=128)
    p.add_argument("--request-rate", type=float, default=4.0)
    p.add_argument("--request-rate-extent", type=float, default=None)
    p.add_argument("--num-sweep", type=int, default=5)
    p.add_argument("--ttft-slo", type=float, default=2.0)
    p.add_argument("--tpot-slo", type=float, default=0.05)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--benchmark-save-path", default=None)
    args = p.parse_args(argv)
    if aiohttp is None:
        print("aiohttp unavailable", file=sys.stderr)
        sys.exit(1)
    asyncio.run(amain(args))


if __name__ == "__main__":
    main()
