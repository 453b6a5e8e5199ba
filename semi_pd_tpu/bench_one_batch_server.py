"""One-batch latency benchmark against a RUNNING server.

Reference: python/sglang/bench_one_batch_server.py — send one batch of
identical requests to an already-launched HTTP server and report latency /
throughput (the in-process variant is bench_one_batch.py).

    python -m semi_pd_tpu.bench_one_batch_server --base-url http://127.0.0.1:30000 \
        --batch-size 8 --input-len 128 --output-len 32
"""

from __future__ import annotations

import argparse
import concurrent.futures
import json
import time
from urllib import request as _urlreq


def _post(url: str, payload: dict, timeout: float = 600.0) -> dict:
    req = _urlreq.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with _urlreq.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-url", default="http://127.0.0.1:30000")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--input-len", type=int, default=128)
    ap.add_argument("--output-len", type=int, default=32)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args(argv)

    url = args.base_url.rstrip("/") + "/generate"
    ids = list(range(10, 10 + args.input_len))
    payload = {
        "input_ids": ids,
        "sampling_params": {
            "max_new_tokens": args.output_len, "temperature": 0.0,
            "ignore_eos": True,
        },
    }

    lat = []
    for run in range(args.runs):
        t0 = time.monotonic()
        with concurrent.futures.ThreadPoolExecutor(args.batch_size) as ex:
            outs = list(ex.map(lambda _: _post(url, payload),
                               range(args.batch_size)))
        dt = time.monotonic() - t0
        toks = sum(o["meta_info"]["completion_tokens"] for o in outs)
        lat.append((dt, toks))
        print(f"run {run}: {dt:.3f}s  {toks / dt:.1f} tok/s")

    best = min(lat, key=lambda x: x[0])
    print(json.dumps({
        "batch_size": args.batch_size,
        "input_len": args.input_len,
        "output_len": args.output_len,
        "latency_s": round(best[0], 4),
        "output_throughput_tok_s": round(best[1] / best[0], 2),
    }))


if __name__ == "__main__":
    main()
