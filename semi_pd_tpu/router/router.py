"""Data-parallel HTTP router with cache-aware load balancing.

Reference: sgl-router/ (Rust, 2,632 LoC — RoundRobin | Random | CacheAware
policies, router.rs:29-45; approximate radix tree per worker, tree.rs;
runtime /add_worker + dead-worker detection, router.rs:788). TPU-native
build: the same policies over aiohttp, and the per-worker approximate prefix
tree is our native C++ radix tree (csrc/radix_tree.cpp) at byte granularity
— one codebase serves both the KV cache and the router.

Cache-aware policy (mirrors the reference's algorithm): if the best worker's
matched prefix exceeds ``cache_threshold`` of the request length, route to it
(KV cache hit); otherwise route to the least-loaded worker. Either way the
routed text is inserted into that worker's tree; trees are evicted to
``max_tree_size`` bytes.
"""

from __future__ import annotations

import argparse
import asyncio
import itertools
import json
import logging
import random
import time
from typing import Dict, List, Optional

import numpy as np

try:
    from aiohttp import ClientSession, ClientTimeout, web
except ImportError:  # pragma: no cover
    web = None

logger = logging.getLogger(__name__)


class WorkerTree:
    """Byte-granular approximate prefix tree per worker."""

    def __init__(self, max_bytes: int = 1 << 24):
        from semi_pd_tpu.mem.radix_cache import RadixCache
        try:
            from semi_pd_tpu.mem.radix_native import NativeRadixCache

            self.tree = NativeRadixCache(1, lambda pages: None)
        except Exception:  # noqa: BLE001
            self.tree = RadixCache(1, lambda pages: None)
        self.max_bytes = max_bytes
        self._page = itertools.count(1)

    def match_len(self, text: str) -> int:
        toks = list(text.encode("utf-8", errors="ignore"))
        pages, _ = self.tree.match_prefix(toks)
        return len(pages)  # page_size=1: pages == chars matched

    def insert(self, text: str) -> None:
        toks = list(text.encode("utf-8", errors="ignore"))
        pages = np.fromiter(
            (next(self._page) % (1 << 30) for _ in toks), np.int32, len(toks)
        )
        self.tree.insert(toks, pages)
        over = self.tree.total_cached_pages() - self.max_bytes
        if over > 0:
            self.tree.evict(over)


class Worker:
    def __init__(self, url: str):
        self.url = url.rstrip("/")
        self.tree = WorkerTree()
        self.inflight = 0
        self.healthy = True


class Router:
    def __init__(self, worker_urls: List[str], policy: str = "cache_aware",
                 cache_threshold: float = 0.5):
        self.workers: List[Worker] = [Worker(u) for u in worker_urls]
        self.policy = policy
        self.cache_threshold = cache_threshold
        self._rr = 0

    # ------------------------------------------------------------- policy
    def pick(self, text: str) -> Worker:
        alive = [w for w in self.workers if w.healthy]
        if not alive:
            raise RuntimeError("no healthy workers")
        if self.policy == "round_robin":
            w = alive[self._rr % len(alive)]
            self._rr += 1
            return w
        if self.policy == "random":
            return random.choice(alive)
        if self.policy == "shortest_queue":
            # reference data_parallel_controller.py:483-489 shortest-queue
            # dispatch: fewest in-flight requests wins (ties: first listed)
            return min(alive, key=lambda w: w.inflight)
        # cache_aware (reference tree.rs + router.rs CacheAware)
        best, best_len = None, -1
        for w in alive:
            m = w.tree.match_len(text)
            if m > best_len:
                best, best_len = w, m
        if text and best_len / max(len(text), 1) >= self.cache_threshold:
            chosen = best
        else:
            chosen = min(alive, key=lambda w: w.inflight)
        chosen.tree.insert(text)
        return chosen

    def add_worker(self, url: str) -> None:
        self.workers.append(Worker(url))

    def remove_worker(self, url: str) -> bool:
        n = len(self.workers)
        self.workers = [w for w in self.workers if w.url != url.rstrip("/")]
        return len(self.workers) < n

    # ------------------------------------------------------------- serving
    def build_app(self) -> "web.Application":
        app = web.Application()
        app["router"] = self
        app.add_routes([
            web.post("/generate", self._proxy_generate),
            web.post("/v1/completions", self._proxy_generate),
            web.post("/v1/chat/completions", self._proxy_generate),
            web.get("/health", self._health),
            web.post("/add_worker", self._add_worker),
            web.post("/remove_worker", self._remove_worker),
            web.get("/workers", self._list_workers),
        ])
        app.cleanup_ctx.append(self._session_ctx)
        return app

    async def _session_ctx(self, app):
        app["session"] = ClientSession(timeout=ClientTimeout(total=1800))
        yield
        await app["session"].close()

    @staticmethod
    def _routing_text(body: dict) -> str:
        if "text" in body and isinstance(body["text"], str):
            return body["text"]
        if "prompt" in body and isinstance(body["prompt"], str):
            return body["prompt"]
        if "messages" in body:
            return json.dumps(body["messages"])[:4096]
        if "input_ids" in body:
            return ",".join(map(str, body["input_ids"][:1024]))
        return ""

    async def _proxy_generate(self, request: "web.Request"):
        body = await request.json()
        w = self.pick(self._routing_text(body))
        w.inflight += 1
        session: ClientSession = request.app["session"]
        try:
            async with session.post(
                w.url + request.path, json=body
            ) as resp:
                if body.get("stream"):
                    out = web.StreamResponse(
                        status=resp.status,
                        headers={"Content-Type": "text/event-stream"},
                    )
                    await out.prepare(request)
                    async for chunk in resp.content.iter_any():
                        await out.write(chunk)
                    await out.write_eof()
                    return out
                data = await resp.read()
                return web.Response(
                    body=data, status=resp.status,
                    content_type=resp.content_type,
                )
        except Exception as e:  # noqa: BLE001
            logger.warning("worker %s failed: %s", w.url, e)
            w.healthy = False
            return web.json_response(
                {"error": {"message": f"worker failed: {e}"}}, status=502
            )
        finally:
            w.inflight -= 1

    async def _health(self, request):
        return web.Response(text="ok")

    async def _add_worker(self, request):
        body = await request.json()
        self.add_worker(body["url"])
        return web.json_response({"success": True})

    async def _remove_worker(self, request):
        body = await request.json()
        return web.json_response({"success": self.remove_worker(body["url"])})

    async def _list_workers(self, request):
        return web.json_response({
            "workers": [
                {"url": w.url, "inflight": w.inflight, "healthy": w.healthy}
                for w in self.workers
            ]
        })


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=30080)
    p.add_argument("--worker-urls", nargs="+", required=True)
    p.add_argument("--policy", default="cache_aware",
                   choices=["cache_aware", "round_robin", "random",
                            "shortest_queue"])
    # reference --load-balance-method (data_parallel_controller.py:483-489
    # round_robin | shortest_queue); alias onto --policy
    p.add_argument("--load-balance-method", dest="policy",
                   default=argparse.SUPPRESS,
                   choices=["cache_aware", "round_robin", "random",
                            "shortest_queue"])
    p.add_argument("--cache-threshold", type=float, default=0.5)
    args = p.parse_args(argv)
    r = Router(args.worker_urls, args.policy, args.cache_threshold)
    web.run_app(r.build_app(), host=args.host, port=args.port)


if __name__ == "__main__":
    main()
