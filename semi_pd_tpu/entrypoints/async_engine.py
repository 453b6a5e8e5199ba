"""Async serving wrapper around the in-process Engine.

Role of the reference's TokenizerManager request-state plumbing
(srt/managers/tokenizer_manager.py:129,463,907 — async request map, streaming
fan-in) without the ZMQ process boundaries: one background thread runs the
scheduler loop; per-request asyncio queues stream token deltas to HTTP
handlers."""

from __future__ import annotations

import asyncio
import logging
import queue
import threading
import time
from typing import Any, AsyncIterator, Dict, Optional

from semi_pd_tpu.runtime.engine import Engine
from semi_pd_tpu.runtime.req import FinishReason, Req

logger = logging.getLogger(__name__)


class AsyncEngine:
    def __init__(self, engine: Engine):
        self.engine = engine
        self.loop: Optional[asyncio.AbstractEventLoop] = None
        self._queues: Dict[str, asyncio.Queue] = {}
        self._wake = threading.Event()
        self._stop = False
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._lock = threading.Lock()
        # jobs the tick thread runs between ticks (score/encode need the
        # runner but must not race the scheduler loop)
        self._jobs: "queue.Queue" = queue.Queue()
        self.last_step_time = time.monotonic()

    def start(self, loop: asyncio.AbstractEventLoop) -> None:
        self.loop = loop
        self._thread.start()
        # Watchdog (reference scheduler.py:1455 watchdog_thread): if a tick
        # wedges past --watchdog-timeout while work exists, dump state and
        # abort everything rather than hang clients forever.
        t = threading.Thread(target=self._watchdog, daemon=True)
        t.start()

    def _watchdog(self) -> None:
        timeout = self.engine.server_args.watchdog_timeout
        while not self._stop:
            time.sleep(min(timeout / 4, 30))
            if not self.engine.scheduler.has_work():
                continue
            if time.monotonic() - self.last_step_time > timeout:
                import faulthandler, json, sys

                logger.error(
                    "watchdog: no scheduler progress for %.0fs "
                    "(running=%d waiting=%d) — dumping stacks and failing "
                    "in-flight requests",
                    timeout,
                    len(self.engine.scheduler.running),
                    len(self.engine.scheduler.waiting),
                )
                # State autopsy (reference utils.py:1405 pyspy_dump_schedulers):
                # ring contents, in-flight shapes, last-dispatch ages,
                # allocator occupancy — readable even while the device is
                # wedged (dump_state touches no device arrays).
                try:
                    print(
                        "watchdog state dump: "
                        + json.dumps(self.engine.scheduler.dump_state()),
                        file=sys.stderr, flush=True,
                    )
                except Exception:  # noqa: BLE001
                    logger.exception("watchdog state dump failed")
                faulthandler.dump_traceback(file=sys.stderr)
                self._fail_all()
                self.last_step_time = time.monotonic()

    def shutdown(self) -> None:
        self._stop = True
        self._wake.set()
        # multi-host: release follower processes from their recv loop
        close = getattr(self.engine.runner, "close", None)
        if close is not None:
            close()

    # ------------------------------------------------------------- loop
    def _run(self) -> None:
        sched = self.engine.scheduler
        while not self._stop:
            while not self._jobs.empty():
                fn, fut, loop = self._jobs.get()
                try:
                    res = fn()
                    loop.call_soon_threadsafe(fut.set_result, res)
                except Exception as e:  # noqa: BLE001
                    loop.call_soon_threadsafe(fut.set_exception, e)
            if not sched.has_work():
                self._wake.wait(timeout=0.05)
                self._wake.clear()
                continue
            try:
                produced = sched.tick()
            except Exception:
                logger.exception("scheduler tick crashed")
                self._fail_all()
                continue
            self.last_step_time = time.monotonic()
            for req, tok in produced:
                if tok < 0:
                    continue
                self.engine._post_token(req)
                self._emit(req)

    def _emit(self, req: Req) -> None:
        q = self._queues.get(req.rid)
        if q is None or self.loop is None:
            return
        item = self.engine._to_output(req)
        item["finished"] = req.finished
        if self.engine.server_args.stream_output and req.stream:
            # reference tokenizer_manager.py:952: with --stream-output each
            # chunk carries only the NEW token ids (text deltas already
            # stream incrementally either way)
            ids = item["output_ids"]
            off = getattr(req, "_stream_offset", 0)
            item["output_ids"] = ids[off:]
            req._stream_offset = len(ids)
        self.loop.call_soon_threadsafe(q.put_nowait, item)
        if req.finished:
            with self._lock:
                self._queues.pop(req.rid, None)

    def _fail_all(self) -> None:
        with self._lock:
            for rid, q in list(self._queues.items()):
                req = self.engine.scheduler.reqs_by_rid.get(rid)
                if req is not None:
                    req.finish_reason = FinishReason.ABORT
                if self.loop:
                    self.loop.call_soon_threadsafe(
                        q.put_nowait, {"error": "internal scheduler error", "finished": True}
                    )
            self._queues.clear()

    # ------------------------------------------------------------- API
    async def generate(
        self,
        prompt: Optional[str] = None,
        input_ids: Optional[list] = None,
        sampling_params: Optional[dict] = None,
        stream: bool = False,
        rid: Optional[str] = None,
        return_logprob: bool = False,
        top_logprobs_num: int = 0,
        image_data=None,
        lora_path: Optional[str] = None,
        session_params: Optional[dict] = None,
        input_embeds=None,
    ) -> AsyncIterator[Dict[str, Any]]:
        if input_embeds is not None and session_params:
            raise ValueError("input_embeds is not supported inside sessions")
        if session_params:
            # branch-from-turn sessions (reference Session.create_req);
            # built on the tick thread: the session tree is also mutated
            # there and the prompt must snapshot a consistent turn history
            req = await self.run_job(lambda: self.engine.make_session_request(
                session_params, prompt=prompt, input_ids=input_ids,
                sampling_params=sampling_params, rid=rid, stream=stream,
                return_logprob=return_logprob,
                top_logprobs_num=top_logprobs_num, lora_path=lora_path,
            ))
        else:
            req = self.engine.make_request(
                prompt=prompt, input_ids=input_ids,
                sampling_params=sampling_params,
                rid=rid, stream=stream, return_logprob=return_logprob,
                top_logprobs_num=top_logprobs_num,
                image_data=image_data, lora_path=lora_path,
                input_embeds=input_embeds,
            )
        q: asyncio.Queue = asyncio.Queue()
        with self._lock:
            self._queues[req.rid] = q
        self.engine.scheduler.add_request(req)
        self._wake.set()
        while True:
            item = await q.get()
            yield item
            if item.get("finished"):
                return

    async def run_job(self, fn):
        """Run a callable on the tick thread (serialized with scheduling)."""
        loop = asyncio.get_running_loop()
        fut = loop.create_future()
        self._jobs.put((fn, fut, loop))
        self._wake.set()
        return await fut

    async def generate_full(self, **kw) -> Dict[str, Any]:
        last = None
        async for item in self.generate(**kw):
            last = item
        return last

    def abort(self, rid: str) -> None:
        self.engine.scheduler.abort_request(rid)
        with self._lock:
            q = self._queues.pop(rid, None)
        if q is not None and self.loop is not None:
            self.loop.call_soon_threadsafe(
                q.put_nowait, {"error": "aborted", "finished": True, "meta_info": {}}
            )
