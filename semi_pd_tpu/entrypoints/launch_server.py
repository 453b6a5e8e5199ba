"""Server launcher: ``python -m semi_pd_tpu.entrypoints.launch_server ...``

Reference: python/sglang/launch_server.py + srt/entrypoints/http_server.py
launch_server / engine.py _launch_semi_pd_subprocesses. One process: the
subprocess tree (tokenizer / P scheduler / D scheduler / detokenizer wired by
ZMQ) collapses into the in-process AsyncEngine; --enable-semi-pd switches the
scheduler's tick discipline, not the process topology.
"""

from __future__ import annotations

import asyncio
import logging
import sys
import time

from aiohttp import web

from semi_pd_tpu.config.server_args import prepare_server_args
from semi_pd_tpu.entrypoints.async_engine import AsyncEngine
from semi_pd_tpu.entrypoints.http_server import build_app
from semi_pd_tpu.parallel.mesh import create_mesh
from semi_pd_tpu.runtime.engine import Engine

logger = logging.getLogger(__name__)


def main(argv=None):
    args = prepare_server_args(argv if argv is not None else sys.argv[1:])
    logging.basicConfig(
        level=getattr(logging, args.log_level.upper(), logging.INFO),
        format="[%(asctime)s %(name)s] %(message)s",
    )
    if args.log_level_http:
        logging.getLogger("aiohttp.access").setLevel(
            getattr(logging, args.log_level_http.upper(), logging.INFO))
    from semi_pd_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    if args.nnodes > 1:
        from semi_pd_tpu.utils.multihost import init_multihost

        init_multihost(args)  # before any other jax call
        if args.node_rank > 0:
            # follower hosts replay node 0's device transactions; no HTTP
            from semi_pd_tpu.runtime.mirror import follower_main

            follower_main(args)
            return
    mesh = create_mesh(tp_size=args.tp_size, dp_size=args.dp_size)
    engine = Engine(server_args=args, mesh=mesh)
    if not args.skip_server_warmup:
        # one tiny generation compiles the dominant (T, B) buckets before the
        # first real request hits (reference srt/warmup.py + generate_warmup)
        from semi_pd_tpu.sampling.sampling_params import SamplingParams

        t0 = time.monotonic()
        engine.generate(
            input_ids=[[1, 2, 3, 4, 5, 6, 7, 8]],
            sampling_params=SamplingParams(
                max_new_tokens=4, temperature=0.0, ignore_eos=True
            ),
        )
        logger.info("warmup generation done in %.1fs", time.monotonic() - t0)
    if args.warmups:
        from semi_pd_tpu.utils.warmup import execute_warmups

        execute_warmups([w for w in args.warmups.split(",") if w], engine)
    async_engine = AsyncEngine(engine)

    async def _serve():
        loop = asyncio.get_running_loop()
        async_engine.start(loop)
        app = build_app(async_engine)
        runner = web.AppRunner(app)
        await runner.setup()
        site = web.TCPSite(runner, args.host, args.port)
        await site.start()
        logger.info("serving on http://%s:%d (semi_pd=%s)", args.host, args.port, args.enable_semi_pd)
        while True:
            await asyncio.sleep(3600)

    try:
        asyncio.run(_serve())
    except KeyboardInterrupt:
        async_engine.shutdown()


if __name__ == "__main__":
    main()
