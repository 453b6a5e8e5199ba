"""Watchdog state dump (reference srt/utils.py:1405 pyspy_dump_schedulers:
on watchdog fire the reference dumps py-spy stacks of every scheduler; the
single-process TPU equivalent dumps the scheduler's own in-flight state —
ring entries, bucket shapes, dispatch ages, allocator occupancy — which must
be readable WITHOUT touching the device, since the watchdog exists for the
case where the device is wedged)."""

import asyncio
import json
import threading
import time

import numpy as np
import pytest

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.config.server_args import ServerArgs
from semi_pd_tpu.entrypoints.async_engine import AsyncEngine
from semi_pd_tpu.runtime.engine import Engine
from semi_pd_tpu.sampling.sampling_params import SamplingParams


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
            max_total_tokens=512, **kw,
        ),
        model_config=cfg,
    )


def test_dump_state_mid_flight():
    """dump_state reflects real in-flight work and touches no device arrays
    (it must work while the device is wedged)."""
    eng = _mk_engine(enable_semi_pd=True)
    rng = np.random.default_rng(0)
    sp = SamplingParams(max_new_tokens=6, temperature=0.0, ignore_eos=True)
    req = eng.make_request(
        input_ids=rng.integers(0, 64, size=12).tolist(), sampling_params=sp)
    eng.scheduler.add_request(req)
    # a few ticks so something is genuinely in flight
    for _ in range(3):
        eng.scheduler.tick()
    d = eng.scheduler.dump_state()
    s = json.dumps(d)  # must be JSON-serializable as the watchdog prints it
    assert req.rid in s
    for key in ("running", "waiting", "ring", "overlap_depth",
                "last_dispatch_age_s", "allocator"):
        assert key in d, key
    assert "available_pages" in d["allocator"]
    # drain so the module-scoped device isn't left with work
    while not req.finished:
        eng.scheduler.tick()
    eng.scheduler.check_memory()


def test_watchdog_fires_with_state_dump(capfd):
    """Forced hang: the tick thread blocks while work exists; the watchdog
    must print the state dump (with the stuck rid) and fail the request
    rather than hang clients forever."""
    eng = _mk_engine(watchdog_timeout=0.6)
    rng = np.random.default_rng(1)

    hang = threading.Event()
    orig_tick = eng.scheduler.tick

    def hanging_tick():
        hang.wait(timeout=30)  # simulated device wedge inside the tick
        return orig_tick()

    eng.scheduler.tick = hanging_tick

    async def drive():
        ae = AsyncEngine(eng)
        ae.start(asyncio.get_running_loop())
        # backdate progress so the watchdog's first check already trips
        ae.last_step_time = time.monotonic() - 1000.0
        out = await ae.generate_full(
            input_ids=rng.integers(0, 64, size=8).tolist(),
            sampling_params={"max_new_tokens": 4, "temperature": 0.0,
                             "ignore_eos": True},
        )
        return out

    out = asyncio.run(asyncio.wait_for(drive(), timeout=20))
    hang.set()
    eng.scheduler.tick = orig_tick
    # the request was failed, not left hanging
    assert out["finished"]
    assert out.get("error")  # _fail_all surfaces an error payload
    err = capfd.readouterr().err
    assert "watchdog state dump" in err
    line = next(l for l in err.splitlines() if "watchdog state dump" in l)
    d = json.loads(line.split("watchdog state dump: ", 1)[1])
    assert d["waiting"] >= 1 or d["running"] >= 1
