"""Adaptive overlap-ring depth: the scheduler re-sizes its in-flight ring to
ceil(readback / step) so the fixed D2H latency of remote/tunneled TPU
attachments (~45ms measured vs ~1ms decode steps) is amortized, bounded by
the max_stall_ms cycle cap and slew-limited 2x per adjustment.

Drives the real controller (`_account_costs` -> `_adapt_depth`) with an
injected deterministic cost model, like tests/test_semi_pd_cadence.py.
"""

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.config.server_args import ServerArgs
from semi_pd_tpu.runtime.scheduler import _RingEntry


def make_scheduler(**kw):
    from transformers import LlamaConfig as HFLlamaConfig

    from semi_pd_tpu.runtime.engine import Engine

    hf_cfg = HFLlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, tie_word_embeddings=False,
    )
    mc = ModelConfig.from_hf_config(hf_cfg, dtype="float32")
    args = ServerArgs(
        model_path="", random_weights=True, page_size=16,
        max_total_tokens=4096, enable_semi_pd=True, **kw,
    )
    return Engine(server_args=args, model_config=mc).scheduler


def feed_decode_cycles(s, n, readback, step):
    """Feed n decode-only flush cycles at the injected costs."""
    for _ in range(n):
        depth = s.overlap_depth
        entries = [
            _RingEntry(kind="decode", hb=None, tokens=None, logprobs=None,
                       epochs=[])
            for _ in range(depth)
        ]
        s._readback_cost = readback  # measured at flush IRL
        s._account_costs(entries, readback + depth * step)


def test_depth_grows_on_high_latency_attachment():
    """readback 48ms / step 1ms: the ring must grow toward 48 (2x per cycle
    from the floor of 4), within the 200ms default stall cap."""
    s = make_scheduler(decode_slo_ms=50.0)
    assert s.overlap_depth == 4
    feed_decode_cycles(s, 1, readback=48e-3, step=1e-3)
    assert s.overlap_depth == 8  # slew-limited: at most 2x per adjustment
    # The step-cost EWMA is itself slew-limited (0.9x per cycle from its 5ms
    # prior), so convergence takes ~20 cycles — a couple of seconds of real
    # serving at 50-100ms cycles.
    feed_decode_cycles(s, 24, readback=48e-3, step=1e-3)
    # step EWMA ~1ms -> target ceil(48/1)=48 <= stall cap (200-48)/1=152
    # and <= max_overlap_depth 64
    assert 40 <= s.overlap_depth <= 64


def test_depth_stays_at_floor_on_fast_attachment():
    """readback ~0 (local device): no amortization needed; depth stays at
    the configured floor."""
    s = make_scheduler()
    feed_decode_cycles(s, 6, readback=0.2e-3, step=5e-3)
    assert s.overlap_depth == 4


def test_stall_cap_bounds_depth():
    """max_stall_ms caps the whole cycle: depth <= (stall - readback)/step."""
    s = make_scheduler(max_stall_ms=60.0)
    feed_decode_cycles(s, 10, readback=40e-3, step=2e-3)
    # cap = (60-40)/2 = 10 even though amortization wants 20
    assert s.overlap_depth <= 10


def test_pinned_depth_never_adapts():
    """--num-continuous-decode-steps pins the ring (reference flag: N decode
    iterations per loop); adaptation must not touch it."""
    s = make_scheduler(num_continuous_decode_steps=2)
    feed_decode_cycles(s, 6, readback=48e-3, step=1e-3)
    assert s.overlap_depth == 2


def test_ring_target_capped_by_remaining_tokens():
    """Steps past every request's token budget are waste: the flush
    threshold is capped by the largest remaining max_new_tokens."""
    from semi_pd_tpu.runtime.req import Req
    from semi_pd_tpu.sampling.sampling_params import SamplingParams

    s = make_scheduler()
    s.overlap_depth = 32
    r = Req(rid="x", input_ids=[1, 2, 3],
            sampling_params=SamplingParams(max_new_tokens=5),
            eos_token_ids=[])
    r.output_ids = [7, 7]
    s.running = [r]
    assert s._ring_target() == 3  # 5 budgeted - 2 produced
    s.running = []
    assert s._ring_target() == 32
