"""End-to-end penalty behavior (reference analog: penaltylib orchestrator
tests + test/srt sampling penalty rows)."""

import numpy as np

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.config.server_args import ServerArgs
from semi_pd_tpu.runtime.engine import Engine
from semi_pd_tpu.sampling.sampling_params import SamplingParams


def _engine():
    cfg = ModelConfig(
        architecture="LlamaForCausalLM", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, max_position_embeddings=256,
        context_length=256, dtype="float32",
    )
    args = ServerArgs(model_path="", random_weights=True, page_size=4,
                      max_total_tokens=1024, seed=3)
    return Engine(server_args=args, model_config=cfg)


def test_presence_penalty_blocks_repeats():
    eng = _engine()
    prompt = list(range(10))

    base = eng.generate(
        input_ids=prompt,
        sampling_params=SamplingParams(max_new_tokens=16, temperature=0.0,
                                       ignore_eos=True),
    )["output_ids"]
    # A tiny random model loops hard under greedy; that's the point.
    assert len(set(base)) < len(base), base

    pen = eng.generate(
        input_ids=prompt,
        sampling_params=SamplingParams(max_new_tokens=16, temperature=0.0,
                                       ignore_eos=True,
                                       presence_penalty=1000.0),
    )["output_ids"]
    # With a huge presence penalty every generated token must be distinct
    assert len(set(pen)) == len(pen), pen
    eng.scheduler.check_memory()


def test_mixed_penalized_and_plain_batch():
    eng = _engine()
    p1 = list(range(8))
    p2 = list(range(8, 16))
    outs = eng.generate(
        input_ids=[p1, p2],
        sampling_params=SamplingParams(max_new_tokens=8, temperature=0.0,
                                       ignore_eos=True,
                                       presence_penalty=1000.0),
    )
    for o in outs:
        assert len(set(o["output_ids"])) == len(o["output_ids"])
    eng.scheduler.check_memory()
