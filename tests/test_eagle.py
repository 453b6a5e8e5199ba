"""EAGLE speculative decoding tests.

Output equivalence with plain decode holds for ANY draft net (verification is
exact) — tested with a random draft. Acceptance-rate machinery is exercised
by the NGRAM tests which share verify_and_accept."""

import numpy as np
import pytest

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.config.server_args import ServerArgs
from semi_pd_tpu.runtime.engine import Engine
from semi_pd_tpu.sampling.sampling_params import SamplingParams


def _mk(spec: bool, seed=9):
    cfg = ModelConfig(
        architecture="LlamaForCausalLM", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, max_position_embeddings=512,
        context_length=512, dtype="float32",
    )
    args = ServerArgs(
        model_path="", random_weights=True, page_size=4,
        max_total_tokens=2048, seed=seed,
        speculative_algorithm="EAGLE" if spec else None,
        speculative_num_draft_tokens=3,
    )
    return Engine(server_args=args, model_config=cfg)


@pytest.mark.parametrize("n_reqs", [1, 3])
def test_eagle_greedy_equivalence(n_reqs):
    rng = np.random.default_rng(4)
    prompts = [rng.integers(0, 64, size=10 + 3 * i).tolist() for i in range(n_reqs)]
    sp = SamplingParams(max_new_tokens=15, temperature=0.0, ignore_eos=True)

    base = _mk(spec=False)
    want = base.generate(input_ids=prompts, sampling_params=sp)
    want = [want] if isinstance(want, dict) else want

    eng = _mk(spec=True)
    got = eng.generate(input_ids=prompts, sampling_params=sp)
    got = [got] if isinstance(got, dict) else got

    for w, g in zip(want, got):
        assert w["output_ids"] == g["output_ids"], (w["output_ids"], g["output_ids"])
    assert eng.scheduler.n_spec_steps > 0
    eng.scheduler.check_memory()


def test_eagle_chunked_prefill_and_radix(n_reqs=2):
    eng = _mk(spec=True)
    rng = np.random.default_rng(5)
    prompt = rng.integers(0, 64, size=40).tolist()
    sp = SamplingParams(max_new_tokens=8, temperature=0.0, ignore_eos=True)
    o1 = eng.generate(input_ids=prompt, sampling_params=sp)
    o2 = eng.generate(input_ids=prompt, sampling_params=sp)
    assert o1["output_ids"] == o2["output_ids"]
    assert o2["meta_info"]["cached_tokens"] > 0
    eng.flush_cache()
    eng.scheduler.check_memory()
