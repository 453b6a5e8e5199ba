"""NGRAM speculative decoding tests: greedy output must match non-speculative
generation exactly; acceptance must actually trigger on repetitive text.

Reference analog: test/srt/test_eagle_infer.py (output equivalence under
speculation)."""

import numpy as np
import pytest

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.config.server_args import ServerArgs
from semi_pd_tpu.runtime.engine import Engine
from semi_pd_tpu.runtime.speculative import ngram_draft
from semi_pd_tpu.runtime.req import Req
from semi_pd_tpu.sampling.sampling_params import SamplingParams


def _mk(spec: bool, seed=3, **kw):
    cfg = ModelConfig(
        architecture="LlamaForCausalLM", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, max_position_embeddings=512,
        context_length=512, dtype="float32",
    )
    args = ServerArgs(
        model_path="", random_weights=True, page_size=4,
        max_total_tokens=2048, seed=seed,
        speculative_algorithm="NGRAM" if spec else None,
        speculative_num_draft_tokens=4, **kw,
    )
    return Engine(server_args=args, model_config=cfg)


def test_ngram_draft_lookup():
    r = Req(rid="x", input_ids=[1, 2, 3, 4, 5, 1, 2, 3], sampling_params=SamplingParams())
    # tail [1,2,3] matched at position 0 -> continuation [4,5,...]
    assert ngram_draft(r, 2) == [4, 5]
    r2 = Req(rid="y", input_ids=[7, 8, 9], sampling_params=SamplingParams())
    assert ngram_draft(r2, 3) == []  # no earlier occurrence


@pytest.mark.parametrize("n_reqs", [1, 3])
def test_spec_greedy_equivalence(n_reqs):
    # Tiny random models loop greedy output -> ngram drafts hit often
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, 64, size=12).tolist() for _ in range(n_reqs)]
    sp = SamplingParams(max_new_tokens=24, temperature=0.0, ignore_eos=True)

    base = _mk(spec=False)
    want = base.generate(input_ids=prompts, sampling_params=sp)
    want = [want] if n_reqs == 1 and isinstance(want, dict) else want

    eng = _mk(spec=True)
    got = eng.generate(input_ids=prompts, sampling_params=sp)
    got = [got] if n_reqs == 1 and isinstance(got, dict) else got

    for w, g in zip(want, got):
        assert w["output_ids"] == g["output_ids"], (w["output_ids"], g["output_ids"])
    assert eng.scheduler.n_spec_accepted > 0, "speculation never accepted a draft"
    eng.scheduler.check_memory()


def test_spec_with_eos_inside_accept():
    # finish via stop token that appears inside an accepted draft run
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, 64, size=10).tolist()
    base = _mk(spec=False, seed=5)
    sp0 = SamplingParams(max_new_tokens=30, temperature=0.0, ignore_eos=True)
    full = base.generate(input_ids=prompt, sampling_params=sp0)["output_ids"]
    if len(set(full)) == len(full):
        pytest.skip("no repetition to stop on")
    # pick a token that appears at position >= 2 as the stop token
    stop_tok = full[5]
    sp = SamplingParams(max_new_tokens=30, temperature=0.0, ignore_eos=True,
                        stop_token_ids=[stop_tok])
    want = base.generate(input_ids=prompt, sampling_params=sp)["output_ids"]

    eng = _mk(spec=True, seed=5)
    got = eng.generate(input_ids=prompt, sampling_params=sp)["output_ids"]
    assert got == want
    eng.scheduler.check_memory()


def test_spec_under_semi_pd_with_concurrent_prefill():
    """NGRAM speculation composes with the semi-PD tick: decode speculation
    proceeds while a long prompt chunk-prefills concurrently (the reference
    forbids speculative + semi-PD outright; we support it) — greedy outputs
    of every request must equal the non-speculative colocated run."""
    rng = np.random.default_rng(7)
    short = [rng.integers(0, 64, size=10).tolist() for _ in range(2)]
    long_p = [rng.integers(0, 64, size=120).tolist()]
    prompts = short + long_p
    sp = SamplingParams(max_new_tokens=20, temperature=0.0, ignore_eos=True)

    base = _mk(spec=False)
    want = base.generate(input_ids=prompts, sampling_params=sp)

    eng = _mk(spec=True, enable_semi_pd=True, chunked_prefill_size=16,
              decode_slo_ms=5.0)
    got = eng.generate(input_ids=prompts, sampling_params=sp)
    for w, g in zip(want, got):
        assert w["output_ids"] == g["output_ids"]
    assert eng.scheduler.n_spec_accepted > 0
    eng.scheduler.check_memory()
