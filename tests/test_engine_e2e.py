"""End-to-end engine tests on the CPU backend with a tiny random HF Llama:
greedy parity vs HF generate through the full stack (scheduler, paged KV,
radix cache, chunked prefill, retraction, semi-PD ticks).

Reference test analogs: test/srt/models/test_generation_models.py (HFRunner vs
SRTRunner) and test_retract_decode.py (fault-injected retraction)."""

import numpy as np
import pytest

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.config.server_args import ServerArgs
from semi_pd_tpu.runtime.engine import Engine
from semi_pd_tpu.sampling.sampling_params import SamplingParams


@pytest.fixture(scope="module")
def hf_model():
    import torch
    from transformers import LlamaConfig as HFLlamaConfig, LlamaForCausalLM as HFLlama

    cfg = HFLlamaConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    return HFLlama(cfg).eval().float(), cfg


def _mk_engine(hf_model, **kw):
    hf, hf_cfg = hf_model
    mc = ModelConfig.from_hf_config(hf_cfg, dtype="float32")
    args = ServerArgs(
        model_path="", random_weights=True, page_size=4,
        max_total_tokens=kw.pop("max_total_tokens", 2048),
        chunked_prefill_size=kw.pop("chunked_prefill_size", 64),
        **kw,
    )
    eng = Engine(server_args=args, model_config=mc)
    # Swap in the HF weights for parity
    from semi_pd_tpu.model_loader.loader import load_params

    eng.runner.params = load_params(
        eng.runner.model, weights=list(hf.state_dict().items())
    )
    return eng


def _hf_greedy(hf_model, prompt_ids, n):
    """Stepwise teacher-forced greedy (no KV cache): the exact reference
    semantic. hf.generate's cached path has different float rounding, which
    flips near-tie argmaxes on tiny random models."""
    import torch

    hf, _ = hf_model
    ids = list(prompt_ids)
    out = []
    with torch.no_grad():
        for _ in range(n):
            tok = int(hf(torch.tensor([ids])).logits[0, -1].argmax())
            out.append(tok)
            ids.append(tok)
    return out


@pytest.mark.parametrize("semi_pd", [False, True])
def test_greedy_parity_and_batching(hf_model, semi_pd):
    eng = _mk_engine(hf_model, enable_semi_pd=semi_pd)
    rng = np.random.default_rng(2)
    prompts = [rng.integers(0, 256, size=n).tolist() for n in (5, 13, 29)]
    want = [_hf_greedy(hf_model, p, 12) for p in prompts]

    sp = SamplingParams(max_new_tokens=12, temperature=0.0, ignore_eos=True)
    outs = eng.generate(input_ids=prompts, sampling_params=sp)
    for o, w in zip(outs, want):
        assert o["output_ids"] == w
    eng.scheduler.check_memory()


def test_radix_prefix_reuse(hf_model):
    eng = _mk_engine(hf_model)
    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, size=40).tolist()
    sp = SamplingParams(max_new_tokens=6, temperature=0.0, ignore_eos=True)

    o1 = eng.generate(input_ids=base, sampling_params=sp)
    assert o1["meta_info"]["cached_tokens"] == 0
    # Same prompt again: long cached prefix, same greedy tokens
    o2 = eng.generate(input_ids=base, sampling_params=sp)
    assert o2["meta_info"]["cached_tokens"] >= 32
    assert o2["output_ids"] == o1["output_ids"]
    # Diverging suffix still shares the common prefix pages
    o3 = eng.generate(input_ids=base[:20] + [9, 9, 9, 9], sampling_params=sp)
    assert o3["meta_info"]["cached_tokens"] >= 16
    eng.flush_cache()
    eng.scheduler.check_memory()


def test_chunked_prefill(hf_model):
    eng = _mk_engine(hf_model, chunked_prefill_size=8)
    rng = np.random.default_rng(4)
    prompt = rng.integers(0, 256, size=50).tolist()  # >> chunk size
    want = _hf_greedy(hf_model, prompt, 8)
    sp = SamplingParams(max_new_tokens=8, temperature=0.0, ignore_eos=True)
    out = eng.generate(input_ids=prompt, sampling_params=sp)
    assert out["output_ids"] == want
    eng.flush_cache()
    eng.scheduler.check_memory()


@pytest.mark.parametrize("semi_pd", [False, True])
def test_retraction_under_memory_pressure(hf_model, semi_pd):
    # Pool of 144 tokens; three requests that each need ~72 tokens of KV force
    # decode-OOM retraction; outputs must still match HF greedy exactly.
    eng = _mk_engine(
        hf_model, max_total_tokens=144, enable_semi_pd=semi_pd,
        disable_radix_cache=True,
    )
    rng = np.random.default_rng(5)
    prompts = [rng.integers(0, 256, size=40).tolist() for _ in range(3)]
    want = [_hf_greedy(hf_model, p, 30) for p in prompts]
    sp = SamplingParams(max_new_tokens=30, temperature=0.0, ignore_eos=True)
    outs = eng.generate(input_ids=prompts, sampling_params=sp)
    assert eng.scheduler.n_retracted >= 1, "test should exercise retraction"
    for o, w in zip(outs, want):
        assert o["output_ids"] == w
    eng.scheduler.check_memory()


def test_forced_retraction_fault_injection(hf_model, monkeypatch):
    """SEMI_PD_TPU_TEST_RETRACT forces retractions without memory pressure
    (reference SGLANG_TEST_RETRACT, semi_pd_decode_scheduler.py:42-43,103-105);
    greedy outputs must be unaffected."""
    monkeypatch.setenv("SEMI_PD_TPU_TEST_RETRACT", "1")
    eng = _mk_engine(hf_model, disable_radix_cache=True)
    rng = np.random.default_rng(17)
    prompts = [rng.integers(0, 256, size=12).tolist() for _ in range(4)]
    # 24 tokens: keeps running>1 long enough for all 3 injections even with
    # the split flush (requests join `running` one flush later).
    want = [_hf_greedy(hf_model, p, 24) for p in prompts]
    sp = SamplingParams(max_new_tokens=24, temperature=0.0, ignore_eos=True)
    outs = eng.generate(input_ids=prompts, sampling_params=sp)
    assert eng.scheduler.n_retracted >= 3
    for o, w in zip(outs, want):
        assert o["output_ids"] == w
    eng.scheduler.check_memory()


def test_stop_conditions(hf_model):
    eng = _mk_engine(hf_model)
    rng = np.random.default_rng(6)
    prompt = rng.integers(0, 256, size=10).tolist()
    want = _hf_greedy(hf_model, prompt, 20)

    # stop_token_ids: stop at first occurrence of want[4]
    sp = SamplingParams(
        max_new_tokens=20, temperature=0.0, ignore_eos=True,
        stop_token_ids=[want[4]],
    )
    out = eng.generate(input_ids=prompt, sampling_params=sp)
    assert out["output_ids"] == want[:5]
    assert out["meta_info"]["finish_reason"] == "stop_token"
    eng.scheduler.check_memory()


def test_split_flush_holds_extends(hf_model):
    """Split flush: the depth-triggered flush must HOLD extend entries (so
    the blocking decode readback never waits on a prefill chunk's device
    time — the chunk executes under the D2H latency) and drain them at the
    next flush, with greedy parity and memory invariants intact."""
    eng = _mk_engine(
        hf_model, enable_semi_pd=True, chunked_prefill_size=32,
        disable_radix_cache=True,
    )
    s = eng.scheduler
    held_seen = []
    orig = s._flush_ring

    def spy(hold_extends=False):
        out = orig(hold_extends=hold_extends)
        held_seen.append(len(s._held))
        return out

    s._flush_ring = spy
    rng = np.random.default_rng(11)
    # One short prompt reaches decode fast; long prompts keep 32-token
    # chunks streaming through the same flush cycles.
    prompts = [rng.integers(0, 256, size=n).tolist() for n in (12, 200, 180)]
    want = [_hf_greedy(hf_model, p, 12) for p in prompts]
    sp = SamplingParams(max_new_tokens=12, temperature=0.0, ignore_eos=True)
    outs = eng.generate(input_ids=prompts, sampling_params=sp)
    assert max(held_seen) >= 1, "mixed cycles should exercise the held path"
    assert held_seen[-1] == 0, "held extends must drain by completion"
    for o, w in zip(outs, want):
        assert o["output_ids"] == w
    s.drain()  # a stale in-flight decode of finished reqs may remain
    assert not s._held and not s._ring
    s.check_memory()


@pytest.mark.quick
@pytest.mark.parametrize("semi_pd", [False, True])
def test_input_embeds_matches_token_ids(hf_model, semi_pd):
    """input_embeds end-to-end (reference io_struct.py:46-47,281
    GenerateReqInput.input_embeds): generating from precomputed embedding
    rows must match generating from the equivalent token ids exactly, and
    the placeholder-id prompt must never touch the radix cache."""
    hf, _ = hf_model
    eng = _mk_engine(hf_model, enable_semi_pd=semi_pd)
    rng = np.random.default_rng(9)
    prompt = rng.integers(1, 256, size=21).tolist()
    sp = SamplingParams(max_new_tokens=10, temperature=0.0, ignore_eos=True)

    want = eng.generate(input_ids=prompt, sampling_params=sp)["output_ids"]

    embeds = hf.model.embed_tokens.weight.detach().numpy()[prompt]
    got = eng.generate(input_embeds=embeds, sampling_params=sp)
    assert got["output_ids"] == want

    # batch form: [N1,H] and [N2,H] together
    prompt2 = rng.integers(1, 256, size=9).tolist()
    want2 = eng.generate(input_ids=prompt2, sampling_params=sp)["output_ids"]
    embeds2 = hf.model.embed_tokens.weight.detach().numpy()[prompt2]
    outs = eng.generate(input_embeds=[embeds, embeds2], sampling_params=sp)
    assert [o["output_ids"] for o in outs] == [want, want2]

    # Radix exclusion: a second embeds request reports no cached prefix even
    # though its placeholder ids equal the first's (all zeros).
    again = eng.generate(input_embeds=embeds, sampling_params=sp)
    assert again["meta_info"]["cached_tokens"] == 0
    assert again["output_ids"] == want

    # Validation errors surface as ValueError (HTTP layer maps to 400)
    with pytest.raises(ValueError):
        eng.make_request(input_embeds=embeds[:, :-1], sampling_params=sp)
    with pytest.raises(ValueError):
        eng.make_request(input_ids=prompt, input_embeds=embeds,
                         sampling_params=sp)
