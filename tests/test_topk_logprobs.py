"""Top-k logprob parity vs HF through the full engine stack.

Reference: srt/layers/logits_processor.py:194 (output_top_logprobs_val/idx,
input_top_logprobs) and openai_api/adapter.py:702 (completions logprobs=N).
The device-side extraction (ModelRunner.step_topk_host / score_topk_host)
must match HF teacher-forced top-k ids and values through the bucketed,
paged-KV step programs — both the extend (first token) and decode paths."""

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
        max_total_tokens=2048, chunked_prefill_size=64, **kw,
    )
    eng = Engine(server_args=args, model_config=mc)
    from semi_pd_tpu.model_loader.loader import load_params

    eng.runner.params = load_params(
        eng.runner.model, weights=list(hf.state_dict().items())
    )
    return eng


def _hf_topk_trace(hf, prompt_ids, gen_ids, k):
    """Teacher-forced per-output-position top-k (vals, ids) and the chosen
    token logprobs, for the sequence prompt + gen."""
    import torch

    full = list(prompt_ids) + list(gen_ids)
    out_vals, out_ids, out_lps = [], [], []
    with torch.no_grad():
        for i in range(len(gen_ids)):
            ctx = torch.tensor([full[: len(prompt_ids) + i]])
            logits = hf(ctx).logits[0, -1].float()
            lp = torch.log_softmax(logits, dim=-1)
            v, t = torch.topk(lp, k)
            out_vals.append(v.numpy())
            out_ids.append(t.numpy())
            out_lps.append(float(lp[gen_ids[i]]))
    return out_vals, out_ids, out_lps


@pytest.mark.parametrize("semi_pd", [False, True])
def test_topk_matches_hf_through_engine(hf_model, semi_pd):
    eng = _mk_engine(hf_model, enable_semi_pd=semi_pd)
    hf, _ = hf_model
    prompt = list(range(7, 27))
    K = 5
    out = eng.generate(
        input_ids=prompt,
        sampling_params=SamplingParams(
            max_new_tokens=6, temperature=0.0, ignore_eos=True),
        return_logprob=True,
        top_logprobs_num=K,
    )
    gen = out["output_ids"]
    assert len(gen) == 6
    mi = out["meta_info"]
    tops = mi["output_top_logprobs"]
    lps = mi["output_logprobs"]
    assert len(tops) == 6 and len(lps) == 6
    hf_vals, hf_ids, hf_lps = _hf_topk_trace(hf, prompt, gen, K)
    for i in range(6):
        vals, ids = tops[i]
        assert len(vals) == K and len(ids) == K
        # greedy: the sampled token IS the top-1
        assert ids[0] == gen[i]
        assert list(ids) == list(hf_ids[i]), f"position {i} top-{K} ids"
        np.testing.assert_allclose(vals, hf_vals[i], atol=2e-3)
        assert abs(lps[i] - hf_lps[i]) < 2e-3
        # top-k values are sorted descending and include the chosen logprob
        assert all(vals[j] >= vals[j + 1] for j in range(K - 1))
        assert abs(vals[0] - lps[i]) < 2e-3


def test_input_topk_score(hf_model):
    import torch

    eng = _mk_engine(hf_model)
    hf, _ = hf_model
    ids = list(range(11, 31))
    res = eng.score(input_ids=ids, top_logprobs_num=3)
    assert len(res) == len(ids) - 1
    with torch.no_grad():
        lp = torch.log_softmax(
            hf(torch.tensor([ids])).logits[0].float(), dim=-1
        ).numpy()
    for i, (tok_lp, tid, (tv, ti)) in enumerate(res):
        pos = i  # logprob of ids[i+1] from logits at position i
        assert tid == ids[i + 1]
        assert abs(tok_lp - lp[pos][tid]) < 2e-3
        top3 = sorted(enumerate(lp[pos]), key=lambda x: -x[1])[:3]
        assert list(ti) == [t for t, _ in top3]
        np.testing.assert_allclose(tv, [v for _, v in top3], atol=2e-3)


def test_topk_implies_return_logprob(hf_model):
    eng = _mk_engine(hf_model)
    out = eng.generate(
        input_ids=list(range(5, 15)),
        sampling_params=SamplingParams(
            max_new_tokens=2, temperature=0.0, ignore_eos=True),
        top_logprobs_num=2,
    )
    mi = out["meta_info"]
    assert mi["output_logprobs"] is not None
    assert len(mi["output_top_logprobs"]) == 2
