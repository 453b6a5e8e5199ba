"""Input-token logprob scoring (reference: return_logprob + logprob_start_len
with max_new_tokens=0, srt/managers/io_struct.py + output-processor
input_token_logprobs)."""

import numpy as np
import pytest

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.config.server_args import ServerArgs
from semi_pd_tpu.runtime.engine import Engine
from semi_pd_tpu.model_loader.loader import load_params


@pytest.fixture(scope="module")
def tiny():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM as HF

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False,
    )
    cfg.architectures = ["LlamaForCausalLM"]
    torch.manual_seed(0)
    hf = HF(cfg).eval().float()
    mc = ModelConfig.from_hf_config(cfg, dtype="float32")
    eng = Engine(server_args=ServerArgs(
        model_path="", random_weights=True, page_size=4,
        max_total_tokens=1024, dtype="float32"), model_config=mc)
    eng.runner.params = load_params(eng.runner.model,
                                    weights=list(hf.state_dict().items()))
    return hf, eng


def test_score_matches_hf(tiny):
    import torch

    hf, eng = tiny
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, size=13).tolist()
    got = eng.score(input_ids=ids)
    with torch.no_grad():
        lsm = torch.log_softmax(hf(input_ids=torch.tensor([ids])).logits[0], -1)
    want = [float(lsm[i - 1, ids[i]]) for i in range(1, len(ids))]
    np.testing.assert_allclose([g for g, _ in got], want, atol=1e-4)
    assert [t for _, t in got] == ids[1:]


def test_score_batch_and_start_len(tiny):
    _, eng = tiny
    rng = np.random.default_rng(1)
    a = rng.integers(0, 128, size=11).tolist()
    b = rng.integers(0, 128, size=6).tolist()
    out = eng.score(input_ids=[a, b], logprob_start_len=3)
    assert len(out[0]) == len(a) - 3 and len(out[1]) == len(b) - 3
    # memory fully released
    assert not eng.scheduler.has_work()


def test_generate_api_score_mode(tiny):
    _, eng = tiny
    out = eng.generate(input_ids=[1, 2, 3, 4], return_logprob=True,
                       sampling_params={"max_new_tokens": 0})
    assert out["output_ids"] == []
    assert len(out["meta_info"]["input_token_logprobs"]) == 3
