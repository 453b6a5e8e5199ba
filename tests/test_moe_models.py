"""MoE model parity vs HF (tiny random Mixtral + Qwen2-MoE on CPU).

Reference analog: test/srt/models/test_generation_models.py rows for
mixtral/qwen2_moe + test_moe_ep.py."""

import numpy as np
import pytest

import jax.numpy as jnp

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.mem.pool import KVCache, KVCacheSpec
from semi_pd_tpu.model_loader.loader import load_params

from tests.test_llama_parity import _mk_fb

PAGE = 4


def _run_ours(model, params, prompt, n_pages_needed=8):
    import jax

    spec = KVCacheSpec(
        num_layers=model.config.num_hidden_layers, num_pages=16, page_size=PAGE,
        num_kv_heads=model.num_kv_heads, head_dim=model.head_dim,
        dtype=jnp.float32,
    )
    cache = KVCache(spec)
    n = len(prompt)
    T = 32
    n_pages = -(-n // PAGE)
    pages = np.arange(1, 1 + n_pages, dtype=np.int32)
    maxP = 8
    pt = np.zeros((1, maxP), np.int32)
    pt[0, :n_pages] = pages
    slot = lambda i: pages[i // PAGE] * PAGE + i % PAGE
    fb = _mk_fb(
        input_ids=prompt + [0] * (T - n),
        q_req_idx=[0] * T,
        q_pos=list(range(n)) + [0] * (T - n),
        out_slots=[slot(i) for i in range(n)] + [0] * (T - n),
        page_table=pt,
        kv_lens=[n],
        logits_idx=[n - 1],
        q_lens=[n],
    )
    logits, _ = model.forward(params, fb, cache.arrays)
    return np.asarray(logits[0])


@pytest.mark.parametrize("family", ["mixtral", "qwen2_moe"])
def test_moe_parity(family):
    import torch

    if family == "mixtral":
        from transformers import MixtralConfig, MixtralForCausalLM as HFModel

        hf_cfg = MixtralConfig(
            vocab_size=128, hidden_size=64, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            num_local_experts=4, num_experts_per_tok=2,
            max_position_embeddings=256, tie_word_embeddings=False,
        )
        from semi_pd_tpu.models.qwen2_moe import MixtralForCausalLM as Ours
    else:
        from transformers import Qwen2MoeConfig, Qwen2MoeForCausalLM as HFModel

        hf_cfg = Qwen2MoeConfig(
            vocab_size=128, hidden_size=64, intermediate_size=96,
            moe_intermediate_size=48, shared_expert_intermediate_size=48,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
            decoder_sparse_step=1, mlp_only_layers=[],
            max_position_embeddings=256, tie_word_embeddings=False,
        )
        from semi_pd_tpu.models.qwen2_moe import Qwen2MoeForCausalLM as Ours

    torch.manual_seed(0)
    hf = HFModel(hf_cfg).eval().float()

    cfg = ModelConfig.from_hf_config(hf_cfg, dtype="float32")
    model = Ours(cfg)
    model.page_size = PAGE
    params = load_params(model, weights=list(hf.state_dict().items()))

    rng = np.random.default_rng(0)
    prompt = rng.integers(0, 128, size=9).tolist()
    with torch.no_grad():
        want = hf(torch.tensor([prompt])).logits[0, -1].numpy()
    got = _run_ours(model, params, prompt)
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)
