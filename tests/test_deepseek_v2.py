"""DeepSeek-V2/V3 MLA parity vs HF (tiny random models, CPU).

Validates the absorb-form MLA attention (latent KV pool, V = prefix of K)
against HF's decompressed reference implementation, plus the V3 sigmoid
grouped router with e_score_correction_bias.

Reference analog: srt/models/deepseek_v2.py forward_normal vs forward_absorb
consistency + test/srt/models generation parity rows."""

import numpy as np
import pytest

import jax.numpy as jnp

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.mem.pool import KVCache, KVCacheSpec
from semi_pd_tpu.model_loader.loader import load_params

from tests.test_llama_parity import _mk_fb

PAGE = 4


def _forward_last_logits(model, params, prompt):
    spec = KVCacheSpec(
        num_layers=model.config.num_hidden_layers, num_pages=16, page_size=PAGE,
        num_kv_heads=1, head_dim=model.lat_dim, dtype=jnp.float32, use_mla=True,
    )
    cache = KVCache(spec)
    n = len(prompt)
    T = 32
    n_pages = -(-n // PAGE)
    pages = np.arange(1, 1 + n_pages, dtype=np.int32)
    pt = np.zeros((1, 8), np.int32)
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


@pytest.mark.parametrize("version", ["v2", "v3"])
def test_deepseek_parity(version):
    import torch

    common = dict(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        moe_intermediate_size=32, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        kv_lora_rank=32, q_lora_rank=48,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
        n_routed_experts=8, num_experts_per_tok=2, n_shared_experts=1,
        first_k_dense_replace=1, moe_layer_freq=1,
        max_position_embeddings=256, tie_word_embeddings=False,
    )
    if version == "v2":
        from transformers import DeepseekV2Config as Cfg, DeepseekV2ForCausalLM as HF

        # norm_topk_prob=False: real V2/V2-Lite configs have it off, and this
        # transformers version's V2 gate ignores the flag entirely.
        hf_cfg = Cfg(**common, topk_method="greedy", norm_topk_prob=False)
    else:
        from transformers import DeepseekV3Config as Cfg, DeepseekV3ForCausalLM as HF
        hf_cfg = Cfg(**common, n_group=2, topk_group=1, routed_scaling_factor=1.5,
                     norm_topk_prob=True)

    torch.manual_seed(0)
    hf = HF(hf_cfg).eval().float()

    from semi_pd_tpu.models.deepseek_v2 import DeepseekV2ForCausalLM as Ours

    cfg = ModelConfig.from_hf_config(hf_cfg, dtype="float32")
    assert cfg.use_mla
    if version == "v3":
        cfg.scoring_func = "sigmoid"
    model = Ours(cfg)
    model.page_size = PAGE
    params = load_params(model, weights=list(hf.state_dict().items()))

    rng = np.random.default_rng(0)
    prompt = rng.integers(0, 128, size=11).tolist()
    with torch.no_grad():
        want = hf(torch.tensor([prompt])).logits[0, -1].numpy()
    got = _forward_last_logits(model, params, prompt)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
