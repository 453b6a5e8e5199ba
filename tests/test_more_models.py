"""Parity tests for additional model families: Gemma2 (sliding window,
softcaps, sandwich norms) and Qwen3 (q/k head norms)."""

import numpy as np
import pytest

import jax.numpy as jnp

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.mem.pool import KVCache, KVCacheSpec
from semi_pd_tpu.model_loader.loader import load_params
from semi_pd_tpu.models.registry import create_model

from tests.test_llama_parity import _mk_fb

PAGE = 4


def _last_logits(model, params, prompt, n_layers, n_kv, head_dim):
    spec = KVCacheSpec(
        num_layers=n_layers, num_pages=32, page_size=PAGE,
        num_kv_heads=n_kv, head_dim=head_dim, dtype=jnp.float32,
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
        prompt + [0] * (T - n), [0] * T, list(range(n)) + [0] * (T - n),
        [slot(i) for i in range(n)] + [0] * (T - n), pt, [n], [n - 1],
        q_lens=[n],
    )
    logits, _ = model.forward(params, fb, cache.arrays)
    return np.asarray(logits[0])


def test_gemma2_parity():
    import torch
    from transformers import Gemma2Config, Gemma2ForCausalLM as HF

    hf_cfg = Gemma2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, query_pre_attn_scalar=16, sliding_window=8,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        max_position_embeddings=256,
    )
    torch.manual_seed(0)
    hf = HF(hf_cfg).eval().float()

    cfg = ModelConfig.from_hf_config(hf_cfg, dtype="float32")
    model = create_model(cfg)
    model.page_size = PAGE
    params = load_params(model, weights=list(hf.state_dict().items()))

    rng = np.random.default_rng(0)
    # long enough that sliding-window layers actually truncate (window 8)
    prompt = rng.integers(0, 256, size=21).tolist()
    with torch.no_grad():
        want = hf(torch.tensor([prompt])).logits[0, -1].numpy()
    got = _last_logits(model, params, prompt, 3, 2, 16)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_qwen3_parity():
    import torch
    from transformers import Qwen3Config, Qwen3ForCausalLM as HF

    hf_cfg = Qwen3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = HF(hf_cfg).eval().float()

    cfg = ModelConfig.from_hf_config(hf_cfg, dtype="float32")
    model = create_model(cfg)
    assert model.use_qk_norm
    model.page_size = PAGE
    params = load_params(model, weights=list(hf.state_dict().items()))

    rng = np.random.default_rng(1)
    prompt = rng.integers(0, 256, size=13).tolist()
    with torch.no_grad():
        want = hf(torch.tensor([prompt])).logits[0, -1].numpy()
    got = _last_logits(model, params, prompt, 2, 2, 16)
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)
