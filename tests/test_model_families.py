"""Parity tests for wave-A model families: Gemma-1, Phi-3, Granite,
Qwen3-MoE, OLMoE (reference: srt/models/{gemma,granite,qwen3_moe,olmoe}.py;
phi3 served via the llama-compatible path)."""

import numpy as np
import pytest

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.model_loader.loader import load_params
from semi_pd_tpu.models.registry import create_model

from tests.test_more_models import _last_logits, PAGE


def _parity(hf, hf_cfg, n_layers, n_kv, head_dim, seed=0, tol=5e-4,
            vocab=256, plen=13):
    import torch

    cfg = ModelConfig.from_hf_config(hf_cfg, dtype="float32")
    model = create_model(cfg)
    model.page_size = PAGE
    params = load_params(model, weights=list(hf.state_dict().items()))
    rng = np.random.default_rng(seed)
    prompt = rng.integers(0, vocab, size=plen).tolist()
    with torch.no_grad():
        want = hf(torch.tensor([prompt])).logits[0, -1].numpy()
    got = _last_logits(model, params, prompt, n_layers, n_kv, head_dim)
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)
    return model


def test_gemma1_parity():
    import torch
    from transformers import GemmaConfig, GemmaForCausalLM as HF

    hf_cfg = GemmaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256,
        hidden_act="gelu_pytorch_tanh", hidden_activation="gelu_pytorch_tanh",
    )
    torch.manual_seed(0)
    _parity(HF(hf_cfg).eval().float(), hf_cfg, 2, 2, 16, tol=2e-3)


def test_phi3_parity():
    import torch
    from transformers import Phi3Config, Phi3ForCausalLM as HF

    hf_cfg = Phi3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(1)
    _parity(HF(hf_cfg).eval().float(), hf_cfg, 2, 2, 16, seed=1)


def test_phi3_longrope_parity():
    """LongRoPE with short_factor == long_factor is position-split-free, so
    HF's whole-sequence table choice and our position-indexed table agree
    exactly — validating the rescale + sqrt(1+ln s/ln orig) mscale math."""
    import torch
    from transformers import Phi3Config, Phi3ForCausalLM as HF

    hf_cfg = Phi3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, original_max_position_embeddings=128,
        rope_scaling={
            "type": "longrope",
            "short_factor": [1.5] * 8, "long_factor": [1.5] * 8,
        },
        tie_word_embeddings=False, pad_token_id=0,
    )
    torch.manual_seed(3)
    _parity(HF(hf_cfg).eval().float(), hf_cfg, 2, 2, 16, seed=3, plen=21,
            tol=2e-3)


def test_longrope_position_split_matches_reference_semantics():
    """Positions < original_max read the short-factor table, the rest the
    long-factor table (reference rotary_embedding.py:491
    Phi3LongRoPEScaledRotaryEmbedding long_short cache)."""
    import math

    from semi_pd_tpu.ops.rope import RotaryEmbedding

    orig, maxp, d = 32, 128, 16
    short = [1.0] * (d // 2)
    long = [4.0] * (d // 2)
    r = RotaryEmbedding(
        head_dim=d, max_position=maxp, theta=10000.0,
        rope_scaling={"type": "longrope", "short_factor": short,
                      "long_factor": long,
                      "original_max_position_embeddings": orig},
        dtype=np.float32,
    )
    mscale = math.sqrt(1 + math.log(maxp / orig) / math.log(orig))
    inv = 1.0 / (10000.0 ** (np.arange(0, d, 2) / d))
    for p, fac in ((5, 1.0), (orig - 1, 1.0), (orig, 4.0), (100, 4.0)):
        want = np.cos(p * inv / fac) * mscale
        np.testing.assert_allclose(np.asarray(r.cos[p]), want, rtol=1e-5)


def test_granite_parity():
    import torch
    from transformers import GraniteConfig, GraniteForCausalLM as HF

    hf_cfg = GraniteConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False,
        embedding_multiplier=6.0, attention_multiplier=0.12,
        residual_multiplier=0.22, logits_scaling=4.0,
    )
    torch.manual_seed(2)
    m = _parity(HF(hf_cfg).eval().float(), hf_cfg, 2, 2, 16, seed=2)
    assert m.residual_mult == 0.22 and m.logits_div == 4.0


def test_qwen3_moe_parity():
    import torch
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM as HF

    hf_cfg = Qwen3MoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_experts=8, num_experts_per_tok=2, norm_topk_prob=True,
        max_position_embeddings=256, tie_word_embeddings=False,
        decoder_sparse_step=1, mlp_only_layers=[],
    )
    torch.manual_seed(3)
    hf = HF(hf_cfg).eval().float()
    m = _parity(hf, hf_cfg, 2, 2, 16, seed=3, tol=1e-3)
    assert m.use_qk_norm and not m.qk_norm_full
    assert not m.config.attention_bias


def test_olmoe_parity():
    import torch
    from transformers import OlmoeConfig, OlmoeForCausalLM as HF

    hf_cfg = OlmoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        num_experts=8, num_experts_per_tok=2, norm_topk_prob=False,
        max_position_embeddings=256, tie_word_embeddings=False,
    )
    torch.manual_seed(4)
    hf = HF(hf_cfg).eval().float()
    m = _parity(hf, hf_cfg, 2, 4, 16, seed=4, tol=1e-3)
    assert m.qk_norm_full
