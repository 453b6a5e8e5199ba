"""Parity tests for the LayerNorm families: StableLM, Starcoder2, Phi(-2),
Cohere, OLMo2, GPT-2, GPT-BigCode (reference: srt/models/*)."""

import numpy as np
import pytest
import torch

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.model_loader.loader import load_params
from semi_pd_tpu.models.registry import create_model

from tests.test_more_models import _last_logits, PAGE


def _parity(hf, hf_cfg, n_kv, head_dim, seed=0, tol=1e-3, plen=13):
    cfg = ModelConfig.from_hf_config(hf_cfg, dtype="float32")
    model = create_model(cfg)
    model.page_size = PAGE
    params = load_params(model, weights=list(hf.state_dict().items()))
    rng = np.random.default_rng(seed)
    prompt = rng.integers(0, 256, size=plen).tolist()
    with torch.no_grad():
        want = hf(torch.tensor([prompt])).logits[0, -1].numpy()
    got = _last_logits(model, params, prompt, cfg.num_hidden_layers, n_kv, head_dim)
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)
    return model


def test_stablelm_parity():
    from transformers import StableLmConfig, StableLmForCausalLM as HF

    hf_cfg = StableLmConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        partial_rotary_factor=0.25, use_qkv_bias=True,
        max_position_embeddings=256, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    _parity(HF(hf_cfg).eval().float(), hf_cfg, 2, 16)


def test_starcoder2_parity():
    from transformers import Starcoder2Config, Starcoder2ForCausalLM as HF

    hf_cfg = Starcoder2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        use_bias=True, max_position_embeddings=256,
        tie_word_embeddings=True, sliding_window=None,
    )
    torch.manual_seed(1)
    _parity(HF(hf_cfg).eval().float(), hf_cfg, 2, 16, seed=1)


def test_phi2_parity():
    from transformers import PhiConfig, PhiForCausalLM as HF

    hf_cfg = PhiConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        partial_rotary_factor=0.5, max_position_embeddings=256,
        tie_word_embeddings=False,
    )
    torch.manual_seed(2)
    _parity(HF(hf_cfg).eval().float(), hf_cfg, 4, 16, seed=2)


def test_cohere_parity():
    from transformers import CohereConfig, CohereForCausalLM as HF

    hf_cfg = CohereConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        logit_scale=0.25, max_position_embeddings=256,
    )
    torch.manual_seed(3)
    _parity(HF(hf_cfg).eval().float(), hf_cfg, 2, 16, seed=3)


def test_olmo2_parity():
    from transformers import Olmo2Config, Olmo2ForCausalLM as HF

    hf_cfg = Olmo2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False,
    )
    torch.manual_seed(4)
    m = _parity(HF(hf_cfg).eval().float(), hf_cfg, 2, 16, seed=4)
    assert m.qk_norm_full


def test_gpt2_parity():
    from transformers import GPT2Config, GPT2LMHeadModel as HF

    hf_cfg = GPT2Config(
        vocab_size=256, n_embd=64, n_layer=2, n_head=4, n_positions=256,
    )
    hf_cfg.architectures = ["GPT2LMHeadModel"]
    torch.manual_seed(5)
    m = _parity(HF(hf_cfg).eval().float(), hf_cfg, 4, 16, seed=5)
    assert m.pos_embed and m.no_rope


def test_gpt_bigcode_parity():
    from transformers import GPTBigCodeConfig, GPTBigCodeForCausalLM as HF

    hf_cfg = GPTBigCodeConfig(
        vocab_size=256, n_embd=64, n_layer=2, n_head=4, n_positions=256,
        multi_query=True,
    )
    torch.manual_seed(6)
    m = _parity(HF(hf_cfg).eval().float(), hf_cfg, 1, 16, seed=6)
    assert m.num_kv_heads == 1
