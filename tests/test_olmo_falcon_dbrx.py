"""Parity: OLMo-1 (non-parametric LN), Falcon 7b-style (parallel MQA block),
DBRX (fused flat experts) vs HF."""

import numpy as np
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
    prompt = rng.integers(0, hf_cfg.vocab_size, size=plen).tolist()
    with torch.no_grad():
        want = hf(torch.tensor([prompt])).logits[0, -1].numpy()
    got = _last_logits(model, params, prompt, cfg.num_hidden_layers, n_kv, head_dim)
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)
    return model


def test_olmo_parity():
    from transformers import OlmoConfig, OlmoForCausalLM as HF

    hf_cfg = OlmoConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False, clip_qkv=0.4,
    )
    torch.manual_seed(0)
    m = _parity(HF(hf_cfg).eval().float(), hf_cfg, 2, 16)
    assert m.qkv_clip == 0.4


def test_falcon_parity():
    from transformers import FalconConfig, FalconForCausalLM as HF

    hf_cfg = FalconConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, multi_query=True, parallel_attn=True,
        new_decoder_architecture=False, bias=False, alibi=False,
        max_position_embeddings=256, tie_word_embeddings=True,
    )
    torch.manual_seed(1)
    _parity(HF(hf_cfg).eval().float(), hf_cfg, 1, 16, seed=1)


def test_falcon_40b_gated():
    import pytest
    from transformers import FalconConfig

    hf_cfg = FalconConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=1,
        num_attention_heads=4, new_decoder_architecture=True,
    )
    cfg = ModelConfig.from_hf_config(hf_cfg, dtype="float32")
    with pytest.raises(NotImplementedError):
        create_model(cfg)


def test_dbrx_parity():
    from transformers import DbrxConfig, DbrxForCausalLM as HF

    hf_cfg = DbrxConfig(
        vocab_size=256, d_model=64, n_heads=4, n_layers=2, max_seq_len=256,
        attn_config={"kv_n_heads": 2, "clip_qkv": 8.0, "rope_theta": 10000},
        ffn_config={"ffn_hidden_size": 48, "moe_num_experts": 4,
                    "moe_top_k": 2, "moe_normalize_expert_weights": 1.0},
    )
    torch.manual_seed(2)
    hf = HF(hf_cfg).eval().float()
    m = _parity(hf, hf_cfg, 2, 16, seed=2, tol=2e-3)
    assert m.qkv_clip == 8.0
    assert m.config.num_experts == 4
