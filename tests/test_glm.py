"""GLM family parity (reference srt/models/chatglm.py + HF modeling_glm/
modeling_glm4): Glm and Glm4 against transformers implementations, ChatGLM
(ggml-era naming) by rename-roundtrip against our Glm."""

import numpy as np
import pytest

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.config.server_args import ServerArgs
from semi_pd_tpu.model_loader.loader import load_params
from semi_pd_tpu.models.registry import create_model
from semi_pd_tpu.runtime.engine import Engine
from semi_pd_tpu.sampling.sampling_params import SamplingParams

from tests.test_model_families import _parity


def _glm_cfg(cls):
    return cls(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, partial_rotary_factor=0.5,
        max_position_embeddings=256, tie_word_embeddings=False,
        pad_token_id=0,
    )


def test_glm_parity():
    import torch
    from transformers import GlmConfig, GlmForCausalLM as HF

    hf_cfg = _glm_cfg(GlmConfig)
    torch.manual_seed(0)
    _parity(HF(hf_cfg).eval().float(), hf_cfg, 2, 2, 16)


def test_glm4_parity():
    import torch
    from transformers import Glm4Config, Glm4ForCausalLM as HF

    hf_cfg = _glm_cfg(Glm4Config)
    torch.manual_seed(1)
    _parity(HF(hf_cfg).eval().float(), hf_cfg, 2, 2, 16, seed=1)


def test_chatglm_matches_glm():
    """ChatGLM ggml-era naming (fused biased query_key_value, swiglu
    dense_h_to_4h) loads to the same tokens as HF-format Glm weights."""
    import torch
    from transformers import GlmConfig, GlmForCausalLM as HF

    hf_cfg = _glm_cfg(GlmConfig)
    torch.manual_seed(2)
    hf = HF(hf_cfg).eval().float()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    mc = ModelConfig.from_hf_config(hf_cfg, dtype="float32")
    assert mc.architecture == "GlmForCausalLM"
    eng_glm = Engine(server_args=ServerArgs(
        model_path="", random_weights=True, page_size=4,
        max_total_tokens=1024, dtype="float32"), model_config=mc)
    eng_glm.runner.params = load_params(eng_glm.runner.model, weights=list(sd.items()))

    renamed = {
        "transformer.embedding.word_embeddings.weight": sd["model.embed_tokens.weight"],
        "transformer.encoder.final_layernorm.weight": sd["model.norm.weight"],
        "transformer.output_layer.weight": sd["lm_head.weight"],
    }
    for l in range(hf_cfg.num_hidden_layers):
        src = f"model.layers.{l}."
        dst = f"transformer.encoder.layers.{l}."
        renamed.update({
            dst + "input_layernorm.weight": sd[src + "input_layernorm.weight"],
            dst + "self_attention.query_key_value.weight": np.concatenate([
                sd[src + "self_attn.q_proj.weight"],
                sd[src + "self_attn.k_proj.weight"],
                sd[src + "self_attn.v_proj.weight"]], axis=0),
            dst + "self_attention.query_key_value.bias": np.concatenate([
                sd[src + "self_attn.q_proj.bias"],
                sd[src + "self_attn.k_proj.bias"],
                sd[src + "self_attn.v_proj.bias"]], axis=0),
            dst + "self_attention.dense.weight": sd[src + "self_attn.o_proj.weight"],
            dst + "post_attention_layernorm.weight": sd[src + "post_attention_layernorm.weight"],
            dst + "mlp.dense_h_to_4h.weight": sd[src + "mlp.gate_up_proj.weight"],
            dst + "mlp.dense_4h_to_h.weight": sd[src + "mlp.down_proj.weight"],
        })

    # ChatGLM-shaped config (ggml-era attribute names)
    from types import SimpleNamespace

    cg_cfg = SimpleNamespace(
        architectures=["ChatGLMModel"],
        num_layers=hf_cfg.num_hidden_layers,
        padded_vocab_size=hf_cfg.vocab_size,
        hidden_size=hf_cfg.hidden_size,
        ffn_hidden_size=hf_cfg.intermediate_size,
        num_attention_heads=hf_cfg.num_attention_heads,
        multi_query_attention=True,
        multi_query_group_num=hf_cfg.num_key_value_heads,
        kv_channels=16,
        seq_length=256,
        layernorm_epsilon=hf_cfg.rms_norm_eps,
        rope_ratio=1.0,
        add_qkv_bias=True,
        add_bias_linear=False,
        rmsnorm=True,
        hidden_act="silu",
        tie_word_embeddings=False,
    )
    mc2 = ModelConfig.from_hf_config(cg_cfg, dtype="float32")
    assert mc2.architecture == "ChatGLMModel"
    assert mc2.num_key_value_heads == 2 and mc2.head_dim == 16
    eng_cg = Engine(server_args=ServerArgs(
        model_path="", random_weights=True, page_size=4,
        max_total_tokens=1024, dtype="float32"), model_config=mc2)
    eng_cg.runner.params = load_params(eng_cg.runner.model, weights=list(renamed.items()))

    prompts = [list(range(5, 15)), list(range(80, 89))]
    sp = SamplingParams(max_new_tokens=6, temperature=0.0, ignore_eos=True)
    got = [o["output_ids"] for o in eng_cg.generate(input_ids=prompts, sampling_params=sp)]
    want = [o["output_ids"] for o in eng_glm.generate(input_ids=prompts, sampling_params=sp)]
    assert got == want
