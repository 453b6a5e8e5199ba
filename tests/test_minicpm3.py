"""MiniCPM3 (reference srt/models/minicpm3.py): deepseek-layout MLA
attention + MiniCPM scalar knobs. No HF in-library class exists; the scalar
knobs are validated by exact scale-folding equivalence against our
(HF-parity-tested) dense DeepseekV2 path, and the neox-style pe rope choice
is pinned directly."""

import types

import numpy as np
import pytest

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.config.server_args import ServerArgs
from semi_pd_tpu.model_loader.loader import load_params
from semi_pd_tpu.runtime.engine import Engine
from semi_pd_tpu.sampling.sampling_params import SamplingParams

SP = SamplingParams(max_new_tokens=6, temperature=0.0, ignore_eos=True)


def _cfg(arch, **extra):
    c = types.SimpleNamespace(
        architectures=[arch],
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        kv_lora_rank=32, q_lora_rank=48,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
        max_position_embeddings=256, rope_theta=10000.0, rope_scaling=None,
        rms_norm_eps=1e-6, hidden_act="silu", tie_word_embeddings=False,
        attention_bias=False,
    )
    for k, v in extra.items():
        setattr(c, k, v)
    return ModelConfig.from_hf_config(c, dtype="float32")


def _engine(mc, weights=None):
    eng = Engine(server_args=ServerArgs(
        model_path="", random_weights=True, page_size=4,
        max_total_tokens=1024, dtype="float32"), model_config=mc)
    if weights is not None:
        eng.runner.params = load_params(eng.runner.model, weights=weights)
    return eng


def test_minicpm3_equals_scale_folded_deepseek():
    mc3 = _cfg("MiniCPM3ForCausalLM", scale_emb=4.0, scale_depth=1.4,
               dim_model_base=32)
    assert mc3.use_mla
    eng3 = _engine(mc3)

    # Fold the scales into the weights of a plain dense DeepseekV2 with the
    # SAME neox rope, then require token equality.
    from semi_pd_tpu.ops.rope import RotaryEmbedding

    scale_emb, scale_depth, dmb = 4.0, 1.4, 32
    r = scale_depth / np.sqrt(2)
    mcd = _cfg("DeepseekV2ForCausalLM")
    engd = _engine(mcd)
    engd.runner.model.rope = RotaryEmbedding(
        head_dim=8, rotary_dim=8, max_position=mcd.context_length,
        theta=10000.0, rope_scaling=None, is_neox_style=True,
    )
    p3 = eng3.runner.params
    import jax

    pd = jax.tree.map(lambda a: a, p3)  # copy structure, reuse leaves
    pd["embed"]["w"] = p3["embed"]["w"] * scale_emb
    pd["lm_head"]["w"] = p3["lm_head"]["w"] / (64 / dmb)
    for l in range(2):
        pd["layers"][l]["o_proj"]["w"] = p3["layers"][l]["o_proj"]["w"] * r
        pd["layers"][l]["down"]["w"] = p3["layers"][l]["down"]["w"] * r
    engd.runner.params = pd

    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, 128, size=n).tolist() for n in (9, 17)]
    got = [o["output_ids"] for o in eng3.generate(input_ids=prompts, sampling_params=SP)]
    want = [o["output_ids"] for o in engd.generate(input_ids=prompts, sampling_params=SP)]
    assert got == want


def test_minicpm3_rope_is_neox():
    mc3 = _cfg("MiniCPM3ForCausalLM", scale_emb=1.0, scale_depth=1.0)
    from semi_pd_tpu.models.registry import create_model

    m = create_model(mc3)
    assert m.rope.is_neox_style is True  # reference minicpm3 get_rope default
    # deepseek proper stays interleaved
    md = create_model(_cfg("DeepseekV2ForCausalLM"))
    assert md.rope.is_neox_style is False
