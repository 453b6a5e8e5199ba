"""Multi-adapter LoRA serving tests: adapter math vs merged weights, and
mixed-adapter batching (reference analog: test/srt/models/test_lora.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.config.server_args import ServerArgs
from semi_pd_tpu.runtime.engine import Engine
from semi_pd_tpu.sampling.sampling_params import SamplingParams

H, I, L, R = 32, 64, 2, 4


def _mk_engine(seed=11):
    cfg = ModelConfig(
        architecture="LlamaForCausalLM", vocab_size=64, hidden_size=H,
        intermediate_size=I, num_hidden_layers=L, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, max_position_embeddings=256,
        context_length=256, dtype="float32",
    )
    return Engine(
        server_args=ServerArgs(model_path="", random_weights=True,
                               page_size=4, max_total_tokens=1024, seed=seed),
        model_config=cfg,
    )


def _synthetic_adapter(rng, scale=0.6):
    sd = {}
    q_size, kv_size = 4 * 8, 2 * 8  # heads*head_dim, kv_heads*head_dim
    m = {"q_proj": q_size, "k_proj": kv_size, "v_proj": kv_size, "o_proj": H,
         "gate_proj": I, "up_proj": I, "down_proj": H}
    din = {"q_proj": H, "k_proj": H, "v_proj": H, "o_proj": q_size,
           "gate_proj": H, "up_proj": H, "down_proj": I}
    for l in range(L):
        for t, dout in m.items():
            sd[f"base_model.model.model.layers.{l}.self_attn.{t}.lora_A.weight"] = (
                rng.normal(size=(R, din[t])).astype(np.float32) * scale
            )
            sd[f"base_model.model.model.layers.{l}.self_attn.{t}.lora_B.weight"] = (
                rng.normal(size=(dout, R)).astype(np.float32) * scale
            )
    return sd


def test_lora_matches_merged_weights():
    eng = _mk_engine()
    rng = np.random.default_rng(0)
    sd = _synthetic_adapter(rng)
    eng.register_lora_adapter("ad1", state_dict=sd, rank=R, alpha=R)

    prompt = rng.integers(0, 64, size=10).tolist()
    sp = SamplingParams(max_new_tokens=6, temperature=0.0, ignore_eos=True)

    base_out = eng.generate(input_ids=prompt, sampling_params=sp)
    lora_out = eng.generate(input_ids=prompt, sampling_params=sp, lora_path="ad1")

    # Manually merge the adapter into a copy of the weights and compare
    import jax

    merged = jax.tree.map(lambda x: x, eng.runner.params)
    layers = dict(merged["layers"])
    qs = eng.runner.model.q_size
    ks = eng.runner.model.kv_size
    for l in range(L):
        def AB(t):
            A = sd[f"base_model.model.model.layers.{l}.self_attn.{t}.lora_A.weight"]
            B = sd[f"base_model.model.model.layers.{l}.self_attn.{t}.lora_B.weight"]
            return (B @ A).T  # [din, dout], scaling alpha/r = 1
        qkv = np.asarray(layers["qkv_proj"]["w"][l]).copy()
        qkv[:, :qs] += AB("q_proj")
        qkv[:, qs:qs + ks] += AB("k_proj")
        qkv[:, qs + ks:] += AB("v_proj")
        layers["qkv_proj"] = dict(layers["qkv_proj"])
        layers["qkv_proj"]["w"] = layers["qkv_proj"]["w"].at[l].set(jnp.asarray(qkv))
        for t, leaf in (("o_proj", "o_proj"), ("down_proj", "down")):
            w = np.asarray(layers[leaf]["w"][l]) + AB(t)
            layers[leaf] = dict(layers[leaf])
            layers[leaf]["w"] = layers[leaf]["w"].at[l].set(jnp.asarray(w))
        gu = np.asarray(layers["gate_up"]["w"][l]).copy()
        gu[:, :I] += AB("gate_proj")
        gu[:, I:] += AB("up_proj")
        layers["gate_up"] = dict(layers["gate_up"])
        layers["gate_up"]["w"] = layers["gate_up"]["w"].at[l].set(jnp.asarray(gu))
    merged = dict(merged)
    merged["layers"] = {k: v for k, v in layers.items() if k != "lora"}

    eng2 = _mk_engine()
    eng2.runner.params = merged
    want = eng2.generate(input_ids=prompt, sampling_params=sp)

    assert lora_out["output_ids"] == want["output_ids"], (
        lora_out["output_ids"], want["output_ids"], base_out["output_ids"])
    # the adapter actually changes behavior on this model
    assert lora_out["output_ids"] != base_out["output_ids"]


def test_mixed_adapter_batch():
    eng = _mk_engine()
    rng = np.random.default_rng(1)
    eng.register_lora_adapter("a", state_dict=_synthetic_adapter(rng), rank=R)
    eng.register_lora_adapter("b", state_dict=_synthetic_adapter(rng), rank=R)

    prompts = [rng.integers(0, 64, size=8).tolist() for _ in range(3)]
    sp = SamplingParams(max_new_tokens=5, temperature=0.0, ignore_eos=True)

    # solo runs
    solo = [
        eng.generate(input_ids=prompts[0], sampling_params=sp, lora_path="a"),
        eng.generate(input_ids=prompts[1], sampling_params=sp, lora_path="b"),
        eng.generate(input_ids=prompts[2], sampling_params=sp),
    ]
    # batched run with mixed adapters must match solo results
    mixed = eng.generate(
        input_ids=prompts, sampling_params=sp, lora_path=["a", "b", None]
    )
    for s, m in zip(solo, mixed):
        assert s["output_ids"] == m["output_ids"]
    eng.scheduler.check_memory()


def test_lora_lifecycle_unload_reload():
    """Dynamic adapter lifecycle (reference lora_manager.py load/swap):
    unload tombstones the slot (other adapters keep indices), reload reuses
    it, and an unloaded name is rejected. Unload of an in-use adapter is
    refused."""
    eng = _mk_engine()
    rng = np.random.default_rng(5)
    sd_a, sd_b = _synthetic_adapter(rng), _synthetic_adapter(rng, scale=0.3)
    eng.register_lora_adapter("a", state_dict=sd_a, rank=R)
    eng.register_lora_adapter("b", state_dict=sd_b, rank=R)
    idx_b = eng.lora_manager.adapter_index("b")

    prompt = rng.integers(0, 64, size=10).tolist()
    sp = SamplingParams(max_new_tokens=5, temperature=0.0, ignore_eos=True)
    out_b = eng.generate(input_ids=prompt, sampling_params=sp, lora_path="b")

    # unload "a": "b" keeps its index and exact outputs
    assert eng.unload_lora_adapter("a")
    assert eng.lora_manager.adapter_index("b") == idx_b
    out_b2 = eng.generate(input_ids=prompt, sampling_params=sp, lora_path="b")
    assert out_b2["output_ids"] == out_b["output_ids"]
    with pytest.raises(ValueError, match="unknown"):
        eng.generate(input_ids=prompt, sampling_params=sp, lora_path="a")

    # reload into the freed slot; double-load of a live name is rejected
    idx_c = eng.register_lora_adapter("c", state_dict=sd_a, rank=R)
    assert idx_c == eng.lora_manager.adapter_index("c")
    with pytest.raises(ValueError, match="already"):
        eng.register_lora_adapter("c", state_dict=sd_a, rank=R)
    out_c = eng.generate(input_ids=prompt, sampling_params=sp, lora_path="c")
    # "c" carries adapter-a's weights: same deltas as the original "a" stack
    assert out_c["output_ids"] != out_b["output_ids"]

    # in-use refusal: queue a request on "c" but don't run it
    req = eng.make_request(input_ids=prompt, sampling_params=sp,
                           lora_path="c")
    eng.scheduler.add_request(req)
    with pytest.raises(ValueError, match="in use"):
        eng.unload_lora_adapter("c")
    eng._run_until_done([req])
    assert eng.unload_lora_adapter("c")
    eng.scheduler.check_memory()
