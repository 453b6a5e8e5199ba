"""Expert-parallel MoE over an 8-device mesh vs the single-device grouped
path (reference analog: test/srt/test_moe_ep.py on 2-GPU runners — here 8
virtual CPU devices)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from semi_pd_tpu.ops.moe import moe_ffn, moe_ffn_ep, route_topk
from semi_pd_tpu.parallel.mesh import create_mesh


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_ep_matches_single_device():
    mesh = create_mesh(tp_size=8, dp_size=1)
    rng = np.random.default_rng(0)
    T, d, E, K, f = 33, 32, 16, 2, 24

    x = jnp.asarray(rng.normal(size=(T, d)).astype(np.float32))
    gate_up = jnp.asarray(rng.normal(size=(E, d, 2 * f)).astype(np.float32) * 0.1)
    down = jnp.asarray(rng.normal(size=(E, f, d)).astype(np.float32) * 0.1)
    logits = jnp.asarray(rng.normal(size=(T, E)).astype(np.float32))
    w, idx = route_topk(logits, K, norm_topk_prob=True)

    ref = np.asarray(moe_ffn(x, gate_up, down, w, idx))

    gu_s = jax.device_put(gate_up, NamedSharding(mesh, P("tp")))
    dn_s = jax.device_put(down, NamedSharding(mesh, P("tp")))
    out = np.asarray(
        moe_ffn_ep(x, gu_s, dn_s, w, idx, mesh, axis="tp", capacity_factor=8.0)
    )
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_ep_capacity_drop_is_bounded():
    """With skewed routing and tight capacity, dropped rows only zero their
    contribution (no corruption of other tokens)."""
    mesh = create_mesh(tp_size=8, dp_size=1)
    rng = np.random.default_rng(1)
    T, d, E, K, f = 16, 16, 8, 1, 8
    x = jnp.asarray(rng.normal(size=(T, d)).astype(np.float32))
    gate_up = jnp.asarray(rng.normal(size=(E, d, 2 * f)).astype(np.float32))
    down = jnp.asarray(rng.normal(size=(E, f, d)).astype(np.float32))
    # all tokens routed to expert 3 -> rank of expert 3 overflows at cap 1.0/8
    idx = jnp.full((T, K), 3, jnp.int32)
    w = jnp.ones((T, K), jnp.float32)
    gu_s = jax.device_put(gate_up, NamedSharding(mesh, P("tp")))
    dn_s = jax.device_put(down, NamedSharding(mesh, P("tp")))
    out = np.asarray(
        moe_ffn_ep(x, gu_s, dn_s, w, idx, mesh, capacity_factor=1.0)
    )
    ref = np.asarray(moe_ffn(x, gate_up, down, w, idx))
    C = -(-T * K // 8)  # capacity rows kept
    # kept rows exact, dropped rows zero
    match = np.isclose(out, ref, rtol=2e-4, atol=2e-4).all(axis=1)
    zero = np.isclose(out, 0.0, atol=1e-6).all(axis=1)
    assert (match | zero).all()
    assert match.sum() >= C - 1

@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_ep_engine_e2e_matches_single_device():
    """Mixtral engine with ep_size=8 produces identical greedy tokens to the
    single-device engine (reference analog: test_moe_ep.py e2e rows)."""
    from semi_pd_tpu.config.model_config import ModelConfig
    from semi_pd_tpu.config.server_args import ServerArgs
    from semi_pd_tpu.runtime.engine import Engine
    from semi_pd_tpu.sampling.sampling_params import SamplingParams
    from transformers import MixtralConfig

    hf_cfg = MixtralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=8,
        num_local_experts=8, num_experts_per_tok=2,
        max_position_embeddings=256, tie_word_embeddings=False,
    )
    hf_cfg.architectures = ["MixtralForCausalLM"]
    mc = ModelConfig.from_hf_config(hf_cfg, dtype="float32")
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, 128, size=12).tolist() for _ in range(2)]
    sp = SamplingParams(max_new_tokens=6, temperature=0.0, ignore_eos=True)

    e1 = Engine(server_args=ServerArgs(
        model_path="", random_weights=True, page_size=4,
        max_total_tokens=1024, dtype="float32"), model_config=mc)
    want = [o["output_ids"] for o in e1.generate(input_ids=prompts, sampling_params=sp)]

    mesh = create_mesh(tp_size=8)
    e2 = Engine(server_args=ServerArgs(
        model_path="", random_weights=True, page_size=4,
        max_total_tokens=1024, ep_size=8, dtype="float32"),
        model_config=mc, mesh=mesh)
    got = [o["output_ids"] for o in e2.generate(input_ids=prompts, sampling_params=sp)]
    assert want == got
