"""Grok-1 (reference srt/models/grok.py). No HF in-library implementation
exists, so: the routed-MoE math (tanh router softcap, un-normalized top-2,
gelu-gated experts) is verified against a direct numpy evaluation; the
sandwich-norm layer composition is verified with a stubbed attention; the
full model is smoke-tested through the engine."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.config.server_args import ServerArgs
from semi_pd_tpu.models.registry import create_model
from semi_pd_tpu.runtime.engine import Engine
from semi_pd_tpu.sampling.sampling_params import SamplingParams


def _grok_cfg():
    from transformers import PretrainedConfig

    cfg = PretrainedConfig()
    cfg.architectures = ["Grok1ForCausalLM"]
    cfg.vocab_size = 128
    cfg.hidden_size = 32
    cfg.intermediate_size = 48
    cfg.num_hidden_layers = 2
    cfg.num_attention_heads = 2
    cfg.num_key_value_heads = 2
    cfg.max_position_embeddings = 128
    cfg.num_local_experts = 4
    cfg.num_experts_per_tok = 2
    cfg.moe_intermediate_size = 16
    cfg.tie_word_embeddings = False
    cfg.rms_norm_eps = 1e-5
    cfg.attn_logit_softcapping = 30.0
    cfg.router_logit_softcapping = 30.0
    cfg.embedding_multiplier_scale = 78.38367176906169
    cfg.output_multiplier_scale = 0.5773502691896257
    return ModelConfig.from_hf_config(cfg, dtype="float32")


@pytest.fixture(scope="module")
def model():
    return create_model(_grok_cfg())


def test_grok_scalars(model):
    assert model.config.attn_logit_softcap == 30.0
    assert abs(model.embed_scale - 78.38367176906169) < 1e-9
    assert abs(model.logits_div - 1 / 0.5773502691896257) < 1e-9


def test_grok_moe_math(model):
    params = model.init_params(seed=0)
    lp = jax.tree.map(lambda a: a[0], params["layers"])
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(6, 32)).astype(np.float32) * 3)
    got = np.asarray(model._mlp(lp, x))

    xn = np.asarray(x)
    logits = xn @ np.asarray(lp["router"]["w"])
    logits = 30.0 * np.tanh(logits / 30.0)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)

    def gelu(v):
        return 0.5 * v * (1 + np.tanh(np.sqrt(2 / np.pi) * (v + 0.044715 * v**3)))

    want = np.zeros_like(xn)
    for t in range(xn.shape[0]):
        top = np.argsort(-probs[t])[:2]
        for e in top:  # NOT renormalized (reference renormalize=False)
            a = xn[t] @ np.asarray(lp["experts"]["gate_up"][e])
            g, u = a[: a.shape[0] // 2], a[a.shape[0] // 2:]
            want[t] += probs[t, e] * ((gelu(g) * u) @ np.asarray(lp["experts"]["down"][e]))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_grok_sandwich_layer_composition(model):
    """h += post_attn_norm(attn(pre_attn_norm(h))); h += post_moe_norm(moe(
    pre_moe_norm(h))) — attention stubbed so only norm placement is tested."""
    params = model.init_params(seed=1)
    lp = jax.tree.map(lambda a: a[0], params["layers"])
    rng = np.random.default_rng(1)
    h = jnp.asarray(rng.normal(size=(3, 32)).astype(np.float32))

    from types import SimpleNamespace

    model._attn = lambda lp_, x, li, fb, kv: (x * 2.0, kv)
    got, _ = model._layer(lp, 0, h, None, SimpleNamespace(lora_idx=None))

    from semi_pd_tpu.ops.elementwise import rms_norm

    eps = model.config.rms_norm_eps
    h1 = h + rms_norm(2.0 * rms_norm(h, lp["input_norm"], eps),
                      lp["post_attn_sandwich"], eps)
    moe = model._mlp(lp, rms_norm(h1, lp["post_norm"], eps))
    want = h1 + rms_norm(moe, lp["post_moe_sandwich"], eps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_grok_engine_e2e():
    eng = Engine(server_args=ServerArgs(
        model_path="", random_weights=True, page_size=4,
        max_total_tokens=512, dtype="float32"), model_config=_grok_cfg())
    out = eng.generate(
        input_ids=[[3, 4, 5, 6, 7]],
        sampling_params=SamplingParams(max_new_tokens=4, temperature=0.0,
                                       ignore_eos=True))
    assert len(out[0]["output_ids"]) == 4
