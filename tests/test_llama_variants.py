"""Llama-computation variant families (reference srt/models/{internlm2,
exaone,baichuan,qwen,minicpm,xverse,xverse_moe,deepseek}.py).

No HF in-library implementations exist for these (remote-code models), so
parity is proven by WEIGHT-LAYOUT ROUNDTRIP: rename/fuse a tiny HF llama
state_dict into each family's checkpoint layout, load through the family's
hf_weight_plan, and require token-exact agreement with the plain-llama
engine over the original names. This pins exactly what differs per family
(naming, fusion order, interleave) — the computation is the shared llama
path already HF-parity-tested in test_llama_parity.py. MiniCPM's scalar
knobs are validated against an HF llama with the scales folded into its
weights (exact equivalence)."""

import numpy as np
import pytest

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.config.server_args import ServerArgs
from semi_pd_tpu.model_loader.loader import load_params
from semi_pd_tpu.runtime.engine import Engine
from semi_pd_tpu.sampling.sampling_params import SamplingParams

SP = SamplingParams(max_new_tokens=6, temperature=0.0, ignore_eos=True)


@pytest.fixture(scope="module")
def hf_llama():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False,
    )
    cfg.architectures = ["LlamaForCausalLM"]
    torch.manual_seed(0)
    hf = LlamaForCausalLM(cfg).eval().float()
    return hf, cfg


def _engine(arch, hf_cfg, weights, **mc_overrides):
    mc = ModelConfig.from_hf_config(hf_cfg, dtype="float32")
    mc.architecture = arch
    for k, v in mc_overrides.items():
        setattr(mc, k, v)
    eng = Engine(server_args=ServerArgs(
        model_path="", random_weights=True, page_size=4,
        max_total_tokens=1024, dtype="float32"), model_config=mc)
    eng.runner.params = load_params(eng.runner.model, weights=list(weights))
    return eng


def _tokens(eng, prompts):
    return [o["output_ids"] for o in eng.generate(input_ids=prompts, sampling_params=SP)]


PROMPTS = [list(range(3, 13)), list(range(50, 58))]


@pytest.fixture(scope="module")
def llama_tokens(hf_llama):
    hf, cfg = hf_llama
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    eng = _engine("LlamaForCausalLM", cfg, sd.items())
    return _tokens(eng, PROMPTS)


def test_internlm2_matches_llama(hf_llama, llama_tokens):
    hf, cfg = hf_llama
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    kvh, nh = cfg.num_key_value_heads, cfg.num_attention_heads
    groups, d = nh // kvh, cfg.hidden_size // nh
    renamed = {
        "model.tok_embeddings.weight": sd["model.embed_tokens.weight"],
        "model.norm.weight": sd["model.norm.weight"],
        "output.weight": sd["lm_head.weight"],
    }
    for l in range(cfg.num_hidden_layers):
        p = f"model.layers.{l}."
        wq = sd[p + "self_attn.q_proj.weight"].reshape(kvh, groups, d, -1)
        wk = sd[p + "self_attn.k_proj.weight"].reshape(kvh, 1, d, -1)
        wv = sd[p + "self_attn.v_proj.weight"].reshape(kvh, 1, d, -1)
        wqkv = np.concatenate([wq, wk, wv], axis=1).reshape(-1, cfg.hidden_size)
        renamed.update({
            p + "attention_norm.weight": sd[p + "input_layernorm.weight"],
            p + "attention.wqkv.weight": wqkv,
            p + "attention.wo.weight": sd[p + "self_attn.o_proj.weight"],
            p + "ffn_norm.weight": sd[p + "post_attention_layernorm.weight"],
            p + "feed_forward.w1.weight": sd[p + "mlp.gate_proj.weight"],
            p + "feed_forward.w3.weight": sd[p + "mlp.up_proj.weight"],
            p + "feed_forward.w2.weight": sd[p + "mlp.down_proj.weight"],
        })
    eng = _engine("InternLM2ForCausalLM", cfg, renamed.items())
    assert _tokens(eng, PROMPTS) == llama_tokens


def test_exaone_matches_llama(hf_llama, llama_tokens):
    hf, cfg = hf_llama
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    renamed = {
        "transformer.wte.weight": sd["model.embed_tokens.weight"],
        "transformer.ln_f.weight": sd["model.norm.weight"],
        "lm_head.weight": sd["lm_head.weight"],
    }
    for l in range(cfg.num_hidden_layers):
        src, dst = f"model.layers.{l}.", f"transformer.h.{l}."
        renamed.update({
            dst + "ln_1.weight": sd[src + "input_layernorm.weight"],
            dst + "attn.attention.q_proj.weight": sd[src + "self_attn.q_proj.weight"],
            dst + "attn.attention.k_proj.weight": sd[src + "self_attn.k_proj.weight"],
            dst + "attn.attention.v_proj.weight": sd[src + "self_attn.v_proj.weight"],
            dst + "attn.attention.out_proj.weight": sd[src + "self_attn.o_proj.weight"],
            dst + "ln_2.weight": sd[src + "post_attention_layernorm.weight"],
            dst + "mlp.c_fc_0.weight": sd[src + "mlp.gate_proj.weight"],
            dst + "mlp.c_fc_1.weight": sd[src + "mlp.up_proj.weight"],
            dst + "mlp.c_proj.weight": sd[src + "mlp.down_proj.weight"],
        })
    eng = _engine("ExaoneForCausalLM", cfg, renamed.items())
    assert _tokens(eng, PROMPTS) == llama_tokens


def test_baichuan_matches_llama(hf_llama, llama_tokens):
    hf, cfg = hf_llama
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    renamed = {k: v for k, v in sd.items() if "q_proj" not in k
               and "k_proj" not in k and "v_proj" not in k}
    for l in range(cfg.num_hidden_layers):
        p = f"model.layers.{l}.self_attn."
        renamed[p + "W_pack.weight"] = np.concatenate([
            sd[p + "q_proj.weight"], sd[p + "k_proj.weight"],
            sd[p + "v_proj.weight"]], axis=0)
    eng = _engine("BaichuanForCausalLM", cfg, renamed.items())
    assert _tokens(eng, PROMPTS) == llama_tokens


def test_alibi_slopes_schedule():
    from semi_pd_tpu.models.llama_variants import alibi_slopes

    s8 = alibi_slopes(8)
    np.testing.assert_allclose(s8, [2 ** (-i) for i in range(1, 9)], rtol=1e-6)
    s6 = alibi_slopes(6)  # non-power-of-2: 4 base + 2 extra interleaved
    assert len(s6) == 6 and (np.diff(s6[:4]) < 0).all()


def test_baichuan_13b_alibi_generates_and_matches_numpy(hf_llama):
    """ALiBi path: no rope, score -= slope * distance. Verified against a
    direct numpy attention over the same weights for the last prompt token."""
    _, cfg = hf_llama
    mc = ModelConfig.from_hf_config(cfg, dtype="float32")
    mc.architecture = "BaichuanForCausalLM"
    mc.hf_config.position_embedding = "ALIBI"
    from semi_pd_tpu.models.registry import create_model

    try:
        model = create_model(mc)
        assert model.no_rope and model.alibi_slopes is not None

        eng = Engine(server_args=ServerArgs(
            model_path="", random_weights=True, page_size=4,
            max_total_tokens=1024, dtype="float32"), model_config=mc)
        out = eng.generate(
            input_ids=[3, 4, 5, 6, 7, 8],
            sampling_params=SamplingParams(max_new_tokens=3, temperature=0.0,
                                           ignore_eos=True))
        assert len(out["output_ids"]) == 3

        # numeric check of the bias itself on the attention op
        import jax.numpy as jnp
        from semi_pd_tpu.ops.attention.reference import (
            ragged_paged_attention_reference,
        )

        rng = np.random.default_rng(0)
        Hq, D, P = 4, 16, 4
        S = 5 * P
        kv5 = jnp.asarray(rng.normal(size=(1, 2, S, Hq, D)).astype(np.float32))
        pt = jnp.asarray(np.arange(1, 5, dtype=np.int32)[None])
        q = jnp.asarray(rng.normal(size=(1, Hq, D)).astype(np.float32))
        n = 9
        slopes = model.alibi_slopes[:Hq]
        got = np.asarray(ragged_paged_attention_reference(
            q, kv5, 0, pt, jnp.zeros(1, jnp.int32),
            jnp.asarray([n - 1], jnp.int32), jnp.asarray([n], jnp.int32),
            page_size=P, scale=0.25, alibi_slopes=slopes))[0]
        slots = (np.arange(1, 5)[:, None] * P + np.arange(P)).reshape(-1)[:n]
        k = np.asarray(kv5)[0, 0][slots]
        v = np.asarray(kv5)[0, 1][slots]
        qn = np.asarray(q)[0]
        for h in range(Hq):
            sc = k[:, h] @ qn[h] * 0.25
            sc = sc - float(slopes[h]) * (n - 1 - np.arange(n))
            w = np.exp(sc - sc.max()); w /= w.sum()
            np.testing.assert_allclose(got[h], w @ v[:, h], rtol=1e-4, atol=1e-5)
    finally:
        del mc.hf_config.position_embedding


def test_qwen1_matches_llama():
    """Qwen v1: MHA + fused biased c_attn + w2/w1 gate-up order."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256, tie_word_embeddings=False,
        attention_bias=True,
    )
    cfg.architectures = ["LlamaForCausalLM"]
    torch.manual_seed(1)
    hf = LlamaForCausalLM(cfg).eval().float()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    eng_ref = _engine("LlamaForCausalLM", cfg, sd.items())
    want = _tokens(eng_ref, PROMPTS)

    renamed = {
        "transformer.wte.weight": sd["model.embed_tokens.weight"],
        "transformer.ln_f.weight": sd["model.norm.weight"],
        "lm_head.weight": sd["lm_head.weight"],
    }
    for l in range(cfg.num_hidden_layers):
        src, dst = f"model.layers.{l}.", f"transformer.h.{l}."
        renamed.update({
            dst + "ln_1.weight": sd[src + "input_layernorm.weight"],
            dst + "attn.c_attn.weight": np.concatenate([
                sd[src + "self_attn.q_proj.weight"],
                sd[src + "self_attn.k_proj.weight"],
                sd[src + "self_attn.v_proj.weight"]], axis=0),
            dst + "attn.c_attn.bias": np.concatenate([
                sd[src + "self_attn.q_proj.bias"],
                sd[src + "self_attn.k_proj.bias"],
                sd[src + "self_attn.v_proj.bias"]], axis=0),
            dst + "attn.c_proj.weight": sd[src + "self_attn.o_proj.weight"],
            dst + "ln_2.weight": sd[src + "post_attention_layernorm.weight"],
            dst + "mlp.w2.weight": sd[src + "mlp.gate_proj.weight"],
            dst + "mlp.w1.weight": sd[src + "mlp.up_proj.weight"],
            dst + "mlp.c_proj.weight": sd[src + "mlp.down_proj.weight"],
        })
    eng = _engine("QWenLMHeadModel", cfg, renamed.items())
    assert _tokens(eng, PROMPTS) == want


def test_minicpm_scales_match_folded_llama(hf_llama):
    """MiniCPM's scale_emb / scale_depth / dim_model_base knobs are exactly
    equivalent to folding the scales into llama weights."""
    hf, cfg = hf_llama
    sd = {k: v.numpy().copy() for k, v in hf.state_dict().items()}
    scale_emb, scale_depth, dim_model_base = 4.0, 1.4, 32
    r = scale_depth / np.sqrt(cfg.num_hidden_layers)

    cfg.scale_emb = scale_emb
    cfg.scale_depth = scale_depth
    cfg.dim_model_base = dim_model_base
    eng_cpm = _engine("MiniCPMForCausalLM", cfg, sd.items())

    folded = dict(sd)
    folded["model.embed_tokens.weight"] = sd["model.embed_tokens.weight"] * scale_emb
    folded["lm_head.weight"] = sd["lm_head.weight"] / (cfg.hidden_size / dim_model_base)
    for l in range(cfg.num_hidden_layers):
        p = f"model.layers.{l}."
        folded[p + "self_attn.o_proj.weight"] = sd[p + "self_attn.o_proj.weight"] * r
        folded[p + "mlp.down_proj.weight"] = sd[p + "mlp.down_proj.weight"] * r
    for k in ("scale_emb", "scale_depth", "dim_model_base"):
        delattr(cfg, k)
    eng_ref = _engine("LlamaForCausalLM", cfg, folded.items())
    assert _tokens(eng_cpm, PROMPTS) == _tokens(eng_ref, PROMPTS)


def test_xverse_is_llama_alias():
    from semi_pd_tpu.models.llama import LlamaForCausalLM
    from semi_pd_tpu.models.registry import get_model_class

    assert get_model_class("XverseForCausalLM") is LlamaForCausalLM


def test_deepseek_v1_dense_and_moe_layers():
    """DeepSeek v1 / XVerse-MoE MLP composition: dense first_k layers,
    softmax top-k routed experts + UNGATED shared experts after, verified
    against a direct numpy evaluation of the same weights."""
    import jax.numpy as jnp
    from transformers import LlamaConfig

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=16, intermediate_size=24,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    cfg.architectures = ["DeepseekForCausalLM"]
    cfg.n_routed_experts = 4
    cfg.num_experts_per_tok = 2
    cfg.moe_intermediate_size = 8
    cfg.n_shared_experts = 1
    cfg.first_k_dense_replace = 1
    cfg.moe_layer_freq = 1
    cfg.norm_topk_prob = False
    mc = ModelConfig.from_hf_config(cfg, dtype="float32")
    assert mc.architecture == "DeepseekForCausalLM"

    from semi_pd_tpu.models.registry import create_model

    model = create_model(mc)
    params = model.init_params(seed=0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(5, 16)).astype(np.float32))

    def np_silu(v):
        return v / (1 + np.exp(-v))

    def np_mlp(gu, dn, xv):
        a = xv @ np.asarray(gu)
        g, u = a[:, : a.shape[1] // 2], a[:, a.shape[1] // 2:]
        return (np_silu(g) * u) @ np.asarray(dn)

    import jax

    xn = np.asarray(x)
    # layer 0: dense
    lp0 = jax.tree.map(lambda a: a[0], params["layers"])
    model._current_layer = 0
    got0 = np.asarray(model._mlp(lp0, x))
    want0 = np_mlp(lp0["dense_gate_up"]["w"], lp0["dense_down"]["w"], xn)
    np.testing.assert_allclose(got0, want0, rtol=1e-5, atol=1e-5)

    # layer 1: moe + ungated shared
    lp1 = jax.tree.map(lambda a: a[1], params["layers"])
    model._current_layer = 1
    got1 = np.asarray(model._mlp(lp1, x))
    logits = xn @ np.asarray(lp1["router"]["w"])
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    want1 = np.zeros_like(xn)
    for t in range(xn.shape[0]):
        top = np.argsort(-probs[t])[:2]
        for e in top:
            ew = np_mlp(lp1["experts"]["gate_up"][e], lp1["experts"]["down"][e],
                        xn[t:t + 1])
            want1[t] += probs[t, e] * ew[0]
    want1 += np_mlp(lp1["shared"]["gate_up"]["w"], lp1["shared"]["down"]["w"], xn)
    np.testing.assert_allclose(got1, want1, rtol=1e-4, atol=1e-4)


def test_internlm2_reward_scores(hf_llama):
    hf, cfg = hf_llama
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    kvh, nh = cfg.num_key_value_heads, cfg.num_attention_heads
    groups, d = nh // kvh, cfg.hidden_size // nh
    renamed = {
        "model.tok_embeddings.weight": sd["model.embed_tokens.weight"],
        "model.norm.weight": sd["model.norm.weight"],
        "v_head.weight": np.ones((1, cfg.hidden_size), np.float32) * 0.1,
    }
    for l in range(cfg.num_hidden_layers):
        p = f"model.layers.{l}."
        wq = sd[p + "self_attn.q_proj.weight"].reshape(kvh, groups, d, -1)
        wk = sd[p + "self_attn.k_proj.weight"].reshape(kvh, 1, d, -1)
        wv = sd[p + "self_attn.v_proj.weight"].reshape(kvh, 1, d, -1)
        renamed.update({
            p + "attention_norm.weight": sd[p + "input_layernorm.weight"],
            p + "attention.wqkv.weight": np.concatenate(
                [wq, wk, wv], axis=1).reshape(-1, cfg.hidden_size),
            p + "attention.wo.weight": sd[p + "self_attn.o_proj.weight"],
            p + "ffn_norm.weight": sd[p + "post_attention_layernorm.weight"],
            p + "feed_forward.w1.weight": sd[p + "mlp.gate_proj.weight"],
            p + "feed_forward.w3.weight": sd[p + "mlp.up_proj.weight"],
            p + "feed_forward.w2.weight": sd[p + "mlp.down_proj.weight"],
        })
    eng = _engine("InternLM2ForRewardModel", cfg, renamed.items())
    scores = eng.encode(input_ids=[[1, 2, 3, 4], [9, 8, 7]])
    assert len(scores) == 2
    assert all(np.isfinite(np.asarray(s)).all() for s in scores)
