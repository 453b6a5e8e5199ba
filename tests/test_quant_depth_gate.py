"""Depth-compounding quantization accuracy gate.

Tiny 2-layer parity (test_llama_parity / test_quant) cannot catch errors
that COMPOUND with depth — a mis-scaled KV write or a doubled dequant
scale looks like noise at 2 layers and like garbage at 8. This gate runs
an 8-layer model through the real bucketed step programs:

1. a float32 baseline greedily generates a 64-token continuation;
2. each quantized path (fp8-KV, fp8 weights, int8 w8a8, AWQ int4)
   TEACHER-FORCES the same 80-token sequence (free-running comparison is
   chaotic: one near-tie flip diverges the whole trajectory) and is held
   to a bounded per-position logprob divergence AND a minimum per-position
   argmax agreement vs the baseline.

Measured honest divergence on this config (mean |dlogprob| / top-1 agree):
fp8-KV 0.018/0.91 · fp8 0.043/0.91 · int8 0.013/0.95 · awq 0.235/0.54;
a single 2x dequant-scale bug in ONE mid-stack layer gives 0.79/0.13 —
an order of magnitude past every bound below.
test_gate_catches_scale_bug pins that separation so the gate keeps teeth.

Reference accuracy-gate pattern: test/srt/test_eval_fp8_accuracy.py (MMLU
threshold on a served fp8 model; no datasets exist in this environment,
so the gate is teacher-consistency at depth instead).
"""

import numpy as np
import pytest

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.config.server_args import ServerArgs
from semi_pd_tpu.runtime.engine import Engine
from semi_pd_tpu.sampling.sampling_params import SamplingParams

LAYERS = 8
STEPS = 64


def _hf_model():
    import torch
    from transformers import LlamaConfig as HFC, LlamaForCausalLM as HFL

    cfg = HFC(vocab_size=256, hidden_size=64, intermediate_size=128,
              num_hidden_layers=LAYERS, num_attention_heads=4,
              num_key_value_heads=2, max_position_embeddings=512,
              tie_word_embeddings=False)
    torch.manual_seed(0)
    hf = HFL(cfg).eval().float()
    with torch.no_grad():
        # spread the logits so near-ties don't dominate top-1 agreement
        hf.lm_head.weight.mul_(6.0)
    return cfg, hf


def _engine(mc, weights, **args_kw):
    from semi_pd_tpu.model_loader.loader import load_params

    eng = Engine(
        server_args=ServerArgs(model_path="", random_weights=True,
                               page_size=4, max_total_tokens=1024,
                               dtype="float32", **args_kw),
        model_config=mc,
    )
    eng.runner.params = load_params(eng.runner.model, weights=weights)
    return eng


def _teacher(eng, seq):
    """Per-position (logprob of the forced token, argmax id) over seq."""
    entries = eng.score(input_ids=seq, top_logprobs_num=1)
    return (np.array([e[0] for e in entries], float),
            np.array([e[2][1][0] for e in entries]))


@pytest.fixture(scope="module")
def baseline():
    cfg, hf = _hf_model()
    mc = ModelConfig.from_hf_config(cfg, dtype="float32")
    weights = list(hf.state_dict().items())

    eng = _engine(mc, weights)
    rng = np.random.default_rng(123)
    prompt = rng.integers(0, 256, size=16).tolist()
    out = eng.generate(
        input_ids=prompt,
        sampling_params=SamplingParams(max_new_tokens=STEPS,
                                       temperature=0.0, ignore_eos=True))
    assert len(out["output_ids"]) == STEPS
    seq = prompt + out["output_ids"]
    lp0, top0 = _teacher(eng, seq)
    return mc, weights, seq, lp0, top0


def _gate(baseline_tuple, eng, lp_mean_bound, top1_bound, label):
    mc, weights, seq, lp0, top0 = baseline_tuple
    lp, top = _teacher(eng, seq)
    d = np.abs(lp - lp0)
    agree = float((top == top0).mean())
    assert d.mean() < lp_mean_bound, (
        f"{label}: logprob divergence {d.mean():.4f} (max {d.max():.4f}) "
        f"exceeds {lp_mean_bound} — a compounding-scale regression")
    assert agree >= top1_bound, (
        f"{label}: per-position argmax agreement {agree:.3f} < {top1_bound}")
    return float(d.mean()), agree


def test_fp8_kv_depth(baseline):
    mc, weights = baseline[:2]
    eng = _engine(mc, weights, kv_cache_dtype="fp8_e4m3")
    _gate(baseline, eng, 0.06, 0.80, "fp8-KV")


@pytest.mark.parametrize("method,lp_bound,top1_bound", [
    ("fp8", 0.10, 0.80),
    ("int8", 0.06, 0.85),
    ("awq_int4", 0.40, 0.40),
])
def test_weight_quant_depth(baseline, method, lp_bound, top1_bound):
    from semi_pd_tpu.model_loader.quantize import quantize_params

    mc, weights = baseline[:2]
    eng = _engine(mc, weights)
    eng.runner.params = quantize_params(eng.runner.params, method)
    _gate(baseline, eng, lp_bound, top1_bound, method)


def _corrupt_layer4_scales(node):
    """The classic bug shape: one layer's dequant scales applied 2x."""
    import jax.numpy as jnp

    if isinstance(node, dict):
        for k, v in node.items():
            if (k == "ws" and hasattr(v, "ndim") and v.ndim >= 1
                    and v.shape[0] == LAYERS):
                node[k] = jnp.asarray(v).at[4].mul(2.0)
            else:
                _corrupt_layer4_scales(v)


def test_gate_catches_scale_bug(baseline):
    """Teeth: a single 2x dequant-scale bug in ONE mid-stack layer must
    trip the fp8 gate. If this ever passes, the bounds have gone soft."""
    from semi_pd_tpu.model_loader.quantize import quantize_params

    mc, weights, seq, lp0, top0 = baseline
    eng = _engine(mc, weights)
    qp = quantize_params(eng.runner.params, "fp8")
    _corrupt_layer4_scales(qp)
    eng.runner.params = qp
    lp, top = _teacher(eng, seq)
    d = np.abs(lp - lp0)
    agree = float((top == top0).mean())
    assert d.mean() >= 0.10 and agree < 0.80, (
        "gate failed to detect a 2x scale bug", float(d.mean()), agree)


# ---------------------------------------------------------------- depth 32
# Round-5 deepening (VERDICT r4 #7): 32 layers x 256 greedy steps with
# fp8-KV stacked on each weight-quant method SIMULTANEOUSLY. Honest
# measured divergence on this config (mean |dlogprob| / top-1 agree):
#   fp8kv+fp8 0.066/0.779 · fp8kv+blockwise_fp8 0.028/0.875 ·
#   fp8kv+awq_int4 0.086/0.672 · fp8kv+int8 0.036/0.860
# Negative result, measured: a UNIFORM small per-layer scale bug (1.05x on
# every layer's dequant scales) does NOT compound with depth — RMSNorm
# renormalizes the residual stream, so mean dlogprob moves 0.084->0.097 at
# 32 layers and 0.043->0.084 at 8: the depth-8 gate separates it BETTER.
# What depth catches is method-error compounding (the honest fp8 divergence
# doubles 8->32 layers: 0.043->0.084); the bug class that stays dramatic at
# any depth is a localized scale error (single-layer 2x: order of magnitude
# past every bound), gated below on the combined path.

LAYERS32 = 32
STEPS32 = 256


def _hf_model32():
    import torch
    from transformers import LlamaConfig as HFC, LlamaForCausalLM as HFL

    cfg = HFC(vocab_size=256, hidden_size=64, intermediate_size=128,
              num_hidden_layers=LAYERS32, num_attention_heads=4,
              num_key_value_heads=2, max_position_embeddings=512,
              tie_word_embeddings=False)
    torch.manual_seed(0)
    hf = HFL(cfg).eval().float()
    with torch.no_grad():
        hf.lm_head.weight.mul_(6.0)
    return cfg, hf


@pytest.fixture(scope="module")
def baseline32():
    cfg, hf = _hf_model32()
    mc = ModelConfig.from_hf_config(cfg, dtype="float32")
    weights = list(hf.state_dict().items())
    eng = _engine(mc, weights)
    rng = np.random.default_rng(123)
    prompt = rng.integers(0, 256, size=16).tolist()
    out = eng.generate(
        input_ids=prompt,
        sampling_params=SamplingParams(max_new_tokens=STEPS32,
                                       temperature=0.0, ignore_eos=True))
    assert len(out["output_ids"]) == STEPS32
    seq = prompt + out["output_ids"]
    lp0, top0 = _teacher(eng, seq)
    return mc, weights, seq, lp0, top0


@pytest.mark.parametrize("method,lp_bound,top1_bound", [
    ("fp8", 0.11, 0.70),
    ("blockwise_fp8", 0.06, 0.80),
    ("int8", 0.07, 0.78),
    ("awq_int4", 0.15, 0.55),
])
def test_depth32_fp8kv_plus_weight_quant(baseline32, method, lp_bound,
                                         top1_bound):
    """fp8-KV AND weight quantization together, 32 layers, 256 forced
    steps — the compounding axes tiny parity misses (reference
    test_eval_fp8_accuracy.py intent; no datasets in env)."""
    from semi_pd_tpu.model_loader.quantize import quantize_params

    mc, weights = baseline32[:2]
    eng = _engine(mc, weights, kv_cache_dtype="fp8_e4m3")
    eng.runner.params = quantize_params(eng.runner.params, method)
    _gate(baseline32, eng, lp_bound, top1_bound, f"fp8kv+{method}@32L")


def _corrupt_one_layer(node, layer, factor):
    import jax.numpy as jnp

    if isinstance(node, dict):
        for k, v in node.items():
            if (k == "ws" and hasattr(v, "ndim") and v.ndim >= 1
                    and v.shape[0] == LAYERS32):
                node[k] = jnp.asarray(v).at[layer].mul(factor)
            else:
                _corrupt_one_layer(v, layer, factor)


def test_depth32_gate_catches_midstack_scale_bug(baseline32):
    """Teeth at depth: a 2x dequant-scale bug in ONE mid-stack layer (16 of
    32) must trip the combined fp8kv+fp8 gate."""
    from semi_pd_tpu.model_loader.quantize import quantize_params

    mc, weights, seq, lp0, top0 = baseline32
    eng = _engine(mc, weights, kv_cache_dtype="fp8_e4m3")
    qp = quantize_params(eng.runner.params, "fp8")
    _corrupt_one_layer(qp, 16, 2.0)
    eng.runner.params = qp
    lp, top = _teacher(eng, seq)
    d = np.abs(lp - lp0)
    agree = float((top == top0).mean())
    assert d.mean() >= 0.11 and agree < 0.70, (
        "depth-32 gate failed to detect a 2x mid-stack scale bug",
        float(d.mean()), agree)
