"""HF logit-parity test for the Llama family.

Port of the reference's model-parity harness pattern
(python/sglang/test/runners.py — HFRunner vs SRTRunner comparing logits), but
runnable with no accelerator: a tiny random-weight HF Llama on CPU torch vs
our jax model through the full paged-KV path (prefill then decode steps)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semi_pd_tpu.mem.pool import KVCache, KVCacheSpec
from semi_pd_tpu.model_loader.loader import load_params
from semi_pd_tpu.models.llama import LlamaForCausalLM
from semi_pd_tpu.ops.sampling import SamplingArrays
from semi_pd_tpu.runtime.forward_batch import ForwardArrays, build_attn_meta

PAGE = 4


def _mk_fb(input_ids, q_req_idx, q_pos, out_slots, page_table, kv_lens, logits_idx,
           q_lens=None):
    B = len(kv_lens)
    T = len(input_ids)
    if q_lens is None:  # decode-style: one token per req
        q_lens = [1] * B
    return ForwardArrays(
        input_ids=jnp.asarray(input_ids, jnp.int32),
        q_req_idx=jnp.asarray(q_req_idx, jnp.int32),
        q_pos=jnp.asarray(q_pos, jnp.int32),
        out_slots=jnp.asarray(out_slots, jnp.int32),
        page_table=jnp.asarray(page_table, jnp.int32),
        kv_lens=jnp.asarray(kv_lens, jnp.int32),
        logits_idx=jnp.asarray(logits_idx, jnp.int32),
        sampling=SamplingArrays(
            temperature=jnp.zeros(B, jnp.float32),
            top_k=jnp.zeros(B, jnp.int32),
            top_p=jnp.ones(B, jnp.float32),
            min_p=jnp.zeros(B, jnp.float32),
            presence_penalty=jnp.zeros(B, jnp.float32),
            frequency_penalty=jnp.zeros(B, jnp.float32),
            repetition_penalty=jnp.ones(B, jnp.float32),
        ),
        rng_key=jax.random.PRNGKey(0),
        num_reqs=jnp.asarray(B, jnp.int32),
        attn_meta=build_attn_meta(
            np.asarray(q_lens, np.int64), np.asarray(kv_lens, np.int64), T
        ),
    )


@pytest.fixture(scope="module")
def hf_and_ours():
    import torch
    from transformers import LlamaConfig as HFLlamaConfig, LlamaForCausalLM as HFLlama

    from semi_pd_tpu.config.model_config import ModelConfig

    hf_cfg = HFLlamaConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = HFLlama(hf_cfg).eval().float()

    cfg = ModelConfig.from_hf_config(hf_cfg, dtype="float32")
    model = LlamaForCausalLM(cfg)
    model.page_size = PAGE
    params = load_params(model, weights=list(hf.state_dict().items()))
    return hf, model, params


def test_prefill_and_decode_parity(hf_and_ours):
    import torch

    hf, model, params = hf_and_ours
    rng = np.random.default_rng(0)
    n = 11
    prompt = rng.integers(0, 256, size=n).tolist()

    with torch.no_grad():
        hf_logits = hf(torch.tensor([prompt + [7, 9]])).logits[0].numpy()

    spec = KVCacheSpec(
        num_layers=2, num_pages=16, page_size=PAGE, num_kv_heads=2,
        head_dim=16, dtype=jnp.float32,
    )
    cache = KVCache(spec)

    # ---- prefill of n tokens, padded to T=16
    T, maxP = 16, 8
    n_pages = -(-(n + 2) // PAGE)  # room for 2 decode tokens too
    pages = np.arange(1, 1 + n_pages, dtype=np.int32)
    page_table = np.zeros((1, maxP), np.int32)
    page_table[0, :n_pages] = pages

    slot_of = lambda i: pages[i // PAGE] * PAGE + i % PAGE
    out_slots = [slot_of(i) for i in range(n)] + [0] * (T - n)
    fb = _mk_fb(
        input_ids=prompt + [0] * (T - n),
        q_req_idx=[0] * T,
        q_pos=list(range(n)) + [0] * (T - n),
        out_slots=out_slots,
        page_table=page_table,
        kv_lens=[n],
        logits_idx=[n - 1],
        q_lens=[n],
    )
    logits, kv = model.forward(params, fb, cache.arrays)
    np.testing.assert_allclose(
        np.asarray(logits[0]), hf_logits[n - 1], rtol=2e-4, atol=2e-4
    )

    # ---- two decode steps with tokens 7 then 9
    for step, tok in enumerate([7, 9]):
        pos = n + step
        fb = _mk_fb(
            input_ids=[tok],
            q_req_idx=[0],
            q_pos=[pos],
            out_slots=[slot_of(pos)],
            page_table=page_table,
            kv_lens=[pos + 1],
            logits_idx=[0],
        )
        logits, kv = model.forward(params, fb, kv)
        np.testing.assert_allclose(
            np.asarray(logits[0]), hf_logits[pos], rtol=2e-4, atol=2e-4
        )


def test_batched_mixed_prefill_parity(hf_and_ours):
    """Two requests raggedly packed in one extend batch."""
    import torch

    hf, model, params = hf_and_ours
    rng = np.random.default_rng(1)
    p1 = rng.integers(0, 256, size=5).tolist()
    p2 = rng.integers(0, 256, size=7).tolist()

    with torch.no_grad():
        l1 = hf(torch.tensor([p1])).logits[0, -1].numpy()
        l2 = hf(torch.tensor([p2])).logits[0, -1].numpy()

    spec = KVCacheSpec(
        num_layers=2, num_pages=16, page_size=PAGE, num_kv_heads=2,
        head_dim=16, dtype=jnp.float32,
    )
    cache = KVCache(spec)

    T, maxP = 16, 4
    pt = np.zeros((2, maxP), np.int32)
    pt[0, :2] = [1, 2]
    pt[1, :2] = [3, 4]
    slot = lambda r, i: pt[r, i // PAGE] * PAGE + i % PAGE
    ids = p1 + p2 + [0] * (T - 12)
    req = [0] * 5 + [1] * 7 + [0] * (T - 12)
    posn = list(range(5)) + list(range(7)) + [0] * (T - 12)
    slots = [slot(0, i) for i in range(5)] + [slot(1, i) for i in range(7)] + [0] * (T - 12)
    fb = _mk_fb(ids, req, posn, slots, pt, [5, 7], [4, 11], q_lens=[5, 7])
    logits, _ = model.forward(params, fb, cache.arrays)
    np.testing.assert_allclose(np.asarray(logits[0]), l1, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logits[1]), l2, rtol=2e-4, atol=2e-4)
