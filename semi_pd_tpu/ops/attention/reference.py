"""Reference ragged paged attention in pure jnp.

This is the correctness baseline for the Pallas kernels (the role of the
reference's TorchNativeAttnBackend, srt/layers/attention/torch_native_backend.py
— a pure-framework backend every optimized backend is tested against) and the
backend used on CPU-device test runs, giving this framework the GPU-free test
tier the reference lacks (SURVEY.md §4).

Layout ("ragged"): one call serves both prefill (extend) and decode. Queries
for all requests in the batch are concatenated into a flat [T, Hq, D] array;
per-token arrays map each query row to its request and absolute position.
KV is read from the shared paged pool via the per-batch page table.

Semantics: query token t (request r = q_req_idx[t], position p = q_pos[t])
attends to KV positions j of request r with j <= p and j < kv_lens[r]. New
tokens' K/V must already be scattered into the pool before the call (the
scheduler allocates their slots; reference schedule_batch.py:923-935 derives
write locations the same way).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def ragged_paged_attention_reference(
    q: jax.Array,  # [T, Hq, D]
    kv_cache: jax.Array,  # [L, 2, S, Hkv, D] combined pool (component: K=0, V=1)
    layer_idx,  # int or traced scalar
    page_table: jax.Array,  # [B, maxP] int32 page ids
    q_req_idx: jax.Array,  # [T] i32 (padding rows -> row 0, masked out)
    q_pos: jax.Array,  # [T] i32 absolute position of query token
    kv_lens: jax.Array,  # [B] i32 total kv length per request (incl. new)
    page_size: int,
    scale: float,
    logit_cap: Optional[float] = None,
    sliding_window: Optional[int] = None,
    v_dim: Optional[int] = None,
    spec_anc: Optional[tuple] = None,
    win_base: Optional[jax.Array] = None,  # [B] i32 window start per request
    alibi_slopes: Optional[jax.Array] = None,  # [Hq] f32 (baichuan-13b)
) -> jax.Array:
    """``v_dim``: MLA mode — the cache has one component (the latent
    [c_kv | k_pe] row); V is the first v_dim dims of K (reference
    MLATokenToKVPool memory_pool.py:379 + DeepseekV2AttentionMLA
    forward_absorb deepseek_v2.py:633).

    ``spec_anc``: static speculation-tree ancestor bitmasks (one int per
    window node; see speculative/tree.py). When set, ``q_pos`` must be
    SLOT-ORDER positions (window node index relative to ``win_base``), and
    kv slots inside the window [win_base, win_base+W) additionally require
    the matching ancestor bit — tree attention for draft/verify batches."""
    T, Hq, D = q.shape
    Hkv = kv_cache.shape[3]
    B, maxP = page_table.shape
    max_kv = maxP * page_size
    group = Hq // Hkv

    # Gather each request's KV window: [B, max_kv, Hkv, D] per component
    slot_ids = (
        page_table[:, :, None] * page_size
        + jnp.arange(page_size, dtype=jnp.int32)[None, None, :]
    ).reshape(B, max_kv)
    k = kv_cache[layer_idx, 0][slot_ids].astype(jnp.float32)
    if v_dim is not None:
        v = k[..., :v_dim]
        Dv = v_dim
    else:
        v = kv_cache[layer_idx, 1][slot_ids].astype(jnp.float32)
        Dv = D

    # Per-query-token views of its request's KV: [T, max_kv, Hkv, D]
    k_t = k[q_req_idx]
    v_t = v[q_req_idx]

    qf = q.astype(jnp.float32).reshape(T, Hkv, group, D)
    scores = jnp.einsum("thgd,tkhd->thgk", qf, k_t) * scale  # [T,Hkv,g,max_kv]
    if logit_cap:
        scores = logit_cap * jnp.tanh(scores / logit_cap)

    kv_pos = jnp.arange(max_kv, dtype=jnp.int32)[None, :]  # [1, max_kv]
    if alibi_slopes is not None:
        # ALiBi (reference baichuan.py 13B path): score -= slope_h * distance
        dist = (q_pos[:, None] - kv_pos).astype(jnp.float32)  # [T, max_kv]
        slopes = alibi_slopes.astype(jnp.float32).reshape(1, Hkv, group, 1)
        scores = scores - slopes * dist[:, None, None, :]
    valid = (kv_pos <= q_pos[:, None]) & (kv_pos < kv_lens[q_req_idx][:, None])
    if sliding_window is not None and sliding_window > 0:
        valid &= kv_pos > (q_pos[:, None] - sliding_window)
    if spec_anc is not None and win_base is not None:
        W = len(spec_anc)
        anc = jnp.asarray(
            np.asarray(spec_anc, dtype=np.uint64).astype(np.uint32)
        )
        wb = win_base[q_req_idx]  # [T]
        win_q = q_pos - wb  # node index of each q row
        bits = anc[jnp.clip(win_q, 0, W - 1)]  # [T]
        win_kv = kv_pos - wb[:, None]  # [T, max_kv]
        in_win = (win_kv >= 0) & (win_kv < W)
        shift = jnp.clip(win_kv, 0, 31).astype(jnp.uint32)
        tree_ok = ((bits[:, None] >> shift) & jnp.uint32(1)) == jnp.uint32(1)
        valid &= jnp.where(in_win, tree_ok, True)
    scores = jnp.where(valid[:, None, None, :], scores, -jnp.inf)

    probs = jax.nn.softmax(scores, axis=-1)
    # Fully-masked (padding) rows produce NaN from softmax over -inf; zero them.
    probs = jnp.where(jnp.any(valid, axis=-1)[:, None, None, None], probs, 0.0)
    out = jnp.einsum("thgk,tkhd->thgd", probs, v_t)  # [T,Hkv,g,Dv]
    return out.reshape(T, Hq, Dv).astype(q.dtype)
