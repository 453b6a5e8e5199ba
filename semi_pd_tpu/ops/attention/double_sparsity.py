"""Double-sparsity attention (post-training token sparsity for decode).

Reference: srt/layers/attention/double_sparsity_backend.py +
DoubleSparseTokenToKVPool (memory_pool.py:455-529) + the paper's offline
channel selection. Mechanism:

- A LABEL cache stores, per written K row, its ``heavy_channel_num``
  most-informative channels (channel indices come from an offline-profiled
  config, reference model_runner.py:1174 init_double_sparsity_channel_config;
  without a config we default to the leading channels).
- Decode approximates attention scores from ``q_label . k_label`` (a
  C/D-fraction read of the pool), takes the per-head top
  ``heavy_token_num`` tokens, and runs EXACT attention over only those.
- Requests shorter than heavy_token_num degrade gracefully to exact
  attention: invalid/-inf-scored gathers contribute zero weight.

This is the jnp formulation (correctness tier, runs on CPU and TPU); the
sparse gather is already a bandwidth win at long contexts, and a Pallas
top-k-gather kernel is the optimization follow-up. Extend/prefill stays
dense (as in the reference: double sparsity targets decode).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def write_labels(
    label_cache: jax.Array,  # [L, S, H, C]
    k_new: jax.Array,  # [T, H, D]
    channels: jax.Array,  # [L, H, C] i32 (static per model)
    layer_idx,
    out_slots: jax.Array,  # [T]
) -> jax.Array:
    ch = channels[layer_idx]  # [H, C]
    k_label = jnp.take_along_axis(
        k_new, jnp.broadcast_to(ch[None], (k_new.shape[0],) + ch.shape), axis=-1
    )  # [T, H, C]
    return label_cache.at[layer_idx, out_slots].set(
        k_label.astype(label_cache.dtype)
    )


def sparse_decode_attention(
    q: jax.Array,  # [B, Hq, D] (decode: one row per request)
    kv_cache: jax.Array,  # [L, 2, S, Hkv, D]
    label_cache: jax.Array,  # [L, S, Hkv, C]
    channels: jax.Array,  # [L, Hkv, C]
    layer_idx,
    page_table: jax.Array,  # [B, maxP]
    kv_lens: jax.Array,  # [B]
    page_size: int,
    scale: float,
    heavy_token_num: int,
) -> jax.Array:
    B, Hq, D = q.shape
    maxP = page_table.shape[1]
    Skv = maxP * page_size
    Hkv = kv_cache.shape[3]
    G = Hq // Hkv

    # per-request slot ids [B, Skv]
    slots = page_table[:, :, None] * page_size + jnp.arange(page_size)[None, None]
    slots = slots.reshape(B, Skv)
    valid = jnp.arange(Skv)[None, :] < kv_lens[:, None]  # [B, Skv]

    # approximate scores from labels (the C/D-fraction read)
    labels = label_cache[layer_idx][slots]  # [B, Skv, Hkv, C]
    ch = channels[layer_idx]  # [Hkv, C]
    qh = q.reshape(B, Hkv, G, D)
    q_label = jnp.take_along_axis(
        qh, jnp.broadcast_to(ch[None, :, None], (B, Hkv, G, ch.shape[-1])),
        axis=-1,
    )  # [B, Hkv, G, C]
    approx = jnp.einsum(
        "bhgc,bshc->bhgs", q_label.astype(jnp.float32),
        labels.astype(jnp.float32),
    )
    approx = jnp.where(valid[:, None, None, :], approx, -jnp.inf)

    k_top = min(heavy_token_num, Skv)
    _, top_idx = jax.lax.top_k(approx, k_top)  # [B, Hkv, G, k]

    # exact attention over the selected tokens, per kv head (single fused
    # gather: [slot, head] advanced indexing)
    top_slots = jnp.take_along_axis(
        jnp.broadcast_to(slots[:, None, None], top_idx.shape[:3] + (Skv,)),
        top_idx, axis=-1,
    )  # [B, Hkv, G, k]
    h_idx = jnp.arange(Hkv)[None, :, None, None]
    k_sel = kv_cache[layer_idx, 0][top_slots, h_idx]  # [B, Hkv, G, k, D]
    v_sel = kv_cache[layer_idx, 1][top_slots, h_idx]

    scores = jnp.einsum(
        "bhgd,bhgkd->bhgk", qh.astype(jnp.float32), k_sel.astype(jnp.float32)
    ) * scale
    sel_valid = jnp.take_along_axis(
        jnp.broadcast_to(valid[:, None, None], top_idx.shape[:3] + (Skv,)),
        top_idx, axis=-1,
    )
    scores = jnp.where(sel_valid, scores, -jnp.inf)
    w = jax.nn.softmax(scores, axis=-1)
    w = jnp.nan_to_num(w)
    out = jnp.einsum("bhgk,bhgkd->bhgd", w, v_sel.astype(jnp.float32))
    return out.reshape(B, Hq, D).astype(q.dtype)


def paged_attention_ds(
    q, k_new, v_new,
    kv_cache, label_cache,
    channels,  # [L, Hkv, C] device array
    layer_idx, fb, *, page_size: int, scale: float, heavy_token_num: int,
    sparse_threshold: int = 4096,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Write K/V + labels; decode batches (T == B) use the sparse path,
    extend stays dense. Returns (out, kv_cache', label_cache').

    sparse_threshold (reference ds_sparse_decode_threshold,
    server_args.py:143): while every context is still shorter than this,
    dense decode is both cheaper (top-k + gather overhead exceeds the read
    it saves) and exact, so the sparse path only engages beyond it —
    a runtime lax.cond, since kv_lens change per step while the program is
    compiled once per bucket."""
    from semi_pd_tpu.ops.attention.reference import (
        ragged_paged_attention_reference,
    )

    T = q.shape[0]
    B = fb.page_table.shape[0]
    kv_new = jnp.stack([k_new, v_new], axis=0)
    kv_cache = kv_cache.at[layer_idx, :, fb.out_slots].set(
        jnp.swapaxes(kv_new, 0, 1).astype(kv_cache.dtype)
    )
    label_cache = write_labels(label_cache, k_new, channels, layer_idx, fb.out_slots)

    def _dense(_):
        return ragged_paged_attention_reference(
            q, kv_cache, layer_idx, fb.page_table, fb.q_req_idx,
            fb.mask_pos if fb.mask_pos is not None else fb.q_pos,
            fb.kv_lens, page_size=page_size, scale=scale,
        ).astype(q.dtype)

    if T == B:  # decode
        def _sparse(_):
            return sparse_decode_attention(
                q, kv_cache, label_cache, channels, layer_idx,
                fb.page_table, fb.kv_lens, page_size, scale, heavy_token_num,
            )

        out = jax.lax.cond(
            jnp.max(fb.kv_lens) <= sparse_threshold, _dense, _sparse, None
        )
    else:
        out = _dense(None)
    return out, kv_cache, label_cache


def load_channel_config(
    path, num_layers: int, num_kv_heads: int, num_heads: int,
    head_dim: int, n_channels: int, selected: str = "k",
) -> np.ndarray:
    """[L, Hkv, C] channel indices. With a config file, reads the reference
    format ({"model.layers.N.self_attn.<sel>_proj": [[ch...] per head]},
    model_runner.py:1174); q/qk-profiled heads fold onto kv heads by group.
    Without one, defaults to the leading channels (deterministic; correct
    shape for serving, accuracy requires an offline-profiled config)."""
    if path:
        import json

        with open(path) as f:
            cfg = json.load(f)
        out = []
        for l in range(num_layers):
            rows = np.asarray(
                cfg[f"model.layers.{l}.self_attn.{selected}_proj"], np.int32
            )[:, :n_channels]
            if rows.shape[0] == num_heads and num_heads != num_kv_heads:
                rows = rows.reshape(num_kv_heads, -1, rows.shape[-1])[:, 0]
            out.append(rows)
        return np.stack(out)
    base = np.arange(n_channels, dtype=np.int32)
    return np.broadcast_to(
        base, (num_layers, num_kv_heads, n_channels)
    ).copy()
