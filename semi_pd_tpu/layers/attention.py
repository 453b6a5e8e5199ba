"""Attention layer: KV-pool write + backend dispatch.

The role of the reference's RadixAttention thin module + AttentionBackend ABC
(srt/layers/radix_attention.py:21-70, attention/base_attn_backend.py:14-108):
every model's attention calls ``paged_attention`` which (1) scatters the
step's fresh K/V into the shared pool at the scheduler-assigned slots and
(2) runs the selected backend over the paged pool. Backends:

- "reference": pure-jnp ragged attention (CPU-runnable correctness tier)
- "pallas": Pallas ragged paged attention kernel (TPU hot path)

Caches are the full stacked pool ``[L, S, Hkv, D]`` plus a (possibly traced)
``layer_idx`` so models can ``lax.scan`` over layers: the write is a direct
scatter at (layer_idx, slots) and the read gathers (layer_idx, page slots) —
neither materializes a per-layer copy, which matters because under donation
these are the multi-GB unified-storage buffers.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from semi_pd_tpu.runtime.forward_batch import ForwardArrays

_BACKEND = "reference"


def set_attention_backend(name: str) -> None:
    global _BACKEND
    assert name in ("reference", "pallas"), name
    _BACKEND = name


def get_attention_backend() -> str:
    return _BACKEND


def paged_attention(
    q: jax.Array,  # [T, Hq, D]
    k_new: jax.Array,  # [T, Hkv, D]
    v_new: jax.Array,  # [T, Hkv, Dv]
    k_cache: jax.Array,  # [L, S, Hkv, D] — full pool
    v_cache: jax.Array,  # [L, S, Hkv, Dv]
    layer_idx,  # python int or traced i32 scalar
    fb: ForwardArrays,
    page_size: int,
    scale: float,
    logit_cap: Optional[float] = None,
    sliding_window: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (attn_out [T, Hq, Dv], k_cache', v_cache')."""
    k_cache = k_cache.at[layer_idx, fb.out_slots].set(k_new.astype(k_cache.dtype))
    v_cache = v_cache.at[layer_idx, fb.out_slots].set(v_new.astype(v_cache.dtype))

    if _BACKEND == "pallas":
        from semi_pd_tpu.ops.attention.ragged_paged_attention import (
            ragged_paged_attention,
        )

        out = ragged_paged_attention(
            q, k_cache, v_cache, layer_idx, fb.page_table, fb.q_req_idx,
            fb.q_pos, fb.kv_lens, page_size=page_size, scale=scale,
            logit_cap=logit_cap, sliding_window=sliding_window,
        )
    else:
        from semi_pd_tpu.ops.attention.reference import (
            ragged_paged_attention_reference,
        )

        out = ragged_paged_attention_reference(
            q, k_cache, v_cache, layer_idx, fb.page_table, fb.q_req_idx,
            fb.q_pos, fb.kv_lens, page_size=page_size, scale=scale,
            logit_cap=logit_cap, sliding_window=sliding_window,
        )
    return out, k_cache, v_cache
