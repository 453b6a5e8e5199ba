"""Attention layer: KV-pool write + backend dispatch.

The role of the reference's RadixAttention thin module + AttentionBackend ABC
(srt/layers/radix_attention.py:21-70, attention/base_attn_backend.py:14-108):
every model's attention calls ``paged_attention`` which (1) scatters the
step's fresh K/V into the shared pool at the scheduler-assigned slots and
(2) runs the selected backend over the paged pool. Backends:

- "reference": pure-jnp ragged attention (CPU-runnable correctness tier)
- "pallas": Pallas ragged paged attention kernel (TPU hot path)

The pool is ONE combined buffer ``[L, 2, S, Hkv, D]`` (component axis: K=0,
V=1; see mem/pool.py) passed whole with a (possibly traced) ``layer_idx`` so
models can ``lax.scan`` over layers: the write is a single scatter at
(layer_idx, slots) and reads gather page-contiguously — no per-layer copies
of the multi-GB donated unified-storage buffer.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from semi_pd_tpu.runtime.forward_batch import ForwardArrays

_BACKEND = "reference"

# Speculation-tree context: static per-node ancestor bitmasks (see
# speculative/tree.py). Set at TRACE time around model.forward / draft steps
# inside the fused EAGLE-tree program; baked into the compiled attention as a
# compile-time constant (the tree SHAPE is static, only tokens are data).
_SPEC_TREE = None

class spec_tree_context:
    def __init__(self, anc_bits):
        self.anc = tuple(anc_bits) if anc_bits is not None else None

    def __enter__(self):
        global _SPEC_TREE
        self._saved = _SPEC_TREE
        _SPEC_TREE = self.anc

    def __exit__(self, *exc):
        global _SPEC_TREE
        _SPEC_TREE = self._saved


def set_attention_backend(name: str) -> None:
    global _BACKEND
    assert name in ("reference", "pallas"), name
    _BACKEND = name


def get_attention_backend() -> str:
    return _BACKEND


def paged_attention(
    q: jax.Array,  # [T, Hq, D]
    k_new: jax.Array,  # [T, Hkv, D]
    v_new: jax.Array,  # [T, Hkv, D]
    kv_cache: jax.Array,  # [L, 2, S, Hkv, D] — full combined pool
    layer_idx,  # python int or traced i32 scalar
    fb: ForwardArrays,
    page_size: int,
    scale: float,
    logit_cap: Optional[float] = None,
    sliding_window: Optional[int] = None,
    kv_block: Optional[int] = None,
    alibi_slopes=None,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (attn_out [T, Hq, D], kv_cache'). kv_block tunes the KV
    slots streamed per grid step (DMA granularity / pipeline depth)."""
    # Per-layer fp8-KV scaling factors (fb.kv_scales, loaded from
    # --quantization-param-path; reference model_runner.py:681-688 + models'
    # load_kv_cache_scales). Applied OUTSIDE the kernels by linearity: store
    # k/k_s and v/v_s (so calibrated scales use the fp8 range), read with
    # q*k_s (logits exact: (q*k_s)·(k/k_s) = q·k) and out*v_s.
    v_s = None
    if fb.kv_scales is not None:
        k_s = fb.kv_scales[layer_idx, 0].astype(jnp.float32)
        v_s = fb.kv_scales[layer_idx, 1].astype(jnp.float32)
        k_new = (k_new.astype(jnp.float32) / k_s).astype(k_new.dtype)
        v_new = (v_new.astype(jnp.float32) / v_s).astype(v_new.dtype)
        q = (q.astype(jnp.float32) * k_s).astype(q.dtype)
    if kv_cache.ndim == 4:
        # chunked combined pool [L, S, CT, 128] (KVCache.chunked): one
        # scatter writes K and V chunks of each slot row together
        T, Hkv, D = k_new.shape
        val = jnp.concatenate(
            [k_new.reshape(T, Hkv * D // 128, 128),
             v_new.reshape(T, Hkv * D // 128, 128)], axis=1,
        )
        kv_cache = kv_cache.at[layer_idx, fb.out_slots].set(
            val.astype(kv_cache.dtype)
        )
        if _BACKEND == "pallas":
            from semi_pd_tpu.ops.attention.ragged_paged_attention import (
                ragged_paged_attention_chunked,
            )

            out = ragged_paged_attention_chunked(
                q, kv_cache, layer_idx, fb.page_table, fb.kv_lens,
                fb.attn_meta, page_size=page_size, num_kv_heads=Hkv,
                head_dim=D, scale=scale, logit_cap=logit_cap,
                sliding_window=sliding_window, kv_block=kv_block,
                spec_anc=_SPEC_TREE, win_base=fb.win_base,
            )
        else:
            from semi_pd_tpu.ops.attention.reference import (
                ragged_paged_attention_reference,
            )

            L, S, CT, _ = kv_cache.shape
            kv5 = jnp.swapaxes(
                kv_cache.reshape(L, S, 2, Hkv, D), 1, 2
            )  # [L, 2, S, H, D]
            out = ragged_paged_attention_reference(
                q, kv5, layer_idx, fb.page_table, fb.q_req_idx,
                fb.mask_pos if fb.mask_pos is not None else fb.q_pos,
                fb.kv_lens, page_size=page_size, scale=scale,
                logit_cap=logit_cap, sliding_window=sliding_window,
                spec_anc=_SPEC_TREE, win_base=fb.win_base,
            )
        if v_s is not None:
            out = (out.astype(jnp.float32) * v_s).astype(out.dtype)
        return out, kv_cache

    kv_new = jnp.stack([k_new, v_new], axis=0)  # [2, T, Hkv, D]
    kv_cache = kv_cache.at[layer_idx, :, fb.out_slots].set(
        jnp.swapaxes(kv_new, 0, 1).astype(kv_cache.dtype)
    )

    spec_anc = _SPEC_TREE
    use_pallas = _BACKEND == "pallas" and alibi_slopes is None
    T, Hq, D = q.shape
    Hkv = kv_cache.shape[3]
    if use_pallas and D % 128 != 0 and (Hkv * D == 128 or Hq * D == 128):
        # Sub-lane head dims route through the merged-lane kernel, whose
        # refs are [rows, H*D/128, 128]; a single 128-chunk (Hkv*D == 128,
        # e.g. qwen2-0.5B's 2 kv heads x 64) leaves dim 1 at extent 1,
        # which Mosaic cannot tile (v5e: "slice shape along dimension 1
        # must be aligned to tiling (2)"). These geometries also fail the
        # chunked-pool eligibility (CT % 8, XLA pool tiling), so fall back
        # to the XLA reference attention — correct, and these are sub-1B
        # models where attention is not the serving bottleneck.
        use_pallas = False
    if use_pallas:
        from semi_pd_tpu.ops.attention.ragged_paged_attention import (
            ragged_paged_attention,
        )

        out = ragged_paged_attention(
            q, kv_cache, layer_idx, fb.page_table, fb.kv_lens,
            fb.attn_meta, page_size=page_size, scale=scale,
            logit_cap=logit_cap, sliding_window=sliding_window,
            spec_anc=spec_anc, win_base=fb.win_base, kv_block=kv_block,
        )
    else:
        from semi_pd_tpu.ops.attention.reference import (
            ragged_paged_attention_reference,
        )

        out = ragged_paged_attention_reference(
            q, kv_cache, layer_idx, fb.page_table, fb.q_req_idx,
            fb.mask_pos if fb.mask_pos is not None else fb.q_pos,
            fb.kv_lens, page_size=page_size, scale=scale,
            logit_cap=logit_cap, sliding_window=sliding_window,
            spec_anc=spec_anc, win_base=fb.win_base,
            alibi_slopes=alibi_slopes,
        )
    if v_s is not None:
        out = (out.astype(jnp.float32) * v_s).astype(out.dtype)
    return out, kv_cache


def paged_attention_mla(
    q: jax.Array,  # [T, Hq, Dlat] = [q_absorbed | q_pe]
    latent_new: jax.Array,  # [T, Dlat] = [c_kv | k_pe] for this step's tokens
    kv_cache: jax.Array,  # [L, 1, S, 1, Dlat] latent pool
    layer_idx,
    fb: ForwardArrays,
    page_size: int,
    scale: float,
    v_dim: int,  # = kv_lora_rank; V is the latent prefix of K
) -> Tuple[jax.Array, jax.Array]:
    """MLA (absorbed) attention over the compressed latent pool (reference
    DeepseekV2AttentionMLA.forward_absorb deepseek_v2.py:633 +
    MLATokenToKVPool memory_pool.py:379). Returns ([T, Hq, v_dim], cache')."""
    # The pool's latent dim may be lane-padded to a 128 multiple (576 -> 640
    # for deepseek; Mosaic requires tile-aligned minor dims — see
    # model_runner kv sizing). Pad the step's q/latent to match; padded
    # lanes are zero on both sides so scores are unchanged, and V is the
    # [:v_dim] prefix either way.
    Dpool = kv_cache.shape[-1]
    Dlat = q.shape[-1]
    if Dpool != Dlat:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Dpool - Dlat)))
        latent_new = jnp.pad(latent_new, ((0, 0), (0, Dpool - Dlat)))
    kv_cache = kv_cache.at[layer_idx, 0, fb.out_slots, 0].set(
        latent_new.astype(kv_cache.dtype)
    )
    spec_anc = _SPEC_TREE
    if _BACKEND == "pallas":
        from semi_pd_tpu.ops.attention.ragged_paged_attention import (
            ragged_paged_attention,
        )

        out = ragged_paged_attention(
            q, kv_cache, layer_idx, fb.page_table, fb.kv_lens,
            fb.attn_meta, page_size=page_size, scale=scale, v_dim=v_dim,
            spec_anc=spec_anc, win_base=fb.win_base,
        )
    else:
        from semi_pd_tpu.ops.attention.reference import (
            ragged_paged_attention_reference,
        )

        out = ragged_paged_attention_reference(
            q, kv_cache, layer_idx, fb.page_table, fb.q_req_idx,
            fb.mask_pos if fb.mask_pos is not None else fb.q_pos,
            fb.kv_lens, page_size=page_size, scale=scale,
            v_dim=v_dim, spec_anc=spec_anc, win_base=fb.win_base,
        )
    return out, kv_cache
