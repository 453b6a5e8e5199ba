"""Pallas TPU ragged paged attention (extend + decode).

The hot kernel of the framework — TPU-native replacement for the reference's
flashinfer paged attention wrappers (srt/layers/attention/flashinfer_backend.py)
and its Triton extend/decode kernels (srt/layers/attention/triton_ops/
{extend,decode}_attention.py). One kernel serves both phases over the shared
paged KV pool (unified storage).

Design (flash attention over paged KV, ragged flat query layout):

- Queries stay in the flat ragged layout ``[T, Hq, D]`` (tokens of all
  sequences concatenated — no per-sequence padding, so no [B, maxQ] memory
  blow-up). The host precomputes a **work list** of query blocks: for block
  i, ``block_seq[i]`` = sequence, ``block_row[i]`` = first flat row,
  ``block_qofs[i]`` = offset within that sequence's new tokens (see
  runtime/batch.py make_attn_meta). Padded entries carry seq -1.
- Grid ``(NQB, KB)``: per query block, per KV block. KB is innermost and
  sequentially executed; online-softmax stats live in VMEM scratch across KB
  steps. Inactive (block, kv) cells predicate off.
- KV blocks are gathered page-by-page from the HBM pool ([L, 2, S, Hkv, D],
  K/V on the component axis) with manual async DMA driven by the
  scalar-prefetched page table, double-buffered so block ki+1 streams in
  while ki computes.
- A query block may overrun its sequence's tail into the next sequence's
  rows (reads are masked). The overrun rows of the *output* are clobbered
  with zeros, but grid order is ascending over sequences, so the next
  sequence's own blocks rewrite them — each row's last writer is its own
  block. Output DMA is awaited before the next cell reuses the buffer.
- GQA via dot_general with the kv-head axis as batch dim; fp32 accumulation;
  optional logit softcap (gemma2/grok) and sliding window.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from semi_pd_tpu.ops.attention.rpa_common import (  # noqa: F401 (re-export)
    NEG_INF,
    AttnMeta,
    _kv_block_copies,
    _spec_tree_mask,
    make_attn_meta_host,
    num_q_blocks,
)
from semi_pd_tpu.ops.attention.rpa_packed import (  # noqa: F401 (re-export)
    ragged_paged_attention_chunked_packed,
    ragged_paged_attention_packed,
)

def _rpa_kernel(
    # scalar prefetch
    layer_ref,  # [1]
    num_slots_ref,  # [1] = S (for flat-row offset arithmetic)
    page_table_ref,  # [B, maxP] (SMEM)
    kv_lens_ref,  # [B]
    q_lens_ref,  # [B]
    q_start_ref,  # [B]
    block_seq_ref,  # [NQB]
    block_row_ref,  # [NQB]
    block_qofs_ref,  # [NQB]
    win_base_ref,  # [B] speculation-tree window start (unused unless spec_anc)
    # inputs (ANY/HBM)
    q_hbm,  # [Tpad, Hq, D]
    kv_hbm,  # [L*2*S, Hkv, D] flattened pool; row of (layer, comp, slot) =
             #   (layer*2 + comp)*S + slot. Flat because Mosaic DMA handles
             #   dynamic pl.ds offsets on the major dim but hangs on dynamic
             #   *indexing* of a leading array axis (observed on v5e).
    # outputs
    out_hbm,  # [Tpad, Hq, D]
    # scratch
    q_buf,  # [QBLK, Hq, D]
    k_buf,  # [2, KVBLK, Hkv, D] (slot, ...)
    v_buf,  # [2, KVBLK, Hkv, D]
    o_buf,  # [QBLK, Hq, D]
    m_scr,  # [Hkv, QG] f32  (lane-padded by mosaic)
    l_scr,  # [Hkv, QG] f32
    acc_scr,  # [Hkv, QG, D] f32
    q_sem,
    kv_sems,  # [2, 2] DMA sems (slot, k/v)
    o_sem,
    *,
    page_size: int,
    QBLK: int,
    KVBLK: int,
    scale: float,
    logit_cap: Optional[float],
    sliding_window: Optional[int],
    ncomp: int,
    v_dim: Optional[int],
    spec_anc: Optional[tuple] = None,
):
    i = pl.program_id(0)
    ki = pl.program_id(1)

    ppb = KVBLK // page_size
    layer = layer_ref[0]
    S = num_slots_ref[0]
    k_base = (layer * ncomp + 0) * S
    v_base = (layer * ncomp + 1) * S if ncomp == 2 else k_base
    b = block_seq_ref[i]
    bsafe = jnp.maximum(b, 0)
    row0 = block_row_ref[i]
    qofs = block_qofs_ref[i]
    kv_len = kv_lens_ref[bsafe]
    q_len = q_lens_ref[bsafe]
    q_start = q_start_ref[bsafe]

    n_rows = jnp.minimum(q_len - qofs, QBLK)  # valid q rows in this block
    q_abs_lo = q_start + qofs
    q_abs_hi = q_abs_lo + n_rows - 1
    kv_blk_start = ki * KVBLK

    block_valid = b >= 0
    seq_active = block_valid & (kv_blk_start < kv_len)
    causal_active = kv_blk_start <= q_abs_hi
    first_ki = jnp.zeros((), jnp.int32)
    if sliding_window is not None and sliding_window > 0:
        # A block is active iff it contains a VISIBLE position: its end
        # must exceed first_visible = q_abs_lo - W + 1 (the earliest slot
        # any of this block's rows can see). The previous form compared
        # against first_visible - 1, marking one extra, wholly-invisible
        # leading block active when first_visible landed exactly on a
        # block boundary — that block then waited on a KV DMA that
        # first_ki's init cell never started, deadlocking the device
        # (observed v5e round 4: worker watchdog kill, decode kv2048/W512
        # at KVBLK 512/768).
        causal_active &= (
            (kv_blk_start + KVBLK) > (q_abs_lo - sliding_window + 1)
        )
        first_ki = jnp.maximum(q_abs_lo - sliding_window + 1, 0) // KVBLK
    active = seq_active & causal_active

    last_kv = jnp.minimum(kv_len, q_abs_hi + 1)
    last_ki = jnp.maximum((last_kv + KVBLK - 1) // KVBLK - 1, 0)

    def _dma(slot, block_idx, wait):
        if v_dim is None:
            specs = [(kv_hbm, k_base, k_buf.at[slot], kv_sems.at[slot, 0]),
                     (kv_hbm, v_base, v_buf.at[slot], kv_sems.at[slot, 1])]
            _kv_block_copies(page_table_ref, bsafe, block_idx, ppb,
                             page_size, specs, wait=wait)
        else:
            # MLA latent rows travel in 8-row blocks: the hbm ref is the
            # [rows/8, 8, D] untiled-dim-0 view (see the packed kernel),
            # so offsets/lengths are in 8-row units.
            specs = [(kv_hbm, k_base // 8, k_buf.at[slot],
                      kv_sems.at[slot, 0])]
            _kv_block_copies(page_table_ref, bsafe, block_idx, ppb,
                             page_size // 8, specs, wait=wait)

    def start_kv_dma(slot, block_idx):
        _dma(slot, block_idx, wait=False)

    def wait_kv_dma(slot, block_idx):
        _dma(slot, block_idx, wait=True)

    slot = jax.lax.rem(ki, 2)

    @pl.when(active & (ki == first_ki))
    def _():
        # Fetch this block's q rows and the first KV block.
        pltpu.make_async_copy(
            q_hbm.at[pl.ds(row0, QBLK)], q_buf, q_sem
        ).start()
        start_kv_dma(slot, ki)
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)
        pltpu.make_async_copy(q_hbm.at[pl.ds(row0, QBLK)], q_buf, q_sem).wait()

    @pl.when(active)
    def _():
        @pl.when(ki < last_ki)
        def _():
            start_kv_dma(1 - slot, ki + 1)

        wait_kv_dma(slot, ki)

        QBLK_, Hq, D = q_buf.shape
        if v_dim is None:
            Hkv = k_buf.shape[2]
        else:
            Hkv = 1  # MLA: single latent "head", kv chunked [KVBLK, C, 128]
        G = Hq // Hkv
        QG = QBLK_ * G

        # Dots consume the native (bf16 when serving) dtype with f32
        # accumulation: upcasting the inputs to f32 first would push the
        # matmuls off the MXU's bf16 path (~4-8x the passes) for zero
        # information gain — the pool and q are already bf16 in HBM.
        # Exception: the MLA half-lane layout — bf16 operands there blow up
        # both scoped VMEM (18.3M vs the 16M limit) and runtime (measured
        # 0.74 -> 3.6ms at b64/kv1k on v5e: the [KVBLK, 2, D/2] half slices
        # relayout pathologically in bf16), so it keeps the f32 upcast.
        q = q_buf[...]  # [QBLK, Hq, D]
        if v_dim is None:
            k = k_buf[slot]  # [KVBLK, Hkv, D]
            v = v_buf[slot]
            if k.dtype != q.dtype:  # fp8 KV: dequant-free upcast for the MXU
                k, v = k.astype(q.dtype), v.astype(q.dtype)
        else:
            q = q.astype(jnp.float32)
            # [KVBLK/8, 8, D] 8-row blocks -> [KVBLK, D] latent rows
            k2 = k_buf[slot].reshape(KVBLK, D).astype(jnp.float32)

        # Mask shared by all kv heads: [QG, KVBLK] (q rows replicated per G)
        kv_pos = kv_blk_start + jax.lax.broadcasted_iota(jnp.int32, (QG, KVBLK), 1)
        q_local = jax.lax.broadcasted_iota(jnp.int32, (QG, KVBLK), 0) // G
        q_abs = q_abs_lo + q_local
        valid = (kv_pos <= q_abs) & (kv_pos < kv_len) & (q_local < n_rows)
        if sliding_window is not None and sliding_window > 0:
            valid &= kv_pos > (q_abs - sliding_window)
        if spec_anc is not None:
            valid = _spec_tree_mask(
                valid, spec_anc, win_base_ref[bsafe], q_abs, kv_pos
            )

        # Per-kv-head flash update (unrolled: Mosaic batched matmul needs
        # leading batch dims on both sides, which the KV layout can't give).
        for h in range(Hkv):
            q_h = q[:, h * G : (h + 1) * G, :].reshape(QG, D)
            if v_dim is None:
                s = jax.lax.dot_general(
                    q_h, k[:, h, :],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                # single full-width contraction over the padded latent dim
                # (the 8-row-block view needs no halves; round-5 — the old
                # [rows, 2, D/2] view forced a relayout copy of the pool)
                s = jax.lax.dot_general(
                    q_h, k2,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            s = s * scale  # [QG, KVBLK]
            if logit_cap:
                s = logit_cap * jnp.tanh(s / logit_cap)
            s = jnp.where(valid, s, NEG_INF)

            m_old = m_scr[h, :][:, None]  # [QG, 1]
            l_old = l_scr[h, :][:, None]
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m_old, m_cur)
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m_old - m_new)
            l_new = l_old * corr + jnp.sum(p, axis=1, keepdims=True)
            if v_dim is None:
                pv = jax.lax.dot_general(
                    p.astype(v.dtype), v[:, h, :],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [QG, Dv]
            else:
                # V is the latent prefix of K (v_dim is a lane-tile
                # multiple, so the static slice is Mosaic-legal)
                pv = jax.lax.dot_general(
                    p.astype(k2.dtype), k2[:, 0:v_dim],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            acc_scr[h] = acc_scr[h] * corr + pv
            m_scr[h, :] = m_new[:, 0]
            l_scr[h, :] = l_new[:, 0]

    @pl.when(seq_active & (ki == last_ki))
    def _():
        QBLK_, Hq, D = q_buf.shape
        # MLA k_buf is chunk-shaped [2, KVBLK, C, 128]; its dim 2 is the
        # chunk count, not a head count.
        Hkv = 1 if v_dim is not None else k_buf.shape[2]
        Dv = v_dim if v_dim is not None else D
        G = Hq // Hkv
        l = l_scr[...]  # [Hkv, QG]
        l_safe = jnp.where(l <= 0.0, 1.0, l)
        normed = acc_scr[...] / l_safe[:, :, None]  # [Hkv, QG, Dv]
        out = (
            normed.reshape(Hkv, QBLK_, G, Dv).transpose(1, 0, 2, 3).reshape(QBLK_, Hq, Dv)
        )
        o_buf[...] = out.astype(o_buf.dtype)
        cp = pltpu.make_async_copy(o_buf, out_hbm.at[pl.ds(row0, QBLK_)], o_sem)
        cp.start()
        cp.wait()






def _rpa_kernel_merged(
    # scalar prefetch (same 10 as _rpa_kernel)
    layer_ref, num_slots_ref, page_table_ref, kv_lens_ref, q_lens_ref,
    q_start_ref, block_seq_ref, block_row_ref, block_qofs_ref, win_base_ref,
    # HBM refs — CHUNKED head-dim layouts: q [Tpad, Hq*D/128, 128],
    # kv [L*2*S, Hkv*D/128, 128], out like q. Rank-3 keeps dim 0 untiled
    # (arbitrary dynamic row offsets OK) while the minor dims are exactly
    # one lane tile.
    q_hbm, kv_hbm, out_hbm,
    # scratch
    q_buf, k_buf, v_buf, o_buf, m_scr, l_scr, acc_scr, q_sem, kv_sems, o_sem,
    *, page_size, QBLK, KVBLK, scale, logit_cap, sliding_window, ncomp,
    D, Hq, Hkv, spec_anc=None,
):
    """Variant of _rpa_kernel for head dims that are not lane-tile multiples
    (e.g. D=64). Mosaic rejects dynamically-offset slices of [*, H, D<128]
    refs ("slice shape along dimension 2 must be aligned to tiling") and of
    2D [rows, H*D] refs (sublane rows need 8-aligned offsets), so all HBM
    views are reshaped to [rows, H*D/128, 128]: dim 0 untiled, minor dims one
    full lane tile. Head hq lives at chunk (hq*D)//128, lane offset
    (hq*D)%128 — static slices in VMEM. Per-(kv-head, group) flash updates
    run over QBLK rows instead of the packed QBLK*G rows of the aligned
    kernel. Requires 128 % D == 0."""
    i = pl.program_id(0)
    ki = pl.program_id(1)

    ppb = KVBLK // page_size
    layer = layer_ref[0]
    S = num_slots_ref[0]
    k_base = (layer * ncomp + 0) * S
    v_base = (layer * ncomp + 1) * S
    b = block_seq_ref[i]
    bsafe = jnp.maximum(b, 0)
    row0 = block_row_ref[i]
    qofs = block_qofs_ref[i]
    kv_len = kv_lens_ref[bsafe]
    q_len = q_lens_ref[bsafe]
    q_start = q_start_ref[bsafe]

    n_rows = jnp.minimum(q_len - qofs, QBLK)
    q_abs_lo = q_start + qofs
    q_abs_hi = q_abs_lo + n_rows - 1
    kv_blk_start = ki * KVBLK

    block_valid = b >= 0
    seq_active = block_valid & (kv_blk_start < kv_len)
    causal_active = kv_blk_start <= q_abs_hi
    first_ki = jnp.zeros((), jnp.int32)
    if sliding_window is not None and sliding_window > 0:
        # A block is active iff it contains a VISIBLE position: its end
        # must exceed first_visible = q_abs_lo - W + 1 (the earliest slot
        # any of this block's rows can see). The previous form compared
        # against first_visible - 1, marking one extra, wholly-invisible
        # leading block active when first_visible landed exactly on a
        # block boundary — that block then waited on a KV DMA that
        # first_ki's init cell never started, deadlocking the device
        # (observed v5e round 4: worker watchdog kill, decode kv2048/W512
        # at KVBLK 512/768).
        causal_active &= (
            (kv_blk_start + KVBLK) > (q_abs_lo - sliding_window + 1)
        )
        first_ki = jnp.maximum(q_abs_lo - sliding_window + 1, 0) // KVBLK
    active = seq_active & causal_active

    last_kv = jnp.minimum(kv_len, q_abs_hi + 1)
    last_ki = jnp.maximum((last_kv + KVBLK - 1) // KVBLK - 1, 0)

    def _dma_specs(slot):
        return [
            (kv_hbm, k_base, k_buf.at[slot], kv_sems.at[slot, 0]),
            (kv_hbm, v_base, v_buf.at[slot], kv_sems.at[slot, 1]),
        ]

    def start_kv_dma(slot, block_idx):
        _kv_block_copies(page_table_ref, bsafe, block_idx, ppb, page_size,
                         _dma_specs(slot), wait=False)

    def wait_kv_dma(slot, block_idx):
        _kv_block_copies(page_table_ref, bsafe, block_idx, ppb, page_size,
                         _dma_specs(slot), wait=True)

    slot = jax.lax.rem(ki, 2)

    @pl.when(active & (ki == first_ki))
    def _():
        pltpu.make_async_copy(q_hbm.at[pl.ds(row0, QBLK)], q_buf, q_sem).start()
        start_kv_dma(slot, ki)
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)
        pltpu.make_async_copy(q_hbm.at[pl.ds(row0, QBLK)], q_buf, q_sem).wait()

    @pl.when(active)
    def _():
        @pl.when(ki < last_ki)
        def _():
            start_kv_dma(1 - slot, ki + 1)

        wait_kv_dma(slot, ki)

        G = Hq // Hkv
        # This variant keeps the f32 upcast: bf16 operands here trigger a
        # Mosaic compile-time blow-up on v5e (>9min vs ~40s, measured) —
        # the per-(head, group) unrolled loop over lane-offset slices
        # relayouts pathologically in bf16. The serving path for D<128 is
        # the chunked-pool kernel (which does run bf16 dots); this one is
        # the compatibility path for non-chunked [L, 2, S, H, D<128] pools.
        q = q_buf[...].astype(jnp.float32)  # [QBLK, Hq*D/128, 128]
        k = k_buf[slot].astype(jnp.float32)  # [KVBLK, Hkv*D/128, 128]
        v = v_buf[slot].astype(jnp.float32)

        def head(x, h):  # static chunk/lane slice -> [rows, D]
            c, o = (h * D) // 128, (h * D) % 128
            return x[:, c, o : o + D]

        kv_pos = kv_blk_start + jax.lax.broadcasted_iota(jnp.int32, (QBLK, KVBLK), 1)
        q_local = jax.lax.broadcasted_iota(jnp.int32, (QBLK, KVBLK), 0)
        q_abs = q_abs_lo + q_local
        valid = (kv_pos <= q_abs) & (kv_pos < kv_len) & (q_local < n_rows)
        if sliding_window is not None and sliding_window > 0:
            valid &= kv_pos > (q_abs - sliding_window)
        if spec_anc is not None:
            valid = _spec_tree_mask(
                valid, spec_anc, win_base_ref[bsafe], q_abs, kv_pos
            )

        for h in range(Hkv):
            k_h = head(k, h)  # [KVBLK, D]
            v_h = head(v, h)
            for g in range(G):
                hq = h * G + g
                q_h = head(q, hq)  # [QBLK, D]
                s = jax.lax.dot_general(
                    q_h, k_h,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale  # [QBLK, KVBLK]
                if logit_cap:
                    s = logit_cap * jnp.tanh(s / logit_cap)
                s = jnp.where(valid, s, NEG_INF)

                m_old = m_scr[hq, :][:, None]
                l_old = l_scr[hq, :][:, None]
                m_cur = jnp.max(s, axis=1, keepdims=True)
                m_new = jnp.maximum(m_old, m_cur)
                p_ = jnp.exp(s - m_new)
                corr = jnp.exp(m_old - m_new)
                l_new = l_old * corr + jnp.sum(p_, axis=1, keepdims=True)
                pv = jax.lax.dot_general(
                    p_.astype(v_h.dtype), v_h,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [QBLK, D]
                # acc scratch is [QBLK, Hq, 128]: heads on the MID dim and a
                # lane-padded minor — Mosaic supports mid-index + lane-slice
                # ref access but not leading-index + lane-slice.
                acc_scr[:, hq, 0:D] = acc_scr[:, hq, 0:D] * corr + pv
                m_scr[hq, :] = m_new[:, 0]
                l_scr[hq, :] = l_new[:, 0]

    @pl.when(seq_active & (ki == last_ki))
    def _():
        l = l_scr[...]  # [Hq, QBLK]
        l_safe = jnp.where(l <= 0.0, 1.0, l)
        for hq in range(Hq):
            c, o = (hq * D) // 128, (hq * D) % 128
            o_buf[:, c, o : o + D] = (
                acc_scr[:, hq, 0:D] / l_safe[hq][:, None]
            ).astype(o_buf.dtype)
        cp = pltpu.make_async_copy(o_buf, out_hbm.at[pl.ds(row0, QBLK)], o_sem)
        cp.start()
        cp.wait()


def ragged_paged_attention(
    q: jax.Array,  # [T, Hq, D] flat ragged
    kv_cache: jax.Array,  # [L, 2, S, Hkv, D] combined pool
    layer_idx,  # scalar i32 (traced ok)
    page_table: jax.Array,  # [B, maxP]
    kv_lens: jax.Array,  # [B]
    meta: AttnMeta,
    *,
    page_size: int,
    scale: float,
    logit_cap: Optional[float] = None,
    sliding_window: Optional[int] = None,
    v_dim: Optional[int] = None,
    q_block: Optional[int] = None,
    kv_block: Optional[int] = None,
    interpret: bool = False,
    force_merged: bool = False,
    spec_anc: Optional[tuple] = None,
    win_base: Optional[jax.Array] = None,
) -> jax.Array:
    T, Hq, D = q.shape
    B, maxP = page_table.shape
    L, ncomp, S, Hkv, _ = kv_cache.shape
    Dv = v_dim if v_dim is not None else D
    max_kv = maxP * page_size
    if spec_anc is not None:
        assert win_base is not None, "spec_anc requires win_base"

    is_decode = T == B
    # Decode default is 16, not 8: the (QBLK=8, KVBLK=256) instantiation
    # tickles a Mosaic compile-time blow-up on v5e (155s vs 2s; measured
    # round 2) and padding decode rows 8->16 is free (KV reads dominate).
    # MLA extend uses 64: at QBLK=128 the f32 accumulator alone is
    # [1, QBLK*Hq, v_dim] = 4MB and a deepseek-lite-geometry prefill
    # overflowed the 16MB scoped VMEM on v5e (16.77M, round-4 smoke).
    QBLK = q_block or (
        16 if is_decode else (64 if v_dim is not None else 128))
    QBLK = min(QBLK, max(16, T))

    # Decode is per-page-DMA bound: larger KV blocks amortize grid-step
    # overhead and keep more page DMAs in flight (measured v5e, B=64 kv=1k:
    # 256 -> 68 GB/s, 1024 -> 186 GB/s; BENCH_KERNELS.json). Clamp so the
    # double-buffered KV scratch stays within ~6MB of the 16MB scoped VMEM:
    # the flash loop's k/v VALUE temporaries cost another ~KVBLK row each,
    # and 8MB of scratch OOM'd the v5e compiler at D=128 Hkv=8 (17.3M scoped;
    # kvb=2048 at CT=8 likewise).
    # extend kv_block 512 (was 256): the extend kernel is grid-cell-
    # overhead-bound (~17us/cell fixed cost measured round-5: MXU util
    # 7.4% at kvb256); halving the cell count measured 2.215 -> 1.396 ms
    # (+58%) at the flagship extend shape. kvb1024 extend overflows
    # scoped VMEM (f32 accumulator is QBLK x Hq x 128).
    kv_block = kv_block or (1024 if is_decode else 512)
    row_bytes = 2 * Hkv * D * jnp.dtype(kv_cache.dtype).itemsize  # K+V row
    # MLA keeps f32 compute (see kernel) whose temporaries fit the round-2
    # budget; row_bytes already double-counts its single component (ncomp=1),
    # so 8MB yields the measured-good KVBLK=1024.
    budget = (8 << 20) if v_dim is not None else (6 << 20)
    vmem_rows = budget // (2 * max(row_bytes, 1))  # 2 pipeline slots
    kv_block = min(kv_block, max(page_size, vmem_rows // page_size * page_size))
    KVBLK = min(kv_block, max(page_size, max_kv))
    if KVBLK % page_size:
        raise ValueError("kv_block must be a multiple of page_size")
    if max_kv % KVBLK:
        padP = (KVBLK - max_kv % KVBLK) // page_size
        page_table = jnp.pad(page_table, ((0, 0), (0, padP)))
        maxP += padP
        max_kv += padP * page_size
    KB = max_kv // KVBLK
    ppb = KVBLK // page_size

    NQB = meta.block_seq.shape[0]
    G = Hq // Hkv
    QG = QBLK * G

    # Mosaic rejects dynamically-offset slices of refs whose minor dim is
    # not a lane-tile multiple; route D % 128 != 0 through the merged-lane
    # kernel (heads folded into the lane dim). Interpret mode (CPU tests)
    # has no such constraint — only rerouted when forced.
    if force_merged or (D % 128 != 0 and v_dim is None and not interpret):
        if 128 % D or (Hkv * D) % 128 or (Hq * D) % 128:
            raise ValueError(
                f"head layout Hq={Hq} Hkv={Hkv} D={D} not expressible on "
                "TPU lanes; use the reference attention backend"
            )
        return _ragged_paged_attention_merged(
            q, kv_cache, layer_idx, page_table, kv_lens, meta,
            page_size=page_size, scale=scale, logit_cap=logit_cap,
            sliding_window=sliding_window, q_block=QBLK, kv_block=kv_block,
            interpret=interpret, spec_anc=spec_anc, win_base=win_base,
        )

    # Multi-request packed decode (the measured-best schedule; see
    # _rpa_kernel_chunked_packed rationale + BENCH_PACKED3_r4.json:
    # aligned 48.5%/41.1% of roofline, MLA 53.9% at b16/kv4k — 2.51x the
    # blocked kernel). Same eligibility as the chunked router.
    if (is_decode and spec_anc is None
            and not os.environ.get("RPA_DECODE_STREAM", "0") == "1"
            and os.environ.get("RPA_DECODE_PACKED", "1") == "1"):
        return ragged_paged_attention_packed(
            q, kv_cache, layer_idx, page_table, kv_lens,
            page_size=page_size, scale=scale, logit_cap=logit_cap,
            sliding_window=sliding_window, v_dim=v_dim,
            rpb=4 if B >= 32 else 2, kv_block=kv_block,
            interpret=interpret,
        )

    # q rows DMA may overrun by QBLK-1 rows: pad the flat token dim.
    q_in = jnp.pad(q, ((0, QBLK), (0, 0), (0, 0)))
    Tpad = q_in.shape[0]

    layer_arr_s = jnp.reshape(jnp.asarray(layer_idx, jnp.int32), (1,))
    if v_dim is None:
        kv_flat_s = kv_cache.reshape(L * ncomp * S, Hkv, kv_cache.shape[-1])
    else:
        kv_flat_s = kv_cache.reshape(L * ncomp * S, 2, kv_cache.shape[-1] // 2)
    stream = (
        is_decode
        and sliding_window is None
        and spec_anc is None
        and os.environ.get("RPA_DECODE_STREAM", "0") == "1"
    )
    if stream:
        # Experimental negative-result schedule, quarantined in rpa_stream
        from semi_pd_tpu.ops.attention.rpa_stream import (
            dispatch_stream_aligned,
        )

        return dispatch_stream_aligned(
            q_in, kv_flat_s, T, Tpad, layer_arr_s, S, page_table, kv_lens,
            meta, win_base, kv_dtype=kv_cache.dtype, QBLK=QBLK, KVBLK=KVBLK,
            NQB=NQB, Hq=Hq, Hkv=Hkv, D=D, Dv=Dv, QG=QG, page_size=page_size,
            scale=scale, logit_cap=logit_cap, ncomp=ncomp, v_dim=v_dim,
            interpret=interpret,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=10,
        grid=(NQB, KB),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # q
            pl.BlockSpec(memory_space=pl.ANY),  # kv_cache
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((QBLK, Hq, D), q.dtype),
            pltpu.VMEM(
                (2, KVBLK, Hkv, D) if v_dim is None
                else (2, KVBLK // 8, 8, D),
                kv_cache.dtype,
            ),
            pltpu.VMEM(
                (2, KVBLK, Hkv, D) if v_dim is None else (1, 8, 128),
                kv_cache.dtype,
            ),
            pltpu.VMEM((QBLK, Hq, Dv), q.dtype),
            pltpu.VMEM((Hkv, QG), jnp.float32),
            pltpu.VMEM((Hkv, QG), jnp.float32),
            pltpu.VMEM((Hkv, QG, Dv), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    if v_dim is not None:
        if v_dim % 128 or D % 256:
            raise ValueError(
                f"MLA latent pool dim must be a multiple of 256 with "
                f"v_dim a multiple of 128 (got D={D}, v_dim={v_dim}); "
                "pad the pool"
            )
        assert S % 8 == 0 and page_size % 8 == 0, (
            "MLA kernel needs 8-divisible page_size/slot count")

    kernel = functools.partial(
        _rpa_kernel,
        page_size=page_size,
        QBLK=QBLK,
        KVBLK=KVBLK,
        scale=scale,
        logit_cap=logit_cap,
        sliding_window=sliding_window,
        ncomp=ncomp,
        v_dim=v_dim,
        spec_anc=spec_anc,
    )

    layer_arr = jnp.reshape(jnp.asarray(layer_idx, jnp.int32), (1,))
    if v_dim is None:
        kv_flat = kv_cache.reshape(L * ncomp * S, Hkv, kv_cache.shape[-1])
    else:
        # MLA: 8-row-blocked latent view [rows/8, 8, Dlat] — a FREE bitcast
        # with dim 0 untiled (see rpa_packed.py; the old [rows, 2, Dlat/2]
        # halves view forced a relayout copy of the entire pool per call)
        kv_flat = kv_cache.reshape(
            (L * ncomp * S) // 8, 8, kv_cache.shape[-1])

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Tpad, Hq, Dv), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        layer_arr,
        jnp.asarray([S], jnp.int32),
        page_table,
        kv_lens,
        meta.q_lens,
        meta.q_start,
        meta.block_seq,
        meta.block_row,
        meta.block_qofs,
        win_base if win_base is not None else jnp.zeros_like(kv_lens),
        q_in,
        kv_flat,
    )
    return out[:T]


def _ragged_paged_attention_merged(
    q, kv_cache, layer_idx, page_table, kv_lens, meta, *,
    page_size, scale, logit_cap=None, sliding_window=None,
    q_block=None, kv_block=256, interpret=False,
    spec_anc=None, win_base=None,
):
    """Merged-lane driver (see _rpa_kernel_merged): q/kv/out reshaped to
    [rows, H*D/128, 128] outside the kernel (free bitcasts)."""
    T, Hq, D = q.shape
    B, maxP = page_table.shape
    L, ncomp, S, Hkv, _ = kv_cache.shape
    assert ncomp == 2
    max_kv = maxP * page_size

    is_decode = T == B
    # Decode default is 16, not 8: the (QBLK=8, KVBLK=256) instantiation
    # tickles a Mosaic compile-time blow-up on v5e (155s vs 2s; measured
    # round 2) and padding decode rows 8->16 is free (KV reads dominate).
    QBLK = q_block or (16 if is_decode else 128)
    QBLK = min(QBLK, max(16, T))

    # extend kv_block 512 (was 256): the extend kernel is grid-cell-
    # overhead-bound (~17us/cell fixed cost measured round-5: MXU util
    # 7.4% at kvb256); halving the cell count measured 2.215 -> 1.396 ms
    # (+58%) at the flagship extend shape. kvb1024 extend overflows
    # scoped VMEM (f32 accumulator is QBLK x Hq x 128).
    kv_block = kv_block or (1024 if is_decode else 512)
    KVBLK = min(kv_block, max(page_size, max_kv))
    if KVBLK % page_size:
        raise ValueError("kv_block must be a multiple of page_size")
    if max_kv % KVBLK:
        padP = (KVBLK - max_kv % KVBLK) // page_size
        page_table = jnp.pad(page_table, ((0, 0), (0, padP)))
        maxP += padP
        max_kv += padP * page_size
    KB = max_kv // KVBLK
    NQB = meta.block_seq.shape[0]

    CQ = Hq * D // 128
    CK = Hkv * D // 128
    q_in = jnp.pad(q.reshape(T, CQ, 128), ((0, QBLK), (0, 0), (0, 0)))
    Tpad = q_in.shape[0]
    kv_flat = kv_cache.reshape(L * ncomp * S, CK, 128)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=10,
        grid=(NQB, KB),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((QBLK, CQ, 128), q.dtype),
            pltpu.VMEM((2, KVBLK, CK, 128), kv_cache.dtype),
            pltpu.VMEM((2, KVBLK, CK, 128), kv_cache.dtype),
            pltpu.VMEM((QBLK, CQ, 128), q.dtype),
            pltpu.VMEM((Hq, QBLK), jnp.float32),
            pltpu.VMEM((Hq, QBLK), jnp.float32),
            pltpu.VMEM((QBLK, Hq, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    kernel = functools.partial(
        _rpa_kernel_merged,
        page_size=page_size,
        QBLK=QBLK,
        KVBLK=KVBLK,
        scale=scale,
        logit_cap=logit_cap,
        sliding_window=sliding_window,
        ncomp=ncomp,
        D=D,
        Hq=Hq,
        Hkv=Hkv,
        spec_anc=spec_anc,
    )

    layer_arr = jnp.reshape(jnp.asarray(layer_idx, jnp.int32), (1,))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Tpad, CQ, 128), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        layer_arr,
        jnp.asarray([S], jnp.int32),
        page_table,
        kv_lens,
        meta.q_lens,
        meta.q_start,
        meta.block_seq,
        meta.block_row,
        meta.block_qofs,
        win_base if win_base is not None else jnp.zeros_like(kv_lens),
        q_in,
        kv_flat,
    )
    return out[:T].reshape(T, Hq, D)


def _rpa_kernel_chunked(
    # scalar prefetch (the 10 of _rpa_kernel + host-precomputed per-block
    # contiguity: block_first[b, ki] = first page if the block's pages are
    # consecutive, else -1)
    layer_ref, num_slots_ref, page_table_ref, kv_lens_ref, q_lens_ref,
    q_start_ref, block_seq_ref, block_row_ref, block_qofs_ref, win_base_ref,
    block_first_ref,
    # HBM refs: q [Tpad, Hq*D/128, 128]; kv [L*S, CT, 128] with K chunks in
    # [0, Hkv*D/128) and V chunks in [Hkv*D/128, CT); out like q
    q_hbm, kv_hbm, out_hbm,
    # scratch
    q_buf, kv_buf, o_buf, m_scr, l_scr, acc_scr, qp_scr, q_sem, kv_sem,
    o_sem,
    *, page_size, QBLK, KVBLK, scale, logit_cap, sliding_window,
    D, Hq, Hkv, spec_anc=None,
):
    """Combined-KV variant of _rpa_kernel_merged for the chunked pool layout
    [L, S, CT, 128] (mem/pool.py): K and V of a slot share one row, so each
    page needs ONE DMA instead of two, and the pool reshape feeding the
    kernel is a pure bitcast (no relayout copy of the multi-GB pool, which
    the [L, 2, S, H, D<128] layout forced — it OOMed and would have cost a
    full pool copy per layer)."""
    i = pl.program_id(0)
    ki = pl.program_id(1)

    ppb = KVBLK // page_size
    layer = layer_ref[0]
    S = num_slots_ref[0]
    row_base = layer * S
    b = block_seq_ref[i]
    bsafe = jnp.maximum(b, 0)
    row0 = block_row_ref[i]
    qofs = block_qofs_ref[i]
    kv_len = kv_lens_ref[bsafe]
    q_len = q_lens_ref[bsafe]
    q_start = q_start_ref[bsafe]

    n_rows = jnp.minimum(q_len - qofs, QBLK)
    q_abs_lo = q_start + qofs
    q_abs_hi = q_abs_lo + n_rows - 1
    kv_blk_start = ki * KVBLK

    block_valid = b >= 0
    seq_active = block_valid & (kv_blk_start < kv_len)
    causal_active = kv_blk_start <= q_abs_hi
    first_ki = jnp.zeros((), jnp.int32)
    if sliding_window is not None and sliding_window > 0:
        # A block is active iff it contains a VISIBLE position: its end
        # must exceed first_visible = q_abs_lo - W + 1 (the earliest slot
        # any of this block's rows can see). The previous form compared
        # against first_visible - 1, marking one extra, wholly-invisible
        # leading block active when first_visible landed exactly on a
        # block boundary — that block then waited on a KV DMA that
        # first_ki's init cell never started, deadlocking the device
        # (observed v5e round 4: worker watchdog kill, decode kv2048/W512
        # at KVBLK 512/768).
        causal_active &= (
            (kv_blk_start + KVBLK) > (q_abs_lo - sliding_window + 1)
        )
        first_ki = jnp.maximum(q_abs_lo - sliding_window + 1, 0) // KVBLK
    active = seq_active & causal_active

    last_kv = jnp.minimum(kv_len, q_abs_hi + 1)
    last_ki = jnp.maximum((last_kv + KVBLK - 1) // KVBLK - 1, 0)

    def start_kv_dma(slot, block_idx):
        _kv_block_copies(
            page_table_ref, bsafe, block_idx, ppb, page_size,
            [(kv_hbm, row_base, kv_buf.at[slot], kv_sem.at[slot])],
            wait=False, block_first_ref=block_first_ref)

    def wait_kv_dma(slot, block_idx):
        _kv_block_copies(
            page_table_ref, bsafe, block_idx, ppb, page_size,
            [(kv_hbm, row_base, kv_buf.at[slot], kv_sem.at[slot])],
            wait=True, block_first_ref=block_first_ref)

    slot = jax.lax.rem(ki, 2)

    G = Hq // Hkv
    QG = QBLK * G
    # Pack the G query groups of each kv head into one tall dot ONLY for
    # small q blocks (decode): there the valid-row density is ~1/QBLK and
    # op-issue count, not FLOPs, bounds throughput. For extend blocks
    # (QBLK=128, all rows valid) the per-(h,g) dots are already MXU-sized
    # and the staging pass only adds overhead (measured +28% extend time).
    pack = G > 1 and QBLK <= 32

    @pl.when(active & (ki == first_ki))
    def _():
        pltpu.make_async_copy(q_hbm.at[pl.ds(row0, QBLK)], q_buf, q_sem).start()
        start_kv_dma(slot, ki)
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)
        pltpu.make_async_copy(q_hbm.at[pl.ds(row0, QBLK)], q_buf, q_sem).wait()
        if pack:
            # Stage q in packed per-kv-head layout [Hkv, QG, D] (g-major
            # rows) once per q block. The scratch round-trip normalizes the
            # lane offsets of the D<128 head slices — Mosaic cannot
            # concatenate vectors whose lane offsets differ (observed:
            # "result/input offset mismatch on non-concat dimension").
            qf = q_buf[...]  # native dtype: bf16 dots, f32 accumulation
            for h in range(Hkv):
                for g in range(G):
                    hq = h * G + g
                    c, o = (hq * D) // 128, (hq * D) % 128
                    qp_scr[h, g * QBLK : (g + 1) * QBLK, 0:D] = (
                        qf[:, c, o : o + D]
                    )

    @pl.when(active)
    def _():
        @pl.when(ki < last_ki)
        def _():
            start_kv_dma(1 - slot, ki + 1)

        wait_kv_dma(slot, ki)

        VB = (Hkv * D) // 128  # first V chunk
        q = q_buf[...]  # [QBLK, Hq*D/128, 128] native dtype (bf16 dots)
        kv = kv_buf[slot]  # [KVBLK, CT, 128]
        if kv.dtype != q.dtype:  # fp8 KV
            kv = kv.astype(q.dtype)

        def head(x, h, base=0):
            c, o = base + (h * D) // 128, (h * D) % 128
            return x[:, c, o : o + D]

        kv_pos = kv_blk_start + jax.lax.broadcasted_iota(jnp.int32, (QBLK, KVBLK), 1)
        q_local = jax.lax.broadcasted_iota(jnp.int32, (QBLK, KVBLK), 0)
        q_abs = q_abs_lo + q_local
        valid = (kv_pos <= q_abs) & (kv_pos < kv_len) & (q_local < n_rows)
        if sliding_window is not None and sliding_window > 0:
            valid &= kv_pos > (q_abs - sliding_window)
        if spec_anc is not None:
            valid = _spec_tree_mask(
                valid, spec_anc, win_base_ref[bsafe], q_abs, kv_pos
            )
        if pack:  # all groups of a kv head share the mask (same q rows)
            valid = jnp.concatenate([valid] * G, axis=0)  # [QG, KVBLK]

        # Packed path: one dot pair per KV HEAD, not per (head, group): the
        # G query groups are stacked on the row axis ([QG, D], g-major) so
        # the MXU sees G× taller matmuls and the VPU softmax runs once per
        # head. For decode (1 valid row in QBLK=16) this cuts the number of
        # issued ops ~G×, which — not DMA — bounds decode throughput
        # (measured: shuffled vs contiguous page tables differ <10%;
        # packing: 20.1% -> 35.0% of HBM roofline at b16/kv8k).
        for h in range(Hkv if pack else Hq):
            if pack:
                k_h = head(kv, h)           # [KVBLK, D]
                v_h = head(kv, h, base=VB)
                q_h = qp_scr[h, :, 0:D]     # [QG, D] staged g-major
            else:
                k_h = head(kv, h // G)
                v_h = head(kv, h // G, base=VB)
                q_h = head(q, h)            # [QBLK, D]
            s = jax.lax.dot_general(
                q_h, k_h,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [QG or QBLK, KVBLK]
            if logit_cap:
                s = logit_cap * jnp.tanh(s / logit_cap)
            s = jnp.where(valid, s, NEG_INF)

            # Packed: m/l scratch is [Hkv, QG] in the same g-major row order
            # (Mosaic rejects the (G, QBLK) <-> (QG, 1) shape casts a
            # [Hq, QBLK] layout would need here). Unpacked: [Hq, QBLK].
            m_old = m_scr[h, :][:, None]
            l_old = l_scr[h, :][:, None]
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m_old, m_cur)
            p_ = jnp.exp(s - m_new)
            corr = jnp.exp(m_old - m_new)
            l_new = l_old * corr + jnp.sum(p_, axis=1, keepdims=True)
            pv = jax.lax.dot_general(
                p_.astype(v_h.dtype), v_h,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [QG or QBLK, D]
            if pack:
                for g in range(G):
                    hq = h * G + g
                    sl = slice(g * QBLK, (g + 1) * QBLK)
                    acc_scr[:, hq, 0:D] = (
                        acc_scr[:, hq, 0:D] * corr[sl] + pv[sl]
                    )
            else:
                acc_scr[:, h, 0:D] = acc_scr[:, h, 0:D] * corr + pv
            m_scr[h, :] = m_new[:, 0]
            l_scr[h, :] = l_new[:, 0]

    @pl.when(seq_active & (ki == last_ki))
    def _():
        l = l_scr[...]  # packed: [Hkv, QG] g-major; unpacked: [Hq, QBLK]
        l_safe = jnp.where(l <= 0.0, 1.0, l)
        for hq in range(Hq):
            c, o = (hq * D) // 128, (hq * D) % 128
            if pack:
                h, g = hq // G, hq % G
                l_hq = l_safe[h, g * QBLK : (g + 1) * QBLK]
            else:
                l_hq = l_safe[hq]
            o_buf[:, c, o : o + D] = (
                acc_scr[:, hq, 0:D] / l_hq[:, None]
            ).astype(o_buf.dtype)
        cp = pltpu.make_async_copy(o_buf, out_hbm.at[pl.ds(row0, QBLK)], o_sem)
        cp.start()
        cp.wait()




def ragged_paged_attention_chunked(
    q,  # [T, Hq, D]
    kv_cache,  # [L, S, CT, 128] chunked combined pool
    layer_idx,
    page_table,
    kv_lens,
    meta,
    *,
    page_size,
    num_kv_heads,
    head_dim,
    scale,
    logit_cap=None,
    sliding_window=None,
    q_block=None,
    kv_block: Optional[int] = None,
    interpret: bool = False,
    stream: Optional[bool] = None,
    spec_anc=None,
    win_base=None,
    force_blocked: bool = False,
):
    """Driver for the chunked combined-KV pool layout (see KVCache).

    ``stream`` routes decode through the cross-request streaming kernel
    (_rpa_kernel_chunked_stream). Default: RPA_DECODE_STREAM env (opt-in
    until validated on hardware).

    ``spec_anc`` + ``win_base`` enable the speculation-tree ancestor mask
    (_spec_tree_mask) so tree-verify batches stay on the Pallas kernel for
    chunked pools too (the stream kernel has no tree hook — blocked path
    is forced)."""
    T, Hq, D = q.shape
    assert D == head_dim and 128 % D == 0 and (Hq * D) % 128 == 0
    B, maxP = page_table.shape
    L, S, CT, _ = kv_cache.shape
    Hkv = num_kv_heads
    max_kv = maxP * page_size

    is_decode = T == B
    # Decode default is 16, not 8: the (QBLK=8, KVBLK=256) instantiation
    # tickles a Mosaic compile-time blow-up on v5e (155s vs 2s; measured
    # round 2) and padding decode rows 8->16 is free (KV reads dominate).
    QBLK = q_block or (16 if is_decode else 128)
    QBLK = min(QBLK, max(16, T))

    # extend kv_block 512 (was 256): the extend kernel is grid-cell-
    # overhead-bound (~17us/cell fixed cost measured round-5: MXU util
    # 7.4% at kvb256); halving the cell count measured 2.215 -> 1.396 ms
    # (+58%) at the flagship extend shape. kvb1024 extend overflows
    # scoped VMEM (f32 accumulator is QBLK x Hq x 128).
    kv_block = kv_block or (1024 if is_decode else 512)
    KVBLK = min(kv_block, max(page_size, max_kv))
    if KVBLK % page_size:
        raise ValueError("kv_block must be a multiple of page_size")
    if max_kv % KVBLK:
        padP = (KVBLK - max_kv % KVBLK) // page_size
        page_table = jnp.pad(page_table, ((0, 0), (0, padP)))
        maxP += padP
        max_kv += padP * page_size
    KB = max_kv // KVBLK
    NQB = meta.block_seq.shape[0]

    CQ = Hq * D // 128
    q_in = jnp.pad(q.reshape(T, CQ, 128), ((0, QBLK), (0, 0), (0, 0)))
    Tpad = q_in.shape[0]
    kv_flat = kv_cache.reshape(L * S, CT, 128)  # pure bitcast

    if stream is None:
        stream = (
            is_decode
            and sliding_window is None
            and os.environ.get("RPA_DECODE_STREAM", "0") == "1"
        )
    if spec_anc is not None:
        stream = False
    # Multi-request packed decode cells: the measured-best decode schedule
    # (v5e: 46.2%% of HBM roofline at b16/kv8k vs 31.5%% blocked, 1.95x at
    # b64/kv1k — BENCH_PACKED_r4.json). Same streamed bytes per cell, but
    # the per-head score tile shrinks from [QBLK*G, KVBLK] to [rpb*G,
    # KVBLK] so the VPU cost per KV byte drops. rpb: 4 for b>=32 (deeper
    # sections win), else 2 (measured crossover).
    if (is_decode and spec_anc is None
            and not stream and not force_blocked
            and os.environ.get("RPA_DECODE_PACKED", "1") == "1"):
        return ragged_paged_attention_chunked_packed(
            q, kv_cache, layer_idx, page_table, kv_lens,
            page_size=page_size, num_kv_heads=Hkv, head_dim=D, scale=scale,
            logit_cap=logit_cap, sliding_window=sliding_window,
            rpb=4 if B >= 32 else 2,
            kv_block=kv_block, interpret=interpret,
        )
    if stream and sliding_window is None:
        # Experimental negative-result schedule, quarantined in rpa_stream
        from semi_pd_tpu.ops.attention.rpa_stream import (
            dispatch_stream_chunked,
        )

        return dispatch_stream_chunked(
            q_in, kv_flat, T, Tpad, layer_idx, S, page_table, kv_lens, meta,
            kv_dtype=kv_cache.dtype, QBLK=QBLK, KVBLK=KVBLK, NQB=NQB, CQ=CQ,
            CT=CT, Hq=Hq, Hkv=Hkv, D=D, page_size=page_size, scale=scale,
            logit_cap=logit_cap, interpret=interpret,
        )

    # Host-side per-block contiguity (one fused XLA op): first page of
    # block (b, ki) when its ppb pages are consecutive, else -1. Replaces
    # ppb scalar page-table reads + compares per grid cell (~32 at
    # kv_block 512 / page 16 — a real share of the extend kernel's fixed
    # per-cell cost).
    ppb_h = KVBLK // page_size
    if ppb_h > 1:
        pt_r = page_table[:, : KB * ppb_h].reshape(B, KB, ppb_h)
        contig_h = jnp.all(pt_r[:, :, 1:] == pt_r[:, :, :-1] + 1, axis=2)
        block_first = jnp.where(contig_h, pt_r[:, :, 0], -1).astype(jnp.int32)
    else:
        block_first = page_table[:, :KB].astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=11,
        grid=(NQB, KB),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((QBLK, CQ, 128), q.dtype),
            pltpu.VMEM((2, KVBLK, CT, 128), kv_cache.dtype),
            pltpu.VMEM((QBLK, CQ, 128), q.dtype),
            # m/l: packed [Hkv, QBLK*G] (one flash update per KV head over
            # the stacked query groups) for decode-sized blocks, else
            # [Hq, QBLK]; must mirror the kernel's `pack` predicate
            pltpu.VMEM((Hkv, QBLK * (Hq // Hkv)) if
                       (Hq > Hkv and QBLK <= 32) else (Hq, QBLK),
                       jnp.float32),
            pltpu.VMEM((Hkv, QBLK * (Hq // Hkv)) if
                       (Hq > Hkv and QBLK <= 32) else (Hq, QBLK),
                       jnp.float32),
            pltpu.VMEM((QBLK, Hq, 128), jnp.float32),
            # staged packed q [Hkv, QG, D] (lane-padded, native dtype so the
            # packed dot stays on the MXU bf16 path); dummy when unpacked
            pltpu.VMEM((Hkv, QBLK * (Hq // Hkv), 128) if
                       (Hq > Hkv and QBLK <= 32) else (1, 16, 128),
                       q.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    kernel = functools.partial(
        _rpa_kernel_chunked,
        page_size=page_size,
        QBLK=QBLK,
        KVBLK=KVBLK,
        scale=scale,
        logit_cap=logit_cap,
        sliding_window=sliding_window,
        D=D,
        Hq=Hq,
        Hkv=Hkv,
        spec_anc=spec_anc,
    )

    layer_arr = jnp.reshape(jnp.asarray(layer_idx, jnp.int32), (1,))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Tpad, CQ, 128), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        layer_arr,
        jnp.asarray([S], jnp.int32),
        page_table,
        kv_lens,
        meta.q_lens,
        meta.q_start,
        meta.block_seq,
        meta.block_row,
        meta.block_qofs,
        win_base if win_base is not None else jnp.zeros_like(kv_lens),
        block_first,
        q_in,
        kv_flat,
    )
    return out[:T].reshape(T, Hq, D)
