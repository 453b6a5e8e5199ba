"""Cross-request streaming schedule for ragged paged attention — EXPERIMENTAL.

Measured NEGATIVE result, quarantined (round-4 verdict #6 / PERF.md "known
negative results"): the global KV stream loses to the blocked schedule at
every measured shape (105-163 GB/s vs 156-287 GB/s) and to the packed
schedule everywhere; its per-block fetch state machine costs more than the
DMA latency it hides at serving shapes. Kept selectable behind
RPA_DECODE_STREAM=1 (RPA_STREAM_NBUF pipeline depth) for future re-testing
on parts with different DMA latency profiles; nothing routes here by
default.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from semi_pd_tpu.ops.attention.rpa_common import (
    NEG_INF,
    _kv_block_copies,
)

def _rpa_kernel_stream(
    # scalar prefetch (same 10 as _rpa_kernel)
    layer_ref, num_slots_ref, page_table_ref, kv_lens_ref, q_lens_ref,
    q_start_ref, block_seq_ref, block_row_ref, block_qofs_ref, win_base_ref,
    q_hbm, kv_hbm, out_hbm,
    q_buf, k_buf, v_buf, o_buf, m_scr, l_scr, acc_scr, st,
    q_sem, kv_sems, o_sem,
    *, page_size, QBLK, KVBLK, NBUF, scale, logit_cap, ncomp, v_dim,
):
    """Cross-request streaming variant of _rpa_kernel (aligned / MLA
    layouts). Same global kv-block stream + SMEM fetch state machine as
    _rpa_kernel_chunked_stream (see its docstring); the flash math is the
    [Hkv, QG] form of _rpa_kernel."""
    i = pl.program_id(0)
    NQB = pl.num_programs(0)
    ppb = KVBLK // page_size
    layer = layer_ref[0]
    S = num_slots_ref[0]
    k_base = (layer * ncomp + 0) * S
    v_base = (layer * ncomp + 1) * S if ncomp == 2 else k_base

    def nblk(idx):
        bb = block_seq_ref[jnp.minimum(idx, NQB - 1)]
        kvl = kv_lens_ref[jnp.maximum(bb, 0)]
        n = (kvl + KVBLK - 1) // KVBLK
        return jnp.where(bb >= 0, n, 0)

    def start_block_dma(req_idx, blk, slot):
        bb = jnp.maximum(block_seq_ref[req_idx], 0)
        for p in range(ppb):
            page = page_table_ref[bb, blk * ppb + p]
            dst = pl.ds(p * page_size, page_size)
            pltpu.make_async_copy(
                kv_hbm.at[pl.ds(k_base + page * page_size, page_size)],
                k_buf.at[slot, dst], kv_sems.at[slot, 0],
            ).start()
            if v_dim is None:
                pltpu.make_async_copy(
                    kv_hbm.at[pl.ds(v_base + page * page_size, page_size)],
                    v_buf.at[slot, dst], kv_sems.at[slot, 1],
                ).start()

    def wait_block_dma(slot):
        for p in range(ppb):
            dst = pl.ds(p * page_size, page_size)
            pltpu.make_async_copy(
                kv_hbm.at[pl.ds(0, page_size)], k_buf.at[slot, dst],
                kv_sems.at[slot, 0],
            ).wait()
            if v_dim is None:
                pltpu.make_async_copy(
                    kv_hbm.at[pl.ds(0, page_size)], v_buf.at[slot, dst],
                    kv_sems.at[slot, 1],
                ).wait()

    def issue_next():
        def cond(c):
            r, bk = c
            return (r < NQB) & (bk >= nblk(r))

        def step(c):
            r, _ = c
            return r + 1, jnp.zeros((), jnp.int32)

        r, bk = jax.lax.while_loop(cond, step, (st[0], st[1]))
        fo = st[2]

        @pl.when(r < NQB)
        def _():
            start_block_dma(r, bk, jax.lax.rem(fo, NBUF))

        st[0] = r
        st[1] = jnp.where(r < NQB, bk + 1, bk)
        st[2] = jnp.where(r < NQB, fo + 1, fo)

    @pl.when(i == 0)
    def _():
        st[0] = jnp.zeros((), jnp.int32)
        st[1] = jnp.zeros((), jnp.int32)
        st[2] = jnp.zeros((), jnp.int32)
        st[3] = jnp.zeros((), jnp.int32)

        def warm(_, carry):
            issue_next()
            return carry

        jax.lax.fori_loop(0, NBUF, warm, 0)

    b = block_seq_ref[i]
    bsafe = jnp.maximum(b, 0)
    row0 = block_row_ref[i]
    qofs = block_qofs_ref[i]
    kv_len = kv_lens_ref[bsafe]
    q_len = q_lens_ref[bsafe]
    q_start = q_start_ref[bsafe]
    n_rows = jnp.minimum(q_len - qofs, QBLK)
    q_abs_lo = q_start + qofs
    nb = nblk(i)
    active = (b >= 0) & (nb > 0)

    @pl.when(active)
    def _():
        pltpu.make_async_copy(q_hbm.at[pl.ds(row0, QBLK)], q_buf, q_sem).start()
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)
        pltpu.make_async_copy(q_hbm.at[pl.ds(row0, QBLK)], q_buf, q_sem).wait()

        QBLK_, Hq, D = q_buf.shape
        Hkv = k_buf.shape[2] if v_dim is None else 1
        G = Hq // Hkv
        QG = QBLK_ * G
        q_local_qg = jax.lax.broadcasted_iota(jnp.int32, (QG, KVBLK), 0) // G

        def body(j, carry):
            co = st[3]
            slot = jax.lax.rem(co, NBUF)
            wait_block_dma(slot)
            q = q_buf[...]  # native dtype: bf16 dots, f32 accumulation
            if v_dim is None:
                k = k_buf[slot]
                v = v_buf[slot]
                if k.dtype != q.dtype:  # fp8 KV
                    k, v = k.astype(q.dtype), v.astype(q.dtype)
            else:  # MLA keeps f32 (see _rpa_kernel)
                q = q.astype(jnp.float32)
                k3 = k_buf[slot].astype(jnp.float32)
            kv_blk_start = j * KVBLK
            kv_pos = kv_blk_start + jax.lax.broadcasted_iota(
                jnp.int32, (QG, KVBLK), 1)
            q_abs = q_abs_lo + q_local_qg
            valid = (kv_pos <= q_abs) & (kv_pos < kv_len) & (q_local_qg < n_rows)

            for h in range(Hkv):
                q_h = q[:, h * G : (h + 1) * G, :].reshape(QG, D)
                if v_dim is None:
                    s = jax.lax.dot_general(
                        q_h, k[:, h, :],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                else:
                    HALF = D // 2
                    s = jax.lax.dot_general(
                        q_h[:, 0:HALF], k3[:, 0, :],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) + jax.lax.dot_general(
                        q_h[:, HALF:], k3[:, 1, :],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                s = s * scale
                if logit_cap:
                    s = logit_cap * jnp.tanh(s / logit_cap)
                s = jnp.where(valid, s, NEG_INF)

                m_old = m_scr[h, :][:, None]
                l_old = l_scr[h, :][:, None]
                m_cur = jnp.max(s, axis=1, keepdims=True)
                m_new = jnp.maximum(m_old, m_cur)
                p_ = jnp.exp(s - m_new)
                corr = jnp.exp(m_old - m_new)
                l_new = l_old * corr + jnp.sum(p_, axis=1, keepdims=True)
                if v_dim is None:
                    pv = jax.lax.dot_general(
                        p_.astype(v.dtype), v[:, h, :],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                else:
                    HALF = D // 2
                    parts = []
                    for comp in range(2):
                        lo = comp * HALF
                        hi = min(v_dim, lo + HALF)
                        if hi > lo:
                            parts.append(jax.lax.dot_general(
                                p_.astype(k3.dtype), k3[:, comp, 0 : hi - lo],
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            ))
                    pv = (jnp.concatenate(parts, axis=1)
                          if len(parts) > 1 else parts[0])
                acc_scr[h] = acc_scr[h] * corr + pv
                m_scr[h, :] = m_new[:, 0]
                l_scr[h, :] = l_new[:, 0]

            st[3] = co + 1
            issue_next()
            return carry

        jax.lax.fori_loop(0, nb, body, 0)

        QBLK_, Hq, D = q_buf.shape
        Hkv = 1 if v_dim is not None else k_buf.shape[2]
        Dv = v_dim if v_dim is not None else D
        G = Hq // Hkv
        l = l_scr[...]
        l_safe = jnp.where(l <= 0.0, 1.0, l)
        normed = acc_scr[...] / l_safe[:, :, None]
        out = (
            normed.reshape(Hkv, QBLK_, G, Dv).transpose(1, 0, 2, 3)
            .reshape(QBLK_, Hq, Dv)
        )
        o_buf[...] = out.astype(o_buf.dtype)
        cp = pltpu.make_async_copy(o_buf, out_hbm.at[pl.ds(row0, QBLK_)], o_sem)
        cp.start()
        cp.wait()




def _rpa_kernel_chunked_stream(
    # scalar prefetch (same 9 as _rpa_kernel_chunked)
    layer_ref, num_slots_ref, page_table_ref, kv_lens_ref, q_lens_ref,
    q_start_ref, block_seq_ref, block_row_ref, block_qofs_ref,
    q_hbm, kv_hbm, out_hbm,
    q_buf, kv_buf, o_buf, m_scr, l_scr, acc_scr, st,
    q_sem, kv_sem, o_sem,
    *, page_size, QBLK, KVBLK, NBUF, scale, logit_cap, D, Hq, Hkv,
):
    """Decode-streaming variant of _rpa_kernel_chunked.

    The blocked (NQB, KB) schedule only overlaps DMA *within* one request's
    kv blocks; in decode most requests span a single kv block, so every
    grid cell pays a full cold DMA latency (the measured DMA-issue bound:
    BENCH_KERNELS.json decode ~23%% of HBM roofline). Here the grid is
    (NQB,) and kv blocks of ALL requests form one global stream,
    double-buffered NBUF deep through an SMEM fetch state machine
    (st = [fetch_req, fetch_blk, fetch_ordinal, consume_ordinal], persisted
    across grid cells): while request i's blocks are computed, blocks of
    requests i+1.. stream into the ring. Every stream block is issued
    exactly once (warm-up fills the ring; each consume issues one more) and
    waited exactly once, so semaphore counts always pair. Reference serving
    path: srt/layers/attention/flashinfer_backend.py decode wrappers keep
    all pages in flight via one batched kernel — this is the TPU
    equivalent over Mosaic async copies."""
    i = pl.program_id(0)
    NQB = pl.num_programs(0)
    ppb = KVBLK // page_size
    layer = layer_ref[0]
    S = num_slots_ref[0]
    row_base = layer * S

    def nblk(idx):
        bb = block_seq_ref[jnp.minimum(idx, NQB - 1)]
        kvl = kv_lens_ref[jnp.maximum(bb, 0)]
        n = (kvl + KVBLK - 1) // KVBLK
        return jnp.where(bb >= 0, n, 0)

    def start_block_dma(req_idx, blk, slot):
        bb = jnp.maximum(block_seq_ref[req_idx], 0)
        for p in range(ppb):
            page = page_table_ref[bb, blk * ppb + p]
            pltpu.make_async_copy(
                kv_hbm.at[pl.ds(row_base + page * page_size, page_size)],
                kv_buf.at[slot, pl.ds(p * page_size, page_size)],
                kv_sem.at[slot],
            ).start()

    def wait_block_dma(slot):
        for p in range(ppb):
            pltpu.make_async_copy(
                kv_hbm.at[pl.ds(0, page_size)],
                kv_buf.at[slot, pl.ds(p * page_size, page_size)],
                kv_sem.at[slot],
            ).wait()

    def issue_next():
        # Advance (fetch_req, fetch_blk) past exhausted requests, then issue
        # one stream block if any remain.
        def cond(c):
            r, bk = c
            return (r < NQB) & (bk >= nblk(r))

        def step(c):
            r, _ = c
            return r + 1, jnp.zeros((), jnp.int32)

        r, bk = jax.lax.while_loop(cond, step, (st[0], st[1]))
        fo = st[2]

        @pl.when(r < NQB)
        def _():
            start_block_dma(r, bk, jax.lax.rem(fo, NBUF))

        st[0] = r
        st[1] = jnp.where(r < NQB, bk + 1, bk)
        st[2] = jnp.where(r < NQB, fo + 1, fo)

    @pl.when(i == 0)
    def _():
        st[0] = jnp.zeros((), jnp.int32)
        st[1] = jnp.zeros((), jnp.int32)
        st[2] = jnp.zeros((), jnp.int32)
        st[3] = jnp.zeros((), jnp.int32)

        def warm(_, carry):
            issue_next()
            return carry

        jax.lax.fori_loop(0, NBUF, warm, 0)

    b = block_seq_ref[i]
    bsafe = jnp.maximum(b, 0)
    row0 = block_row_ref[i]
    qofs = block_qofs_ref[i]
    kv_len = kv_lens_ref[bsafe]
    q_len = q_lens_ref[bsafe]
    q_start = q_start_ref[bsafe]
    n_rows = jnp.minimum(q_len - qofs, QBLK)
    q_abs_lo = q_start + qofs
    nb = nblk(i)
    active = (b >= 0) & (nb > 0)

    @pl.when(active)
    def _():
        pltpu.make_async_copy(q_hbm.at[pl.ds(row0, QBLK)], q_buf, q_sem).start()
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)
        pltpu.make_async_copy(q_hbm.at[pl.ds(row0, QBLK)], q_buf, q_sem).wait()

        G = Hq // Hkv
        VB = (Hkv * D) // 128
        q_local = jax.lax.broadcasted_iota(jnp.int32, (QBLK, KVBLK), 0)
        q_abs = q_abs_lo + q_local

        def head(x, h, base=0):
            c, o = base + (h * D) // 128, (h * D) % 128
            return x[:, c, o : o + D]

        def body(j, carry):
            co = st[3]
            slot = jax.lax.rem(co, NBUF)
            wait_block_dma(slot)
            q = q_buf[...]  # native dtype: bf16 dots, f32 accumulation
            kv = kv_buf[slot]
            if kv.dtype != q.dtype:  # fp8 KV
                kv = kv.astype(q.dtype)
            kv_blk_start = j * KVBLK
            kv_pos = kv_blk_start + jax.lax.broadcasted_iota(
                jnp.int32, (QBLK, KVBLK), 1)
            valid = (kv_pos <= q_abs) & (kv_pos < kv_len) & (q_local < n_rows)

            for h in range(Hkv):
                k_h = head(kv, h)
                v_h = head(kv, h, base=VB)
                for g in range(G):
                    hq = h * G + g
                    q_h = head(q, hq)
                    s = jax.lax.dot_general(
                        q_h, k_h,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) * scale
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
                    )
                    acc_scr[:, hq, 0:D] = acc_scr[:, hq, 0:D] * corr + pv
                    m_scr[hq, :] = m_new[:, 0]
                    l_scr[hq, :] = l_new[:, 0]

            st[3] = co + 1
            issue_next()
            return carry

        jax.lax.fori_loop(0, nb, body, 0)

        l = l_scr[...]
        l_safe = jnp.where(l <= 0.0, 1.0, l)
        for hq in range(Hq):
            c, o = (hq * D) // 128, (hq * D) % 128
            o_buf[:, c, o : o + D] = (
                acc_scr[:, hq, 0:D] / l_safe[hq][:, None]
            ).astype(o_buf.dtype)
        cp = pltpu.make_async_copy(o_buf, out_hbm.at[pl.ds(row0, QBLK)], o_sem)
        cp.start()
        cp.wait()




def dispatch_stream_aligned(q_in, kv_flat_s, T, Tpad, layer_arr_s, S,
                            page_table, kv_lens, meta, win_base, *, kv_dtype,
                            QBLK, KVBLK, NQB, Hq, Hkv, D, Dv, QG, page_size,
                            scale, logit_cap, ncomp, v_dim, interpret):
    """pallas_call dispatch for the aligned/MLA-layout streaming kernel
    (moved verbatim from ragged_paged_attention's stream branch)."""
    NBUF = int(os.environ.get("RPA_STREAM_NBUF", "4"))
    kvb_shape = (
        (NBUF, KVBLK, Hkv, D) if v_dim is None
        else (NBUF, KVBLK, 2, D // 2))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=10,
        grid=(NQB,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((QBLK, Hq, D), q_in.dtype),
            pltpu.VMEM(kvb_shape, kv_dtype),
            pltpu.VMEM(
                kvb_shape if v_dim is None else (1, 8, 2, 128), kv_dtype),
            pltpu.VMEM((QBLK, Hq, Dv), q_in.dtype),
            pltpu.VMEM((Hkv, QG), jnp.float32),
            pltpu.VMEM((Hkv, QG), jnp.float32),
            pltpu.VMEM((Hkv, QG, Dv), jnp.float32),
            pltpu.SMEM((4,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((NBUF, 2)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel_s = functools.partial(
        _rpa_kernel_stream,
        page_size=page_size, QBLK=QBLK, KVBLK=KVBLK, NBUF=NBUF,
        scale=scale, logit_cap=logit_cap, ncomp=ncomp, v_dim=v_dim,
    )
    out = pl.pallas_call(
        kernel_s,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Tpad, Hq, Dv), q_in.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        layer_arr_s,
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
        kv_flat_s,
    )
    return out[:T]


def dispatch_stream_chunked(q_in, kv_flat, T, Tpad, layer_idx, S, page_table,
                            kv_lens, meta, *, kv_dtype, QBLK, KVBLK, NQB, CQ,
                            CT, Hq, Hkv, D, page_size, scale, logit_cap,
                            interpret):
    """pallas_call dispatch for the chunked-layout streaming kernel (moved
    verbatim from ragged_paged_attention_chunked's stream branch)."""
    NBUF = int(os.environ.get("RPA_STREAM_NBUF", "4"))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=9,
        grid=(NQB,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((QBLK, CQ, 128), q_in.dtype),
            pltpu.VMEM((NBUF, KVBLK, CT, 128), kv_dtype),
            pltpu.VMEM((QBLK, CQ, 128), q_in.dtype),
            pltpu.VMEM((Hq, QBLK), jnp.float32),
            pltpu.VMEM((Hq, QBLK), jnp.float32),
            pltpu.VMEM((QBLK, Hq, 128), jnp.float32),
            pltpu.SMEM((4,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(
        _rpa_kernel_chunked_stream,
        page_size=page_size, QBLK=QBLK, KVBLK=KVBLK, NBUF=NBUF,
        scale=scale, logit_cap=logit_cap, D=D, Hq=Hq, Hkv=Hkv,
    )
    layer_arr = jnp.reshape(jnp.asarray(layer_idx, jnp.int32), (1,))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Tpad, CQ, 128), q_in.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
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
        q_in,
        kv_flat,
    )
    return out[:T].reshape(T, Hq, D)
