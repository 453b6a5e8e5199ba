"""Multi-request PACKED decode schedules for ragged paged attention — the
measured-best (and default) decode path since round 4.

Packing rpb requests per grid cell, each with its own block-diagonal KV
section, streams identical KV bytes per cell but shrinks the VPU score tile
from [QBLK*G, KVBLK] to [rpb*G, KVBLK]; with stacked-heads flash the update
runs once per cell instead of per KV head. Measured v5e (BENCH_KERNELS.json,
BENCH_PACKED*_r4.json): 49.2% of HBM roofline at b16/kv8k (52.1% at page
64), 2.51x the blocked kernel for absorbed MLA. Kill switch:
RPA_DECODE_PACKED=0 routes decode back to the blocked schedule.

Split out of ragged_paged_attention.py (round-5, VERDICT #6) so schedule
work lands in a focused module; the blocked/extend kernels and the layout
routers stay in ragged_paged_attention.py.
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

def _rpa_kernel_chunked_packed(
    # scalar prefetch
    layer_ref, num_slots_ref, page_table_ref, kv_lens_ref,
    # HBM refs: q [Bpad+QROWS, CQ, 128]; kv [L*S, CT, 128]; out like q
    q_hbm, kv_hbm, out_hbm,
    # scratch
    q_buf, kv_buf, o_buf, m_scr, l_scr, acc_scr, qp_scr, q_sem, kv_sem,
    o_sem,
    *, page_size, RPB, SUB, scale, logit_cap, sliding_window, D, Hq, Hkv,
    diag_dots=False,
):
    """Multi-request packed DECODE cell (VERDICT r3 #2 escape hatch,
    measured — see PERF.md).

    Hypothesis under test: decode cells are bounded by VPU/op work on the
    score tile, and the blocked kernel's tile is 1/QBLK valid (one request
    per cell, QBLK=16 padded rows). Packing RPB requests per cell — each
    contributing its own SUB=KVBLK/RPB KV section, masked block-diagonally
    — shrinks the per-head tile from [QBLK*G, KVBLK] to [RPB*G, KVBLK]
    with the SAME streamed bytes per cell: the elementwise VPU cost per
    streamed KV byte drops QBLK/RPB-fold while DMA issues rise RPB-fold
    (RPB gathers per cell instead of one).

    Decode-only (T == B), chunked pool, no sliding window / spec trees.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)

    ppb = SUB // page_size
    KVBLK = RPB * SUB
    layer = layer_ref[0]
    S = num_slots_ref[0]
    row_base = layer * S
    r0 = i * RPB
    G = Hq // Hkv
    RG = RPB * G

    lens = [kv_lens_ref[r0 + r] for r in range(RPB)]
    max_len = lens[0]
    for r in range(1, RPB):
        max_len = jnp.maximum(max_len, lens[r])
    active = (j * SUB) < max_len
    last_j = jnp.maximum((max_len + SUB - 1) // SUB - 1, 0)
    first_j = jnp.zeros((), jnp.int32)
    if sliding_window is not None and sliding_window > 0:
        # decode rows attend (len - W, len): chunks wholly before the
        # EARLIEST window start in the group are skipped (their rows would
        # be all-masked anyway)
        w0 = jnp.maximum(lens[0] - sliding_window, 0)
        for r in range(1, RPB):
            w0 = jnp.minimum(w0, jnp.maximum(lens[r] - sliding_window, 0))
        first_j = w0 // SUB
        active &= j >= first_j

    def kv_dma(slot, blk, wait):
        # Every section is gathered UNCONDITIONALLY, even past a request's
        # kv_len: its page-table tail is zeros, so the copy reads the dump
        # page — real (masked-out) data. Skipping would leave the section
        # uninitialized, and 0 * garbage = NaN poisons the p @ v dot.
        for r in range(RPB):
            _kv_block_copies(
                page_table_ref, r0 + r, blk, ppb, page_size,
                [(kv_hbm, row_base,
                  kv_buf.at[slot, pl.ds(r * SUB, SUB)],
                  kv_sem.at[slot, r])],
                wait=wait)

    slot = jax.lax.rem(j, 2)

    @pl.when(active & (j == first_j))
    def _():
        pltpu.make_async_copy(
            q_hbm.at[pl.ds(r0, q_buf.shape[0])], q_buf, q_sem).start()
        kv_dma(slot, j, wait=False)
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)
        pltpu.make_async_copy(
            q_hbm.at[pl.ds(r0, q_buf.shape[0])], q_buf, q_sem).wait()
        # stage q rows packed per kv head (flat head-major rows: row
        # h*RG + r*G + g <- request r0+r, head h*G+g), once per group
        qf = q_buf[...]
        for h in range(Hkv):
            for r in range(RPB):
                for g in range(G):
                    hq = h * G + g
                    c, o = (hq * D) // 128, (hq * D) % 128
                    qp_scr[h * RG + r * G + g, 0:D] = qf[r, c, o : o + D]

    @pl.when(active)
    def _():
        @pl.when(j < last_j)
        def _():
            kv_dma(1 - slot, j + 1, wait=False)

        kv_dma(slot, j, wait=True)

        VB = (Hkv * D) // 128
        kv = kv_buf[slot]  # [KVBLK, CT, 128]
        if kv.dtype != q_buf.dtype:  # fp8 KV
            kv = kv.astype(q_buf.dtype)

        def head(x, h, base=0):
            c, o = base + (h * D) // 128, (h * D) % 128
            return x[:, c, o : o + D]

        HRG = Hkv * RG
        len_rows = jnp.zeros((HRG, 1), jnp.int32)
        row_req = (jax.lax.broadcasted_iota(jnp.int32, (HRG, 1), 0) % RG) // G
        for r in range(RPB):
            len_rows = jnp.where(row_req == r, lens[r], len_rows)

        if diag_dots:
            # BATCHED-DIAGONAL dots (round-5): the block-diagonal structure
            # means 1 - 1/RPB of the [HRG, KVBLK] score tile is masked
            # waste. Folding (head, request) into dot_general's batch dims
            # computes only each row's own SUB-wide section — the VPU flash
            # tile shrinks RPB-fold at identical streamed bytes, and the
            # whole cell still issues ONE qk dot and ONE pv dot.
            kc = jax.lax.broadcasted_iota(jnp.int32, (HRG, SUB), 1)
            abs_kv = j * SUB + kc
            valid = abs_kv < len_rows
            if sliding_window is not None and sliding_window > 0:
                valid &= abs_kv > (len_rows - 1 - sliding_window)
            # Per-head batch-RPB dots (an all-heads [Hkv*RPB, SUB, D]
            # batched dot blew the 16M scoped VMEM at rpb4/kvb1024 —
            # compile-measured 25.3M)
            qp = qp_scr[...]
            s = jnp.concatenate([
                jax.lax.dot_general(
                    qp[h * RG : (h + 1) * RG, 0:D].reshape(RPB, G, D),
                    head(kv, h).reshape(RPB, SUB, D),
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).reshape(RG, SUB)
                for h in range(Hkv)
            ], axis=0) * scale  # [HRG, SUB]
        else:
            # Full-width tile with block-diagonal masking: kv column kc
            # belongs to section kc // SUB == its request; a row sees only
            # its own section, up to that request's kv_len. Rows are
            # STACKED head-major ([Hkv * RG, ...]): the qk/pv dots stay per
            # head (different kv lanes), but the mask/softmax/normalizer
            # ops run ONCE on the [Hkv*RG, KVBLK] tile instead of Hkv times
            # on [RG, KVBLK] (PERF.md round 4).
            kc = jax.lax.broadcasted_iota(jnp.int32, (HRG, KVBLK), 1)
            rq = (jax.lax.broadcasted_iota(jnp.int32, (HRG, KVBLK), 0)
                  % RG) // G
            sect = kc // SUB
            abs_kv = j * SUB + (kc - sect * SUB)
            valid = (sect == rq) & (abs_kv < len_rows)
            if sliding_window is not None and sliding_window > 0:
                # decode: q_abs = len - 1; visible iff abs_kv > q_abs - W
                valid &= abs_kv > (len_rows - 1 - sliding_window)
            s = jnp.concatenate([
                jax.lax.dot_general(
                    qp_scr[h * RG : (h + 1) * RG, 0:D], head(kv, h),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for h in range(Hkv)
            ], axis=0) * scale  # [HRG, KVBLK], head-major rows
        if logit_cap:
            s = logit_cap * jnp.tanh(s / logit_cap)
        s = jnp.where(valid, s, NEG_INF)

        m_old = m_scr[0, :][:, None]
        l_old = l_scr[0, :][:, None]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_old, m_cur)
        # Unlike the per-request blocked kernel, a packed cell can be
        # entirely PAST one request's kv_len (the group runs to the
        # longest member): such rows are all-masked, m stays NEG_INF,
        # and exp(s - m_new) would be exp(0)=1 garbage — mask p itself.
        p_ = jnp.where(valid, jnp.exp(s - m_new), 0.0)
        corr = jnp.exp(m_old - m_new)
        l_new = l_old * corr + jnp.sum(p_, axis=1, keepdims=True)
        if diag_dots:
            pv = jnp.concatenate([
                jax.lax.dot_general(
                    p_[h * RG : (h + 1) * RG].reshape(
                        RPB, G, SUB).astype(kv.dtype),
                    head(kv, h, base=VB).reshape(RPB, SUB, D),
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).reshape(RG, D)
                for h in range(Hkv)
            ], axis=0)  # [HRG, D]
        else:
            pv = jnp.concatenate([
                jax.lax.dot_general(
                    p_[h * RG : (h + 1) * RG].astype(kv.dtype),
                    head(kv, h, base=VB),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for h in range(Hkv)
            ], axis=0)  # [HRG, D]
        acc_scr[:, 0:D] = acc_scr[:, 0:D] * corr + pv
        m_scr[0, :] = m_new[:, 0]
        l_scr[0, :] = l_new[:, 0]

    @pl.when((max_len > 0) & (j == last_j))
    def _():
        l = l_scr[0, :]  # [Hkv*RG] head-major
        l_safe = jnp.where(l <= 0.0, 1.0, l)
        for hq in range(Hq):
            h, g = hq // G, hq % G
            c, o = (hq * D) // 128, (hq * D) % 128
            for r in range(RPB):
                row = h * RG + r * G + g
                o_buf[r, c, o : o + D] = (
                    acc_scr[row, 0:D] / l_safe[row]
                ).astype(o_buf.dtype)
        cp = pltpu.make_async_copy(
            o_buf, out_hbm.at[pl.ds(r0, RPB)], o_sem)
        cp.start()
        cp.wait()


def ragged_paged_attention_chunked_packed(
    q,  # [B, Hq, D] (decode: one row per request)
    kv_cache,  # [L, S, CT, 128]
    layer_idx,
    page_table,
    kv_lens,
    *,
    page_size,
    num_kv_heads,
    head_dim,
    scale,
    logit_cap=None,
    sliding_window=None,
    rpb: int = 2,
    kv_block: int = 1024,
    interpret: bool = False,
):
    """Driver for the multi-request packed decode kernel (experiment; see
    _rpa_kernel_chunked_packed)."""
    B, Hq, D = q.shape
    assert 128 % D == 0 and (Hq * D) % 128 == 0
    L, S, CT, _ = kv_cache.shape
    Hkv = num_kv_heads
    Bt, maxP = page_table.shape
    assert Bt == B
    max_kv = maxP * page_size
    SUB = kv_block // rpb
    # no point streaming sections longer than the pool's per-request extent
    SUB = max(page_size, min(SUB, -(-max_kv // page_size) * page_size))
    if SUB % page_size:
        raise ValueError("kv_block/rpb must be a multiple of page_size")
    if max_kv % SUB:
        padP = (SUB - max_kv % SUB) // page_size
        page_table = jnp.pad(page_table, ((0, 0), (0, padP)))
        maxP += padP
        max_kv += padP * page_size
    if B % rpb:
        padB = rpb - B % rpb
        page_table = jnp.pad(page_table, ((0, padB), (0, 0)))
        kv_lens = jnp.pad(kv_lens, (0, padB))
    Bpad = page_table.shape[0]
    KJ = max_kv // SUB
    KVBLK = rpb * SUB
    CQ = Hq * D // 128
    QROWS = max(rpb, 8)
    q_in = jnp.pad(q.reshape(B, CQ, 128), ((0, Bpad - B + QROWS), (0, 0), (0, 0)))
    kv_flat = kv_cache.reshape(L * S, CT, 128)
    RG = rpb * (Hq // Hkv)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(Bpad // rpb, KJ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((QROWS, CQ, 128), q.dtype),
            pltpu.VMEM((2, KVBLK, CT, 128), kv_cache.dtype),
            pltpu.VMEM((rpb, CQ, 128), q.dtype),
            pltpu.VMEM((1, Hkv * RG), jnp.float32),
            pltpu.VMEM((1, Hkv * RG), jnp.float32),
            pltpu.VMEM((Hkv * RG, 128), jnp.float32),
            pltpu.VMEM((Hkv * RG, 128), q.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2, rpb)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(
        _rpa_kernel_chunked_packed,
        page_size=page_size, RPB=rpb, SUB=SUB, scale=scale,
        logit_cap=logit_cap, sliding_window=sliding_window,
        D=D, Hq=Hq, Hkv=Hkv,
        diag_dots=os.environ.get("RPA_PACKED_DIAG", "1") == "1",
    )
    layer_arr = jnp.reshape(jnp.asarray(layer_idx, jnp.int32), (1,))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bpad + QROWS, CQ, 128), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        layer_arr,
        jnp.asarray([S], jnp.int32),
        page_table,
        kv_lens,
        q_in,
        kv_flat,
    )
    return out[:B].reshape(B, Hq, D)


def _rpa_kernel_packed(
    # scalar prefetch
    layer_ref, num_slots_ref, page_table_ref, kv_lens_ref,
    # HBM refs: q [Bpad+QROWS, Hq, D]; kv [L*ncomp*S, Hkv, D] (aligned) or
    # [L*S, 2, D/2] (MLA latent halves); out [Bpad+QROWS, Hq, Dv]
    q_hbm, kv_hbm, out_hbm,
    # scratch
    q_buf, k_buf, v_buf, o_buf, m_scr, l_scr, acc_scr, q_sem, kv_sems,
    o_sem,
    *, page_size, RPB, SUB, scale, logit_cap, sliding_window, ncomp, v_dim,
    D, Hq, Hkv, diag_dots=False,
):
    """Multi-request packed decode for the ALIGNED (D multiple of 128) and
    MLA layouts — same schedule as _rpa_kernel_chunked_packed: RPB requests
    per cell, block-diagonal SUB-slot KV sections, [RPB*G, KVBLK] score
    tiles instead of [QBLK*G, KVBLK]. MLA benefits most: G = Hq there, so
    the blocked tile is 16x taller than the valid rows."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    ppb = SUB // page_size
    KVBLK = RPB * SUB
    layer = layer_ref[0]
    S = num_slots_ref[0]
    k_base = (layer * ncomp + 0) * S
    v_base = (layer * ncomp + 1) * S if ncomp == 2 else k_base
    r0 = i * RPB
    G = Hq // Hkv
    RG = RPB * G

    lens = [kv_lens_ref[r0 + r] for r in range(RPB)]
    max_len = lens[0]
    for r in range(1, RPB):
        max_len = jnp.maximum(max_len, lens[r])
    active = (j * SUB) < max_len
    last_j = jnp.maximum((max_len + SUB - 1) // SUB - 1, 0)
    first_j = jnp.zeros((), jnp.int32)
    if sliding_window is not None and sliding_window > 0:
        w0 = jnp.maximum(lens[0] - sliding_window, 0)
        for r in range(1, RPB):
            w0 = jnp.minimum(w0, jnp.maximum(lens[r] - sliding_window, 0))
        first_j = w0 // SUB
        active &= j >= first_j

    def kv_dma(slot, blk, wait):
        # unconditional per-request gathers (see chunked packed kernel)
        for r in range(RPB):
            if v_dim is None:
                specs = [(kv_hbm, k_base,
                          k_buf.at[slot, pl.ds(r * SUB, SUB)],
                          kv_sems.at[slot, r, 0]),
                         (kv_hbm, v_base,
                          v_buf.at[slot, pl.ds(r * SUB, SUB)],
                          kv_sems.at[slot, r, 1])]
                _kv_block_copies(
                    page_table_ref, r0 + r, blk, ppb, page_size, specs,
                    wait=wait)
            else:
                # MLA latent rows travel in 8-row blocks (the hbm ref is
                # the [rows/8, 8, D] untiled-dim-0 view): offsets and
                # lengths are all in 8-row units.
                specs = [(kv_hbm, k_base // 8,
                          k_buf.at[slot, pl.ds(r * (SUB // 8), SUB // 8)],
                          kv_sems.at[slot, r, 0])]
                _kv_block_copies(
                    page_table_ref, r0 + r, blk, ppb, page_size // 8,
                    specs, wait=wait)

    slot = jax.lax.rem(j, 2)

    @pl.when(active & (j == first_j))
    def _():
        pltpu.make_async_copy(
            q_hbm.at[pl.ds(r0, q_buf.shape[0])], q_buf, q_sem).start()
        kv_dma(slot, j, wait=False)
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)
        pltpu.make_async_copy(
            q_hbm.at[pl.ds(r0, q_buf.shape[0])], q_buf, q_sem).wait()

    @pl.when(active)
    def _():
        @pl.when(j < last_j)
        def _():
            kv_dma(1 - slot, j + 1, wait=False)

        kv_dma(slot, j, wait=True)

        Dv = v_dim if v_dim is not None else D
        q = q_buf[...]  # [QROWS, Hq, D]
        if v_dim is None:
            k = k_buf[slot]  # [KVBLK, Hkv, D]
            v = v_buf[slot]
            if k.dtype != q.dtype:
                k, v = k.astype(q.dtype), v.astype(q.dtype)
        else:
            q = q.astype(jnp.float32)
            # [KVBLK/8, 8, D] 8-row blocks -> [KVBLK, D] latent rows
            k2 = k_buf[slot].reshape(KVBLK, D).astype(jnp.float32)
        kv_dt = k2.dtype if v_dim is not None else v.dtype

        # Stacked-heads flash (see the chunked packed kernel): rows are
        # head-major [Hkv*RG, ...]; dots per head, flash ops once.
        HRG = Hkv * RG
        len_rows = jnp.zeros((HRG, 1), jnp.int32)
        row_req = (jax.lax.broadcasted_iota(jnp.int32, (HRG, 1), 0) % RG) // G
        for r in range(RPB):
            len_rows = jnp.where(row_req == r, lens[r], len_rows)
        if diag_dots:
            # batched per-section dots: score tile [HRG, SUB] (see the
            # chunked packed kernel — RPB-fold less VPU flash area)
            kc = jax.lax.broadcasted_iota(jnp.int32, (HRG, SUB), 1)
            abs_kv = j * SUB + kc
            valid = abs_kv < len_rows
        else:
            kc = jax.lax.broadcasted_iota(jnp.int32, (HRG, KVBLK), 1)
            rq = (jax.lax.broadcasted_iota(
                jnp.int32, (HRG, KVBLK), 0) % RG) // G
            sect = kc // SUB
            abs_kv = j * SUB + (kc - sect * SUB)
            valid = (sect == rq) & (abs_kv < len_rows)
        if sliding_window is not None and sliding_window > 0:
            valid &= abs_kv > (len_rows - 1 - sliding_window)

        def qh(h):
            # rows packed request-major within a head: row r*G+g
            return q[0:RPB, h * G : (h + 1) * G, :].reshape(RG, D)

        def khead(h):
            return k2 if v_dim is not None else k[:, h, :]

        if diag_dots:
            s = jnp.concatenate([
                jax.lax.dot_general(
                    qh(h).reshape(RPB, G, D),
                    khead(h).reshape(RPB, SUB, D),
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).reshape(RG, SUB)
                for h in range(Hkv)
            ], axis=0)
        else:
            s = jnp.concatenate([
                jax.lax.dot_general(
                    qh(h), khead(h),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) for h in range(Hkv)
            ], axis=0)
        s = s * scale  # [HRG, KVBLK or SUB]
        if logit_cap:
            s = logit_cap * jnp.tanh(s / logit_cap)
        s = jnp.where(valid, s, NEG_INF)

        m_old = m_scr[0, :][:, None]
        l_old = l_scr[0, :][:, None]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_old, m_cur)
        p_ = jnp.where(valid, jnp.exp(s - m_new), 0.0)
        corr = jnp.exp(m_old - m_new)
        l_new = l_old * corr + jnp.sum(p_, axis=1, keepdims=True)

        def vhead(h):
            return (k2[:, 0:v_dim] if v_dim is not None else v[:, h, :])

        if diag_dots:
            pv = jnp.concatenate([
                jax.lax.dot_general(
                    p_[h * RG : (h + 1) * RG].reshape(
                        RPB, G, SUB).astype(kv_dt),
                    vhead(h).reshape(RPB, SUB, Dv),
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).reshape(RG, Dv)
                for h in range(Hkv)
            ], axis=0)
        else:
            pv = jnp.concatenate([
                jax.lax.dot_general(
                    p_[h * RG : (h + 1) * RG].astype(kv_dt), vhead(h),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) for h in range(Hkv)
            ], axis=0)  # [HRG, Dv]
        acc_scr[...] = acc_scr[...] * corr + pv
        m_scr[0, :] = m_new[:, 0]
        l_scr[0, :] = l_new[:, 0]

    @pl.when((max_len > 0) & (j == last_j))
    def _():
        Dv = v_dim if v_dim is not None else D
        l = l_scr[0, :]  # [Hkv*RG] head-major
        l_safe = jnp.where(l <= 0.0, 1.0, l)
        normed = acc_scr[...] / l_safe[:, None]  # [HRG, Dv]
        out = jnp.concatenate([
            jnp.concatenate([
                normed[h * RG + r * G : h * RG + (r + 1) * G][None]
                for h in range(Hkv)
            ], axis=1)
            for r in range(RPB)
        ], axis=0)  # [RPB, Hq, Dv]
        o_buf[0:RPB] = out.astype(o_buf.dtype)
        cp = pltpu.make_async_copy(
            o_buf.at[pl.ds(0, RPB)], out_hbm.at[pl.ds(r0, RPB)], o_sem)
        cp.start()
        cp.wait()


def ragged_paged_attention_packed(
    q,  # [B, Hq, D] decode rows
    kv_cache,  # [L, ncomp, S, Hkv, D] aligned pool or [L, 1, S, 1, Dlat]
    layer_idx,
    page_table,
    kv_lens,
    *,
    page_size,
    scale,
    logit_cap=None,
    sliding_window=None,
    v_dim=None,
    rpb: int = 2,
    kv_block: Optional[int] = None,
    interpret: bool = False,
):
    """Driver for the aligned/MLA multi-request packed decode kernel."""
    B, Hq, D = q.shape
    L, ncomp, S, Hkv, _ = kv_cache.shape
    Bt, maxP = page_table.shape
    assert Bt == B
    max_kv = maxP * page_size
    kv_block = kv_block or 1024
    row_bytes = 2 * Hkv * D * jnp.dtype(kv_cache.dtype).itemsize
    budget = (8 << 20) if v_dim is not None else (6 << 20)
    vmem_rows = budget // (2 * max(row_bytes, 1))
    kv_block = min(kv_block,
                   max(page_size, vmem_rows // page_size * page_size))
    SUB = max(page_size, kv_block // rpb)
    SUB = max(page_size, min(SUB, -(-max_kv // page_size) * page_size))
    if SUB % page_size:
        raise ValueError("kv_block/rpb must be a multiple of page_size")
    if max_kv % SUB:
        padP = (SUB - max_kv % SUB) // page_size
        page_table = jnp.pad(page_table, ((0, 0), (0, padP)))
        maxP += padP
        max_kv += padP * page_size
    if B % rpb:
        padB = rpb - B % rpb
        page_table = jnp.pad(page_table, ((0, padB), (0, 0)))
        kv_lens = jnp.pad(kv_lens, (0, padB))
    Bpad = page_table.shape[0]
    KJ = max_kv // SUB
    KVBLK = rpb * SUB
    Dv = v_dim if v_dim is not None else D
    QROWS = max(rpb, 8)
    q_in = jnp.pad(q, ((0, Bpad - B + QROWS), (0, 0), (0, 0)))
    G = Hq // Hkv
    RG = rpb * G

    if v_dim is None:
        kv_flat = kv_cache.reshape(L * ncomp * S, Hkv, kv_cache.shape[-1])
        kvb_shape = (2, KVBLK, Hkv, D)
        vb_shape = (2, KVBLK, Hkv, D)
    else:
        # 8-ROW-BLOCKED latent view [L*S/8, 8, Dlat] — a FREE bitcast of
        # the [L, 1, S, 1, Dlat] pool (identical physical bytes: minor-2
        # (8, Dlat) is exactly one (8,128)-tile row-block, and dim 0 stays
        # UNTILED so any dynamic offset is legal — a plain rank-2
        # [rows, Dlat] view needs Mosaic to PROVE 8-divisibility of the
        # offset, which it cannot for page-table values). The old
        # [rows, 2, Dlat/2] view had an incompatible (2, Dlat/2) tiling,
        # so XLA materialized a relayout copy of the ENTIRE pool every
        # call (~0.24 ms for a 100 MB pool — measured as the r4 "MLA
        # scatter gap", which was never the scatter).
        assert S % 8 == 0 and page_size % 8 == 0, (
            "MLA packed kernel needs 8-divisible page_size/slot count")
        kv_flat = kv_cache.reshape((L * ncomp * S) // 8, 8,
                                   kv_cache.shape[-1])
        kvb_shape = (2, KVBLK // 8, 8, D)
        vb_shape = (1, 8, 128)  # unused for MLA

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(Bpad // rpb, KJ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((QROWS, Hq, D), q.dtype),
            pltpu.VMEM(kvb_shape, kv_cache.dtype),
            pltpu.VMEM(vb_shape, kv_cache.dtype),
            pltpu.VMEM((QROWS, Hq, Dv), q.dtype),
            pltpu.VMEM((1, Hkv * RG), jnp.float32),
            pltpu.VMEM((1, Hkv * RG), jnp.float32),
            pltpu.VMEM((Hkv * RG, Dv), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2, rpb, 2)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(
        _rpa_kernel_packed,
        page_size=page_size, RPB=rpb, SUB=SUB, scale=scale,
        logit_cap=logit_cap, sliding_window=sliding_window,
        ncomp=ncomp, v_dim=v_dim, D=D, Hq=Hq, Hkv=Hkv,
        diag_dots=os.environ.get("RPA_PACKED_DIAG", "1") == "1",
    )
    layer_arr = jnp.reshape(jnp.asarray(layer_idx, jnp.int32), (1,))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bpad + QROWS, Hq, Dv), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        layer_arr,
        jnp.asarray([S], jnp.int32),
        page_table,
        kv_lens,
        q_in,
        kv_flat,
    )
    return out[:B]
