"""Host-side batch assembly → device ForwardArrays.

Reference: python/sglang/srt/managers/schedule_batch.py:516 ScheduleBatch
(prepare_for_extend :796, prepare_for_decode :1144, merge/filter :1260) and
ModelWorkerBatch :1384. Here all bookkeeping is numpy on the controller;
tensorization pads to static buckets so each (T, B, maxP) shape compiles
exactly once (the role of CUDA-graph capture shapes).

Page-table writes happen host-side into the authoritative numpy table (the
reference needs a Triton kernel, write_req_to_token_pool_triton
schedule_batch.py:1446, because its table lives on-GPU; ours ships per-batch
slices with the step instead).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from semi_pd_tpu.ops.sampling import SamplingArrays
from semi_pd_tpu.runtime.forward_batch import (
    ForwardArrays,
    ForwardMode,
    build_attn_meta,
)
from semi_pd_tpu.runtime.req import Req


def bucket_of(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


@dataclasses.dataclass
class HostBatch:
    mode: ForwardMode
    reqs: List[Req]
    extend_lens: Optional[List[int]] = None  # tokens prefilled per req (EXTEND)
    # numpy staging (filled by build_*)
    input_ids: np.ndarray = None
    q_req_idx: np.ndarray = None
    q_pos: np.ndarray = None
    out_slots: np.ndarray = None
    page_table: np.ndarray = None
    kv_lens: np.ndarray = None
    logits_idx: np.ndarray = None
    sampling: SamplingArrays = None
    T: int = 0
    B: int = 0
    maxP: int = 0

    lora_idx: np.ndarray = None
    embed_override: np.ndarray = None
    embed_mask: np.ndarray = None
    mrope_pos: np.ndarray = None
    mask_pos: np.ndarray = None  # [T] slot-order positions (tree verify)
    win_base: np.ndarray = None  # [B] tree window start
    # mllama cross-attention (models/mllama.py)
    cross_states: np.ndarray = None  # [B, Nv, H]
    cross_len: np.ndarray = None  # [B]
    cross_from: np.ndarray = None  # [B]
    # multi-host wire form: follower processes reconstruct the batch without
    # Req objects; n_reqs stands in for len(reqs)
    n_reqs: int = 0

    def _nr(self) -> int:
        return self.n_reqs or len(self.reqs)

    def wire(self) -> dict:
        """Picklable host-value form (everything to_device/pack consume;
        no Req objects — they carry grammar automata and engine state)."""
        d = {
            f.name: getattr(self, f.name)
            for f in dataclasses.fields(self)
            if f.name != "reqs"
        }
        d["n_reqs"] = self._nr()
        return d

    @classmethod
    def from_wire(cls, d: dict) -> "HostBatch":
        return cls(reqs=[], **d)

    def to_device(self, rng_key) -> ForwardArrays:
        if self.mode == ForwardMode.DECODE:
            q_lens = np.ones(self.B, np.int64)
            q_lens[self._nr():] = 0
        else:
            q_lens = np.zeros(self.B, np.int64)
            q_lens[: self._nr()] = self.extend_lens
        return ForwardArrays(
            input_ids=jnp.asarray(self.input_ids),
            q_req_idx=jnp.asarray(self.q_req_idx),
            q_pos=jnp.asarray(self.q_pos),
            out_slots=jnp.asarray(self.out_slots),
            page_table=jnp.asarray(self.page_table),
            kv_lens=jnp.asarray(self.kv_lens),
            logits_idx=jnp.asarray(self.logits_idx),
            sampling=SamplingArrays(*[jnp.asarray(a) for a in self.sampling]),
            rng_key=rng_key,
            num_reqs=jnp.asarray(self._nr(), jnp.int32),
            attn_meta=build_attn_meta(q_lens, self.kv_lens.astype(np.int64), self.T),
            lora_idx=(
                jnp.asarray(self.lora_idx) if self.lora_idx is not None else None
            ),
            embed_override=(
                jnp.asarray(self.embed_override)
                if self.embed_override is not None else None
            ),
            mrope_pos=(
                jnp.asarray(self.mrope_pos)
                if self.mrope_pos is not None else None
            ),
            embed_mask=(
                jnp.asarray(self.embed_mask)
                if self.embed_mask is not None else None
            ),
            mask_pos=(
                jnp.asarray(self.mask_pos) if self.mask_pos is not None else None
            ),
            win_base=(
                jnp.asarray(self.win_base) if self.win_base is not None else None
            ),
            cross_states=(
                jnp.asarray(self.cross_states)
                if self.cross_states is not None else None
            ),
            cross_len=(
                jnp.asarray(self.cross_len) if self.cross_len is not None else None
            ),
            cross_from=(
                jnp.asarray(self.cross_from) if self.cross_from is not None else None
            ),
        )

    def packable(self) -> bool:
        """The packed fast path covers the plain text hot loop; LoRA /
        multimodal / mrope batches ride the legacy per-leaf to_device."""
        return (
            self.lora_idx is None
            and self.embed_override is None
            and self.mrope_pos is None
            and self.cross_states is None
        )

    def pack(self) -> Tuple[np.ndarray, np.ndarray, Tuple[int, int, int, int]]:
        """Pack every per-tick dynamic array into ONE int32 vector and ONE
        float32 vector. Rationale: to_device() issues ~20 small host->device
        transfers; on a tunneled TPU each costs ~2-4ms, putting the scheduler
        tick at ~70ms against a ~9ms device step (round-2 measurement). One
        concatenated transfer each makes the host side O(1) dispatches.
        ModelRunner._unpack_fb re-slices with the same static layout
        (T, B, maxP, NQB) — slicing inside jit is free."""
        from semi_pd_tpu.ops.attention.ragged_paged_attention import (
            make_attn_meta_host,
        )

        T, B, maxP = self.T, self.B, self.maxP
        if self.mode == ForwardMode.DECODE:
            q_lens = np.ones(B, np.int32)
            q_lens[self._nr():] = 0
            qbs = 8
        else:
            q_lens = np.zeros(B, np.int32)
            q_lens[: self._nr()] = self.extend_lens
            qbs = 128
        bs, br, bq = make_attn_meta_host(q_lens, T, qbs)
        s = self.sampling
        ints = np.concatenate([
            self.input_ids, self.q_req_idx, self.q_pos, self.out_slots,
            self.page_table.reshape(-1), self.kv_lens, self.logits_idx,
            q_lens, self.kv_lens - q_lens, bs, br, bq, s.top_k,
            np.array([self._nr()], np.int32),
        ])
        floats = np.concatenate([
            s.temperature, s.top_p, s.min_p, s.presence_penalty,
            s.frequency_penalty, s.repetition_penalty,
        ])
        return ints, floats, (T, B, maxP, len(bs))


def _sampling_arrays_np(reqs: List[Req], B: int) -> SamplingArrays:
    def arr(f, dtype, pad):
        a = np.full(B, pad, dtype=dtype)
        for i, r in enumerate(reqs):
            a[i] = f(r.sampling_params)
        return a

    return SamplingArrays(
        temperature=arr(lambda s: s.temperature, np.float32, 0.0),
        top_k=arr(lambda s: s.top_k, np.int32, 0),
        top_p=arr(lambda s: s.top_p, np.float32, 1.0),
        min_p=arr(lambda s: s.min_p, np.float32, 0.0),
        presence_penalty=arr(lambda s: s.presence_penalty, np.float32, 0.0),
        frequency_penalty=arr(lambda s: s.frequency_penalty, np.float32, 0.0),
        repetition_penalty=arr(lambda s: s.repetition_penalty, np.float32, 1.0),
    )


def _sampling_arrays(reqs: List[Req], B: int) -> SamplingArrays:
    return SamplingArrays(*[jnp.asarray(a) for a in _sampling_arrays_np(reqs, B)])




def _cross_arrays(reqs: List[Req], B: int):
    """Mllama cross-attention staging: stack per-request projected vision
    states (padded to the max Nv in batch); zero cross_len = no image."""
    if not any(getattr(r, "cross_states", None) is not None for r in reqs):
        return None, None, None
    Nv = max(
        r.cross_states.shape[0] for r in reqs
        if getattr(r, "cross_states", None) is not None
    )
    H = next(
        r.cross_states.shape[1] for r in reqs
        if getattr(r, "cross_states", None) is not None
    )
    cs = np.zeros((B, Nv, H), np.float32)
    cl = np.zeros(B, np.int32)
    cf = np.zeros(B, np.int32)
    for i, r in enumerate(reqs):
        st = getattr(r, "cross_states", None)
        if st is not None:
            cs[i, : st.shape[0]] = st
            cl[i] = st.shape[0]
            cf[i] = getattr(r, "cross_from", 0)
    return cs, cl, cf

def _page_table_block(
    reqs: List[Req], B: int, maxP: int, page_table_host: np.ndarray
) -> np.ndarray:
    pt = np.zeros((B, maxP), dtype=np.int32)
    for i, r in enumerate(reqs):
        row = page_table_host[r.req_slot]
        n = min(maxP, len(r.pages))
        pt[i, :n] = row[:n]
    return pt


def build_extend_batch(
    admitted: List[Tuple[Req, int]],
    page_table_host: np.ndarray,
    page_size: int,
    t_buckets: Sequence[int],
    b_buckets: Sequence[int],
    p_buckets: Sequence[int],
) -> HostBatch:
    """Admitted = [(req, n_extend_tokens)]; page lists in req.pages already
    cover prefilled_len + n_extend (allocator ran in the scheduler)."""
    reqs = [r for r, _ in admitted]
    lens = [n for _, n in admitted]
    total = sum(lens)
    T = bucket_of(total, t_buckets)
    B = bucket_of(len(reqs), b_buckets)
    need_pages = max(
        ((r.prefilled_len + n + page_size - 1) // page_size
         for r, n in admitted),
        default=1,  # empty rank block (DP-attention): all-padding batch
    )
    maxP = bucket_of(need_pages, p_buckets)

    input_ids = np.zeros(T, np.int32)
    q_req_idx = np.zeros(T, np.int32)
    q_pos = np.zeros(T, np.int32)
    out_slots = np.zeros(T, np.int32)
    kv_lens = np.zeros(B, np.int32)
    logits_idx = np.zeros(B, np.int32)

    lora_idx = None
    if any(getattr(r, "lora_id", 0) for r in reqs):
        lora_idx = np.zeros(T, np.int32)
    embed_override = embed_mask = None
    if any(getattr(r, "mm_embeds", None) is not None for r in reqs):
        H = next(
            r.mm_embeds.shape[1] for r in reqs
            if getattr(r, "mm_embeds", None) is not None
        )
        embed_override = np.zeros((T, H), np.float32)
        embed_mask = np.zeros(T, bool)

    mrope = None
    if any(getattr(r, "mrope_pos", None) is not None for r in reqs):
        mrope = np.zeros((T, 3), np.int32)

    t = 0
    for i, (r, n) in enumerate(admitted):
        if lora_idx is not None:
            lora_idx[t : t + n] = r.lora_id
        if mrope is not None:
            mp = getattr(r, "mrope_pos", None)
            for j in range(n):
                pos = r.prefilled_len + j
                if mp is not None and pos < len(mp):
                    mrope[t + j] = mp[pos]
                else:
                    mrope[t + j] = pos + getattr(r, "mrope_delta", 0)
        if embed_override is not None and getattr(r, "mm_embeds", None) is not None:
            # rows of this chunk covering prompt positions [start, start+n)
            for j in range(n):
                pos = r.prefilled_len + j
                k = r.mm_positions.get(pos) if r.mm_positions else None
                if k is not None:
                    embed_override[t + j] = r.mm_embeds[k]
                    embed_mask[t + j] = True
        start = r.prefilled_len
        toks = r.input_ids[start : start + n]
        input_ids[t : t + n] = toks
        q_req_idx[t : t + n] = i
        q_pos[t : t + n] = np.arange(start, start + n, dtype=np.int32)
        # slot = page[pos // P] * P + pos % P
        pos = np.arange(start, start + n)
        pages_arr = np.asarray(r.pages, dtype=np.int32)
        out_slots[t : t + n] = pages_arr[pos // page_size] * page_size + pos % page_size
        kv_lens[i] = start + n
        logits_idx[i] = t + n - 1
        t += n

    cs, cl, cf = _cross_arrays(reqs, B)
    hb = HostBatch(
        mode=ForwardMode.EXTEND, reqs=reqs, extend_lens=lens,
        input_ids=input_ids, q_req_idx=q_req_idx, q_pos=q_pos,
        out_slots=out_slots,
        page_table=_page_table_block(reqs, B, maxP, page_table_host),
        kv_lens=kv_lens, logits_idx=logits_idx,
        sampling=_sampling_arrays_np(reqs, B), T=T, B=B, maxP=maxP,
        lora_idx=lora_idx, mrope_pos=mrope, embed_override=embed_override,
        embed_mask=embed_mask, cross_states=cs, cross_len=cl, cross_from=cf,
    )
    return hb


def build_decode_batch(
    reqs: List[Req],
    page_table_host: np.ndarray,
    page_size: int,
    b_buckets: Sequence[int],
    p_buckets: Sequence[int],
    lag: int = 0,
) -> HostBatch:
    """One new token per request; the token to embed is the last sampled one.
    Pages for the new token were allocated by the scheduler already.

    ``lag=1`` builds the batch one step AHEAD of host bookkeeping (overlap
    scheduling: the previous step's sampled tokens haven't been read back;
    input_ids placeholders are replaced by the device token array — the role
    of the reference's future-token-ids trick, tp_worker_overlap_thread.py:44)."""
    B = bucket_of(len(reqs), b_buckets)
    T = B
    need_pages = max(
        ((r.kv_len + lag + page_size) // page_size for r in reqs),
        default=1,  # empty rank block (DP-attention)
    )
    maxP = bucket_of(need_pages, p_buckets)

    input_ids = np.zeros(T, np.int32)
    q_req_idx = np.zeros(T, np.int32)
    q_pos = np.zeros(T, np.int32)
    out_slots = np.zeros(T, np.int32)
    kv_lens = np.zeros(B, np.int32)
    logits_idx = np.arange(B, dtype=np.int32)

    lora_idx = None
    if any(getattr(r, "lora_id", 0) for r in reqs):
        lora_idx = np.zeros(T, np.int32)

    mrope = None
    if any(getattr(r, "mrope_pos", None) is not None for r in reqs):
        mrope = np.zeros((T, 3), np.int32)

    for i, r in enumerate(reqs):
        if lora_idx is not None:
            lora_idx[i] = r.lora_id
        pos = r.kv_len + lag  # writing token at this index (0-based)
        if mrope is not None:
            mrope[i] = pos + getattr(r, "mrope_delta", 0)
        if lag == 0:
            input_ids[i] = r.output_ids[-1] if r.output_ids else r.input_ids[-1]
        q_req_idx[i] = i
        q_pos[i] = pos
        out_slots[i] = r.pages[pos // page_size] * page_size + pos % page_size
        kv_lens[i] = pos + 1

    cs, cl, cf = _cross_arrays(reqs, B)
    return HostBatch(
        mode=ForwardMode.DECODE, reqs=list(reqs),  # snapshot: caller's list mutates
        input_ids=input_ids, q_req_idx=q_req_idx, q_pos=q_pos,
        out_slots=out_slots,
        page_table=_page_table_block(reqs, B, maxP, page_table_host),
        kv_lens=kv_lens, logits_idx=logits_idx,
        sampling=_sampling_arrays_np(reqs, B), T=T, B=B, maxP=maxP,
        lora_idx=lora_idx, mrope_pos=mrope,
        cross_states=cs, cross_len=cl, cross_from=cf,
    )


def build_spec_verify_batch(
    reqs: List[Req],
    drafts: List[List[int]],
    gamma: int,
    page_table_host: np.ndarray,
    page_size: int,
    b_buckets: Sequence[int],
    p_buckets: Sequence[int],
) -> Tuple[HostBatch, np.ndarray, np.ndarray]:
    """Speculative verify batch: each request contributes exactly gamma+1
    query rows = [last sampled token, draft_1..draft_d, padding...]. Returns
    (HostBatch, drafts_padded [B, gamma], draft_lens [B]). Padding rows write
    to the dump page and their outputs are ignored on device.

    Reference analog: ForwardMode.TARGET_VERIFY batches
    (forward_batch_info.py:53-110)."""
    B = bucket_of(len(reqs), b_buckets)
    W = gamma + 1
    T = B * W
    need_pages = max(
        (r.kv_len + 1 + len(d) + page_size - 1) // page_size + 1
        for r, d in zip(reqs, drafts)
    )
    maxP = bucket_of(need_pages, p_buckets)

    input_ids = np.zeros(T, np.int32)
    q_req_idx = np.zeros(T, np.int32)
    q_pos = np.zeros(T, np.int32)
    out_slots = np.zeros(T, np.int32)
    kv_lens = np.zeros(B, np.int32)
    logits_idx = np.arange(T, dtype=np.int32)
    drafts_padded = np.full((B, gamma), -1, np.int32)
    draft_lens = np.zeros(B, np.int32)

    for i, (r, d) in enumerate(zip(reqs, drafts)):
        base = i * W
        last_tok = r.output_ids[-1] if r.output_ids else r.input_ids[-1]
        window = [last_tok] + list(d)
        start_pos = r.kv_len
        for j in range(W):
            row = base + j
            q_req_idx[row] = i
            if j < len(window):
                input_ids[row] = window[j]
                pos = start_pos + j
            else:
                input_ids[row] = 0
                pos = start_pos + len(window) - 1  # harmless duplicate pos
            q_pos[row] = pos
            out_slots[row] = (
                r.pages[pos // page_size] * page_size + pos % page_size
                if j < len(window) else 0  # dump page
            )
        kv_lens[i] = start_pos + len(window)
        drafts_padded[i, : len(d)] = d
        draft_lens[i] = len(d)

    hb = HostBatch(
        mode=ForwardMode.EXTEND, reqs=list(reqs),
        extend_lens=[W] * len(reqs),
        input_ids=input_ids, q_req_idx=q_req_idx, q_pos=q_pos,
        out_slots=out_slots,
        page_table=_page_table_block(reqs, B, maxP, page_table_host),
        kv_lens=kv_lens, logits_idx=logits_idx,
        sampling=_sampling_arrays_np(reqs, B), T=T, B=B, maxP=maxP,
    )
    return hb, drafts_padded, draft_lens


def build_tree_verify_batch(
    reqs: List[Req],
    tree,  # speculative.tree.TreeTemplate
    page_table_host: np.ndarray,
    page_size: int,
    b_buckets: Sequence[int],
    p_buckets: Sequence[int],
) -> HostBatch:
    """EAGLE-tree verify batch: every request contributes N rows, one per
    tree node in BFS order. Node i occupies KV slot (kv_len + i) but its
    ROPE position is (kv_len + depth(i)) — q_pos carries rope, mask_pos the
    slot order, win_base the window start (see speculative/tree.py and the
    spec_anc mask in the attention backends). Pages covering kv_len + N
    positions must already be allocated. input_ids row 0 holds the last
    committed token; the other rows are substituted on device by the fused
    draft phase (eagle_tree_round)."""
    N = tree.num_nodes
    B = bucket_of(len(reqs), b_buckets)
    T = B * N
    need_pages = max(
        (r.kv_len + N + page_size - 1) // page_size + 1 for r in reqs
    )
    maxP = bucket_of(need_pages, p_buckets)

    input_ids = np.zeros(T, np.int32)
    q_req_idx = np.zeros(T, np.int32)
    q_pos = np.zeros(T, np.int32)
    mask_pos = np.zeros(T, np.int32)
    out_slots = np.zeros(T, np.int32)
    kv_lens = np.zeros(B, np.int32)
    win_base = np.zeros(B, np.int32)
    logits_idx = np.arange(T, dtype=np.int32)

    for i, r in enumerate(reqs):
        rbase = i * N
        start = r.kv_len
        input_ids[rbase] = r.output_ids[-1] if r.output_ids else r.input_ids[-1]
        for j in range(N):
            row = rbase + j
            q_req_idx[row] = i
            q_pos[row] = start + int(tree.depths[j])
            mask_pos[row] = start + j
            pos = start + j
            out_slots[row] = (
                r.pages[pos // page_size] * page_size + pos % page_size
            )
        kv_lens[i] = start + N
        win_base[i] = start

    return HostBatch(
        mode=ForwardMode.EXTEND, reqs=list(reqs),
        extend_lens=[N] * len(reqs),
        input_ids=input_ids, q_req_idx=q_req_idx, q_pos=q_pos,
        out_slots=out_slots,
        page_table=_page_table_block(reqs, B, maxP, page_table_host),
        kv_lens=kv_lens, logits_idx=logits_idx,
        sampling=_sampling_arrays_np(reqs, B), T=T, B=B, maxP=maxP,
        mask_pos=mask_pos, win_base=win_base,
    )
