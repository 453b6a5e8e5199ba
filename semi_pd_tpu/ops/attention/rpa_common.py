"""Shared helpers for the ragged-paged-attention kernel family: host-side
work-list construction, the speculation-tree mask, and the paged KV block
DMA helper used by every schedule (blocked / packed / stream)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

class AttnMeta(NamedTuple):
    """Host-precomputed ragged-attention metadata (all int32 device arrays).

    q_lens/q_start: per sequence [B] — number of new (query) tokens and the
    absolute position of the first one. block_*: the query-block work list
    [NQB] (padded with seq = -1)."""

    q_lens: jax.Array
    q_start: jax.Array
    block_seq: jax.Array
    block_row: jax.Array
    block_qofs: jax.Array


def make_attn_meta_host(
    q_lens: np.ndarray, T: int, q_block_size: int
) -> tuple:
    """Build the work list on the host (numpy). Returns (block_seq,
    block_row, block_qofs) padded to the static bucket size
    ``num_q_blocks(T, B, q_block_size)``."""
    B = len(q_lens)
    nqb = num_q_blocks(T, B, q_block_size)
    block_seq = np.full(nqb, -1, np.int32)
    block_row = np.zeros(nqb, np.int32)
    block_qofs = np.zeros(nqb, np.int32)
    i = 0
    row = 0
    for b in range(B):
        n = int(q_lens[b])
        for ofs in range(0, n, q_block_size):
            block_seq[i] = b
            block_row[i] = row + ofs
            block_qofs[i] = ofs
            i += 1
        row += n
    return block_seq, block_row, block_qofs


def num_q_blocks(T: int, B: int, q_block_size: int) -> int:
    """Static upper bound on work-list length: every sequence contributes at
    most one partial block; full blocks are bounded by T // q_block_size."""
    return min(T // q_block_size + B, (T + q_block_size - 1) // q_block_size + B)


def _spec_tree_mask(valid, spec_anc, win_base, q_abs, kv_pos):
    """Refine the causal mask with the static speculation-tree ancestor
    bitmasks (speculative/tree.py): kv slots inside the window
    [win_base, win_base + W) are visible to a q row only if the row's
    ancestor bit for that slot is set. q_abs must be SLOT-ORDER positions
    (BFS node index relative to win_base), which makes plain causal a
    superset of the tree mask outside the window."""
    W = len(spec_anc)
    win_q = q_abs - win_base
    # int32 select-chain gather of the static mask table (no vector gather
    # on Mosaic); trees are capped at 31 nodes so masks stay positive i32,
    # and the bit test lowers to shift+and+cmp (trunci-to-i1 is unsupported).
    bits = jnp.zeros(win_q.shape, jnp.int32)
    for idx, a in enumerate(spec_anc):
        bits = jnp.where(win_q == idx, jnp.int32(a), bits)
    win_kv = kv_pos - win_base
    in_win = (win_kv >= 0) & (win_kv < W)
    shift = jnp.clip(win_kv, 0, 31)
    tree_ok = (jax.lax.shift_right_logical(bits, shift) & 1) > 0
    return valid & (~in_win | tree_ok)


def _kv_block_copies(
    page_table_ref, bsafe, block_idx, ppb, page_size, specs, wait,
    block_first_ref=None,
):
    """Issue (wait=False) or await (wait=True) the KV-block gather.

    specs: list of (hbm_ref, row_base, dst_block_ref, sem) — one entry per
    pool component (K and V for the aligned layout, one combined row for the
    chunked layout, one latent row for MLA).

    Decode attention on this hardware is DMA-ISSUE-bound, not
    bandwidth-bound: bench_kernels measured ~150-230ns per page copy
    (page_size 16 → 32KB transfers take ~40ns of wire time), capping the
    per-page gather at ~19%% of HBM roofline. When the block's ppb pages are
    consecutive pool slots — the common case, since the allocator hands out
    runs and prefill allocates a request's pages at once — ONE copy of the
    whole KVBLK replaces ppb page copies. The predicate is recomputed from
    the scalar-prefetched page table on the wait side so start/wait branch
    identically (symmetric semaphore accounting, valid in interpret mode
    too, where semaphores count per-copy rather than per-byte)."""
    if ppb == 1:
        page = page_table_ref[bsafe, block_idx]
        for hbm, base, dst, sem in specs:
            src = hbm.at[pl.ds((0 if wait else base + page * page_size),
                               page_size)]
            cp = pltpu.make_async_copy(src, dst, sem)
            (cp.wait if wait else cp.start)()
        return
    if block_first_ref is not None:
        # Host-precomputed contiguity (round-5): the per-page scalar
        # read+compare loop below costs ~ppb x 100-200ns per cell — at
        # kv_block 512 / page 16 that is 32 scalar reads per cell, a real
        # share of the extend kernel's ~20us fixed per-cell cost. The
        # driver computes first-page-if-contiguous (-1 otherwise) from the
        # same page table in one fused XLA op.
        first = block_first_ref[bsafe, block_idx]
        contig = first >= 0
    else:
        first = page_table_ref[bsafe, block_idx * ppb]
        contig = page_table_ref[bsafe, block_idx * ppb + 1] == first + 1
        for p in range(2, ppb):
            contig &= page_table_ref[bsafe, block_idx * ppb + p] == first + p

    KVBLK = ppb * page_size

    @pl.when(contig)
    def _():
        for hbm, base, dst, sem in specs:
            src = hbm.at[pl.ds((0 if wait else base + first * page_size),
                               KVBLK)]
            cp = pltpu.make_async_copy(src, dst, sem)
            (cp.wait if wait else cp.start)()

    @pl.when(~contig)
    def _():
        for p in range(ppb):
            page = page_table_ref[bsafe, block_idx * ppb + p]
            for hbm, base, dst, sem in specs:
                src = hbm.at[pl.ds(
                    (0 if wait else base + page * page_size), page_size)]
                cp = pltpu.make_async_copy(
                    src, dst.at[pl.ds(p * page_size, page_size)], sem)
                (cp.wait if wait else cp.start)()

