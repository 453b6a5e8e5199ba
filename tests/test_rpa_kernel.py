"""Pallas ragged paged attention vs jnp reference (interpret mode on CPU).

Reference test analog: test/srt/test_triton_attention_kernels.py — optimized
attention kernels validated against the framework-native baseline."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semi_pd_tpu.ops.attention.ragged_paged_attention import (
    ragged_paged_attention,
)
from semi_pd_tpu.ops.attention.reference import ragged_paged_attention_reference
from semi_pd_tpu.runtime.forward_batch import build_attn_meta


def _setup(rng, B, q_lens, kv_lens, Hq=4, Hkv=2, D=32, page_size=8, L=2,
           layer=1, shuffle_pages=False):
    """Random cache + page tables for B seqs with given lens. Contiguous
    per-request page runs exercise the kernel's coalesced single-DMA path;
    shuffle_pages=True scatters them (the fragmented-pool gather path)."""
    maxP = max((kv + page_size - 1) // page_size for kv in kv_lens) + 1
    num_pages = B * maxP + 2
    S = num_pages * page_size
    kv_cache = jnp.asarray(rng.normal(size=(L, 2, S, Hkv, D)).astype(np.float32))

    perm = rng.permutation(np.arange(1, num_pages)) if shuffle_pages else None
    page_table = np.zeros((B, maxP), np.int32)
    next_page = 1
    for b in range(B):
        n = (kv_lens[b] + page_size - 1) // page_size
        run = np.arange(next_page, next_page + n)
        page_table[b, :n] = perm[run - 1] if shuffle_pages else run
        next_page += n

    T = sum(q_lens)
    q = jnp.asarray(rng.normal(size=(T, Hq, D)).astype(np.float32))
    q_req_idx = np.concatenate(
        [np.full(n, b, np.int32) for b, n in enumerate(q_lens)]
    ) if T else np.zeros(0, np.int32)
    q_pos = np.concatenate(
        [np.arange(kv_lens[b] - q_lens[b], kv_lens[b], dtype=np.int32)
         for b in range(B)]
    ) if T else np.zeros(0, np.int32)

    return q, kv_cache, jnp.asarray(page_table), jnp.asarray(q_req_idx), \
        jnp.asarray(q_pos), jnp.asarray(np.asarray(kv_lens, np.int32)), layer, page_size


def _compare(rng, B, q_lens, kv_lens, pad_T=None, pad_B=None, **kw):
    q, kvc, pt, qri, qp, kvl, layer, ps = _setup(rng, B, q_lens, kv_lens, **{
        k_: v_ for k_, v_ in kw.items()
        if k_ in ("Hq", "Hkv", "D", "page_size", "shuffle_pages")
    })
    ps = kw.get("page_size", 8)
    sw = kw.get("sliding_window")
    cap = kw.get("logit_cap")
    scale = 0.25

    T = q.shape[0]
    # Optional padding to emulate bucket shapes
    if pad_T and pad_T > T:
        q = jnp.pad(q, ((0, pad_T - T), (0, 0), (0, 0)))
        qri = jnp.pad(qri, (0, pad_T - T))
        qp = jnp.pad(qp, (0, pad_T - T))
    if pad_B and pad_B > B:
        pt = jnp.pad(pt, ((0, pad_B - B), (0, 0)))
        kvl = jnp.pad(kvl, (0, pad_B - B))

    Tt = q.shape[0]
    Bt = pt.shape[0]
    q_lens_np = np.zeros(Bt, np.int64)
    q_lens_np[:B] = q_lens
    kv_np = np.zeros(Bt, np.int64)
    kv_np[:B] = kv_lens
    meta = build_attn_meta(q_lens_np, kv_np, Tt)

    ref = ragged_paged_attention_reference(
        q, kvc, layer, pt, qri, qp, kvl, page_size=ps, scale=scale,
        logit_cap=cap, sliding_window=sw,
    )
    out = ragged_paged_attention(
        q, kvc, layer, pt, kvl, meta, page_size=ps, scale=scale,
        logit_cap=cap, sliding_window=sw, interpret=True,
        force_merged=kw.get("force_merged", False),
    )
    np.testing.assert_allclose(
        np.asarray(out)[:T], np.asarray(ref)[:T], rtol=2e-5, atol=2e-5
    )


def test_decode_batch():
    rng = np.random.default_rng(0)
    _compare(rng, B=4, q_lens=[1, 1, 1, 1], kv_lens=[9, 17, 8, 40])


def test_decode_padded_batch():
    rng = np.random.default_rng(1)
    _compare(rng, B=3, q_lens=[1, 1, 1], kv_lens=[5, 30, 12], pad_T=8, pad_B=8)


def test_extend_single_long():
    rng = np.random.default_rng(2)
    # One seq, long prefill spanning several q and kv blocks (QBLK=128/KVBLK=256)
    _compare(rng, B=1, q_lens=[300], kv_lens=[300])


def test_extend_mixed_with_prefix():
    rng = np.random.default_rng(3)
    # Chunked continuation: q covers only the tail of the kv history
    _compare(rng, B=3, q_lens=[40, 130, 7], kv_lens=[90, 130, 57], pad_T=256)


def test_gqa_and_mha():
    rng = np.random.default_rng(4)
    _compare(rng, B=2, q_lens=[20, 5], kv_lens=[33, 5], Hq=8, Hkv=8)
    _compare(rng, B=2, q_lens=[20, 5], kv_lens=[33, 5], Hq=8, Hkv=1)


def test_logit_cap_and_window():
    rng = np.random.default_rng(5)
    _compare(rng, B=2, q_lens=[1, 1], kv_lens=[70, 18], logit_cap=30.0)
    _compare(rng, B=2, q_lens=[60, 1], kv_lens=[60, 50], sliding_window=16)


def test_page_size_16():
    rng = np.random.default_rng(6)
    _compare(rng, B=2, q_lens=[1, 33], kv_lens=[77, 33], page_size=16)


def test_fragmented_page_table():
    """Scattered (non-consecutive) pages take the kernel's per-page DMA
    gather branch; consecutive runs take the coalesced single-DMA branch
    (_kv_block_copies). Both must match the reference — the other tests in
    this file allocate contiguous runs, so this is the gather branch's only
    coverage."""
    rng = np.random.default_rng(12)
    _compare(rng, B=4, q_lens=[1, 1, 1, 1], kv_lens=[9, 170, 65, 40],
             shuffle_pages=True)
    _compare(rng, B=3, q_lens=[40, 130, 7], kv_lens=[90, 130, 57],
             pad_T=256, shuffle_pages=True)
    _compare(rng, B=2, q_lens=[1, 1], kv_lens=[300, 18], D=64,
             force_merged=True, shuffle_pages=True)


def test_chunked_fragmented_page_table():
    """Gather branch of the chunked combined-pool kernel."""
    from semi_pd_tpu.ops.attention.ragged_paged_attention import (
        ragged_paged_attention_chunked,
    )

    rng = np.random.default_rng(13)
    Hq, Hkv, D, PS, L = 8, 4, 64, 8, 2
    q_lens, kv_lens = [1, 1, 20], [290, 5, 33]
    B = len(q_lens); T = sum(q_lens)
    n_pages = 64; S = n_pages * PS

    kv5 = rng.normal(size=(L, 2, S, Hkv, D)).astype(np.float32)
    q = jnp.asarray(rng.normal(size=(T, Hq, D)).astype(np.float32))
    perm = rng.permutation(np.arange(1, n_pages))
    pt = np.zeros((B, 48), np.int32); used = 0
    for b in range(B):
        n = -(-kv_lens[b] // PS)
        pt[b, :n] = perm[used:used + n]; used += n
    pt = jnp.asarray(pt)
    qri = jnp.asarray(np.repeat(np.arange(B), q_lens), jnp.int32)
    qp = jnp.asarray(
        np.concatenate([np.arange(k - ql, k) for ql, k in zip(q_lens, kv_lens)]),
        jnp.int32)
    kvl = jnp.asarray(kv_lens, jnp.int32)

    ref = ragged_paged_attention_reference(
        q, jnp.asarray(kv5), 1, pt, qri, qp, kvl, page_size=PS, scale=0.25,
    )
    CT = 2 * Hkv * D // 128
    kvc = np.swapaxes(kv5, 1, 2).reshape(L, S, CT, 128)
    meta = build_attn_meta(np.asarray(q_lens, np.int64),
                           np.asarray(kv_lens, np.int64), T)
    out = ragged_paged_attention_chunked(
        q, jnp.asarray(kvc), 1, pt, kvl, meta, page_size=PS,
        num_kv_heads=Hkv, head_dim=D, scale=0.25, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out)[:T], np.asarray(ref)[:T], rtol=2e-5, atol=2e-5)


def test_merged_kernel_matches_reference():
    """The merged-lane variant (D % 128 != 0 path on real TPUs) must agree
    with the reference backend; exercised in interpret mode with D=64."""
    import numpy as np
    rng = np.random.default_rng(11)
    for q_lens, kv_lens, hq, hkv in [
        ([20, 5, 9], [33, 5, 12], 4, 2),   # extend, GQA
        ([1, 1, 1, 1], [17, 3, 9, 30], 8, 2),  # decode
        ([16, 16], [16, 40], 2, 2),        # MHA
    ]:
        _compare(rng, B=len(q_lens), q_lens=q_lens, kv_lens=kv_lens,
                 Hq=hq, Hkv=hkv, D=64, force_merged=True)


def test_mla_chunked_kernel_matches_reference():
    """MLA (v_dim) path with the chunked latent layout: pool padded to an
    even 128-chunk count, V = latent prefix of K."""
    import numpy as np
    from semi_pd_tpu.ops.attention.reference import ragged_paged_attention_reference

    rng = np.random.default_rng(21)
    Hq, D, v_dim, PS, L = 4, 256, 128, 8, 2
    q_lens, kv_lens = [12, 3], [20, 7]
    B = len(q_lens)
    T = sum(q_lens)
    n_pages = 16
    S = n_pages * PS

    kvc = jnp.asarray(rng.normal(size=(L, 1, S, 1, D)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(T, Hq, D)).astype(np.float32))
    pt = np.zeros((B, 8), np.int32)
    used = 1
    for b in range(B):
        n = -(-kv_lens[b] // PS)
        pt[b, :n] = np.arange(used, used + n)
        used += n
    pt = jnp.asarray(pt)
    qri = jnp.asarray(np.repeat(np.arange(B), q_lens), jnp.int32)
    qp = jnp.asarray(
        np.concatenate([np.arange(k - ql, k) for ql, k in zip(q_lens, kv_lens)]),
        jnp.int32,
    )
    kvl = jnp.asarray(kv_lens, jnp.int32)

    ref = ragged_paged_attention_reference(
        q, kvc, 1, pt, qri, qp, kvl, page_size=PS, scale=0.2, v_dim=v_dim,
    )
    meta = build_attn_meta(np.asarray(q_lens, np.int64),
                           np.asarray(kv_lens, np.int64), T)
    out = ragged_paged_attention(
        q, kvc, 1, pt, kvl, meta, page_size=PS, scale=0.2, v_dim=v_dim,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out)[:T], np.asarray(ref)[:T], rtol=2e-5, atol=2e-5
    )


def test_chunked_combined_pool_matches_reference():
    """Chunked combined pool [L, S, CT, 128] (TPU fast path for D<128):
    kernel in interpret mode and the reference-backend conversion both match
    the plain 5D reference."""
    import numpy as np
    from semi_pd_tpu.ops.attention.ragged_paged_attention import (
        ragged_paged_attention_chunked,
    )

    rng = np.random.default_rng(31)
    Hq, Hkv, D, PS, L = 8, 4, 64, 8, 2
    q_lens, kv_lens = [20, 5, 1], [33, 5, 9]
    B = len(q_lens); T = sum(q_lens)
    n_pages = 16; S = n_pages * PS

    kv5 = rng.normal(size=(L, 2, S, Hkv, D)).astype(np.float32)
    q = jnp.asarray(rng.normal(size=(T, Hq, D)).astype(np.float32))
    pt = np.zeros((B, 8), np.int32); used = 1
    for b in range(B):
        n = -(-kv_lens[b] // PS); pt[b, :n] = np.arange(used, used + n); used += n
    pt = jnp.asarray(pt)
    qri = jnp.asarray(np.repeat(np.arange(B), q_lens), jnp.int32)
    qp = jnp.asarray(
        np.concatenate([np.arange(k - ql, k) for ql, k in zip(q_lens, kv_lens)]),
        jnp.int32)
    kvl = jnp.asarray(kv_lens, jnp.int32)

    ref = ragged_paged_attention_reference(
        q, jnp.asarray(kv5), 1, pt, qri, qp, kvl, page_size=PS, scale=0.25,
    )

    # same data in chunked layout: [L, S, CT, 128], K chunks then V chunks
    CT = 2 * Hkv * D // 128
    kvc = np.swapaxes(kv5, 1, 2).reshape(L, S, CT, 128)
    meta = build_attn_meta(np.asarray(q_lens, np.int64),
                           np.asarray(kv_lens, np.int64), T)
    out = ragged_paged_attention_chunked(
        q, jnp.asarray(kvc), 1, pt, kvl, meta, page_size=PS,
        num_kv_heads=Hkv, head_dim=D, scale=0.25, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out)[:T], np.asarray(ref)[:T], rtol=2e-5, atol=2e-5)


def test_spec_tree_mask_matches_reference():
    """Speculation-tree ancestor masks (spec_anc + win_base): the Pallas
    kernels (aligned and merged) must agree with the reference backend on a
    tree-verify-shaped batch where each request's last N kv slots form the
    tree window."""
    from semi_pd_tpu.speculative.tree import build_tree_template

    tree = build_tree_template((3, 2))  # N = 10 nodes
    N = tree.num_nodes
    rng = np.random.default_rng(12)
    for Hq, Hkv, D, merged in [(4, 2, 32, False), (4, 2, 64, True)]:
        B = 2
        prefix = [23, 9]
        kv_lens = [p + N for p in prefix]
        q, kvc, pt, qri, _, kvl, layer, ps = _setup(
            rng, B, [N] * B, kv_lens, Hq=Hq, Hkv=Hkv, D=D
        )
        # slot-order mask positions: base + node index
        mask_pos = jnp.asarray(np.concatenate(
            [np.arange(p, p + N, dtype=np.int32) for p in prefix]
        ))
        win_base = jnp.asarray(np.asarray(prefix, np.int32))
        meta = build_attn_meta(
            np.full(B, N, np.int64), np.asarray(kv_lens, np.int64), B * N
        )
        ref = ragged_paged_attention_reference(
            q, kvc, layer, pt, qri, mask_pos, kvl, page_size=ps, scale=0.25,
            spec_anc=tree.anc_bits, win_base=win_base,
        )
        out = ragged_paged_attention(
            q, kvc, layer, pt, kvl, meta, page_size=ps, scale=0.25,
            interpret=True, force_merged=merged,
            spec_anc=tree.anc_bits, win_base=win_base,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )
        if D == 64:  # chunked combined-pool layout carries the tree mask too
            from semi_pd_tpu.ops.attention.ragged_paged_attention import (
                ragged_paged_attention_chunked,
            )

            L, _, S, _, _ = kvc.shape
            CT = 2 * Hkv * D // 128
            kv_chunked = jnp.asarray(
                np.swapaxes(np.asarray(kvc), 1, 2).reshape(L, S, CT, 128))
            outc = ragged_paged_attention_chunked(
                q, kv_chunked, layer, pt, kvl, meta, page_size=ps,
                num_kv_heads=Hkv, head_dim=D, scale=0.25, interpret=True,
                spec_anc=tree.anc_bits, win_base=win_base,
            )
            np.testing.assert_allclose(
                np.asarray(outc), np.asarray(ref), rtol=2e-5, atol=2e-5
            )


def test_chunked_stream_decode_matches_reference():
    """Cross-request streaming decode kernel (stream=True): one kv block
    stream over the whole batch, NBUF-deep; must match the 5D reference on
    a decode batch with mixed kv lengths spanning 1..several kv blocks."""
    import numpy as np
    from semi_pd_tpu.ops.attention.ragged_paged_attention import (
        ragged_paged_attention_chunked,
    )

    rng = np.random.default_rng(33)
    Hq, Hkv, D, PS, L = 8, 4, 64, 8, 2
    # decode: q_len == 1 for every request; kv lens straddle KVBLK=16
    q_lens = [1, 1, 1, 1, 1]
    kv_lens = [33, 5, 16, 48, 9]
    B = len(q_lens); T = sum(q_lens)
    n_pages = 32; S = n_pages * PS

    kv5 = rng.normal(size=(L, 2, S, Hkv, D)).astype(np.float32)
    q = jnp.asarray(rng.normal(size=(T, Hq, D)).astype(np.float32))
    pt = np.zeros((B, 8), np.int32); used = 1
    for b in range(B):
        n = -(-kv_lens[b] // PS); pt[b, :n] = np.arange(used, used + n); used += n
    pt = jnp.asarray(pt)
    qri = jnp.asarray(np.repeat(np.arange(B), q_lens), jnp.int32)
    qp = jnp.asarray(np.asarray(kv_lens, np.int64) - 1, jnp.int32)
    kvl = jnp.asarray(kv_lens, jnp.int32)

    ref = ragged_paged_attention_reference(
        q, jnp.asarray(kv5), 1, pt, qri, qp, kvl, page_size=PS, scale=0.25,
    )

    CT = 2 * Hkv * D // 128
    kvc = np.swapaxes(kv5, 1, 2).reshape(L, S, CT, 128)
    meta = build_attn_meta(np.asarray(q_lens, np.int64),
                           np.asarray(kv_lens, np.int64), T)
    out = ragged_paged_attention_chunked(
        q, jnp.asarray(kvc), 1, pt, kvl, meta, page_size=PS,
        num_kv_heads=Hkv, head_dim=D, scale=0.25, interpret=True,
        kv_block=16, stream=True,
    )
    np.testing.assert_allclose(
        np.asarray(out)[:T], np.asarray(ref)[:T], rtol=2e-5, atol=2e-5)


def test_aligned_and_mla_stream_decode_match_reference(monkeypatch):
    """RPA_DECODE_STREAM on the aligned (D=128) and MLA layouts: decode
    batches with kv lens spanning several kv blocks must match the 5D
    reference / MLA reference."""
    import numpy as np
    from semi_pd_tpu.ops.attention.ragged_paged_attention import (
        ragged_paged_attention,
    )

    monkeypatch.setenv("RPA_DECODE_STREAM", "1")
    monkeypatch.setenv("RPA_STREAM_NBUF", "3")

    rng = np.random.default_rng(41)
    # aligned: D = 128
    Hq, Hkv, D, PS, L = 8, 4, 128, 8, 2
    q_lens = [1, 1, 1, 1]
    kv_lens = [33, 16, 48, 7]
    B = len(q_lens); T = B
    S = 32 * PS
    kv5 = rng.normal(size=(L, 2, S, Hkv, D)).astype(np.float32)
    q = jnp.asarray(rng.normal(size=(T, Hq, D)).astype(np.float32))
    pt = np.zeros((B, 8), np.int32); used = 1
    for b in range(B):
        n = -(-kv_lens[b] // PS); pt[b, :n] = np.arange(used, used + n); used += n
    pt = jnp.asarray(pt)
    qri = jnp.asarray(np.arange(B), jnp.int32)
    qp = jnp.asarray(np.asarray(kv_lens) - 1, jnp.int32)
    kvl = jnp.asarray(kv_lens, jnp.int32)
    meta = build_attn_meta(np.asarray(q_lens, np.int64),
                           np.asarray(kv_lens, np.int64), T)
    ref = ragged_paged_attention_reference(
        q, jnp.asarray(kv5), 1, pt, qri, qp, kvl, page_size=PS, scale=0.125,
    )
    out = ragged_paged_attention(
        q, jnp.asarray(kv5), 1, pt, kvl, meta, page_size=PS, scale=0.125,
        kv_block=16, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out)[:T], np.asarray(ref)[:T], rtol=2e-5, atol=2e-5)

    # MLA: latent pool [L, 1, S, 1, 512], v_dim 256
    Dlat, v_dim = 512, 256
    kv_mla = rng.normal(size=(L, 1, S, 1, Dlat)).astype(np.float32) * 0.3
    q_mla = jnp.asarray(
        rng.normal(size=(T, Hq, Dlat)).astype(np.float32) * 0.3)
    ref_m = ragged_paged_attention_reference(
        q_mla, jnp.asarray(kv_mla), 1, pt, qri, qp, kvl, page_size=PS,
        scale=0.125, v_dim=v_dim,
    )
    out_m = ragged_paged_attention(
        q_mla, jnp.asarray(kv_mla), 1, pt, kvl, meta, page_size=PS,
        scale=0.125, v_dim=v_dim, kv_block=16, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_m)[:T], np.asarray(ref_m)[:T], rtol=2e-4, atol=2e-4)


def test_packed_decode_kernel_matches_reference():
    """Multi-request packed decode cell (ragged_paged_attention_chunked_
    packed): RPB requests share one cell, each with its own block-diagonal
    KV section. Ragged lens, shuffled pages, both RPB settings."""
    import numpy as np
    from semi_pd_tpu.ops.attention.ragged_paged_attention import (
        ragged_paged_attention_chunked_packed,
    )

    rng = np.random.default_rng(31)
    Hq, Hkv, D, PS, L = 8, 2, 64, 8, 2
    kv_lens = [33, 5, 12, 64, 17, 3, 9]  # B=7 (odd: exercises pad rows)
    B = len(kv_lens)
    n_pages = sum(-(-k // PS) for k in kv_lens) + 2
    S = n_pages * PS
    kv5 = rng.normal(size=(L, 2, S, Hkv, D)).astype(np.float32)
    q = jnp.asarray(rng.normal(size=(B, Hq, D)).astype(np.float32))
    perm = rng.permutation(np.arange(1, n_pages))
    maxP = max(-(-k // PS) for k in kv_lens) + 1
    pt = np.zeros((B, maxP), np.int32); used = 0
    for b in range(B):
        n = -(-kv_lens[b] // PS)
        pt[b, :n] = perm[used:used + n]; used += n
    pt = jnp.asarray(pt)
    qri = jnp.asarray(np.arange(B), jnp.int32)
    qp = jnp.asarray(np.asarray(kv_lens) - 1, jnp.int32)
    kvl = jnp.asarray(kv_lens, jnp.int32)

    ref = ragged_paged_attention_reference(
        q, jnp.asarray(kv5), 1, pt, qri, qp, kvl, page_size=PS, scale=0.25,
    )
    CT = 2 * Hkv * D // 128
    kvc = jnp.asarray(np.swapaxes(kv5, 1, 2).reshape(L, S, CT, 128))
    # both score-tile schedules: batched-diagonal (default) and full-width
    # masked (RPA_PACKED_DIAG=0 kill switch)
    import os as _os
    for diag in ("1", "0"):
        _os.environ["RPA_PACKED_DIAG"] = diag
        try:
            for rpb in (2, 4):
                out = ragged_paged_attention_chunked_packed(
                    q, kvc, 1, pt, kvl, page_size=PS, num_kv_heads=Hkv,
                    head_dim=D, scale=0.25, rpb=rpb, kv_block=rpb * 16,
                    interpret=True,
                )
                np.testing.assert_allclose(
                    np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5,
                    err_msg=f"rpb={rpb} diag={diag}")
        finally:
            _os.environ.pop("RPA_PACKED_DIAG", None)


def test_packed_aligned_kernel_matches_reference():
    """Aligned-layout packed decode (ragged_paged_attention_packed,
    v_dim=None): ragged lens, shuffled pages, both rpb settings."""
    import numpy as np
    from semi_pd_tpu.ops.attention.ragged_paged_attention import (
        ragged_paged_attention_packed,
    )

    rng = np.random.default_rng(41)
    Hq, Hkv, D, PS, L = 4, 2, 32, 8, 2
    kv_lens = [33, 5, 12, 64, 17]
    B = len(kv_lens)
    n_pages = sum(-(-k // PS) for k in kv_lens) + 2
    S = n_pages * PS
    kv5 = jnp.asarray(rng.normal(size=(L, 2, S, Hkv, D)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(B, Hq, D)).astype(np.float32))
    perm = rng.permutation(np.arange(1, n_pages))
    maxP = max(-(-k // PS) for k in kv_lens) + 1
    pt = np.zeros((B, maxP), np.int32); used = 0
    for b in range(B):
        n = -(-kv_lens[b] // PS)
        pt[b, :n] = perm[used:used + n]; used += n
    pt = jnp.asarray(pt)
    kvl = jnp.asarray(kv_lens, jnp.int32)
    ref = ragged_paged_attention_reference(
        q, kv5, 1, pt, jnp.asarray(np.arange(B), jnp.int32),
        jnp.asarray(np.asarray(kv_lens) - 1, jnp.int32), kvl,
        page_size=PS, scale=0.25)
    for rpb in (2, 4):
        out = ragged_paged_attention_packed(
            q, kv5, 1, pt, kvl, page_size=PS, scale=0.25, rpb=rpb,
            kv_block=rpb * 16, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5,
            err_msg=f"rpb={rpb}")


def test_packed_mla_kernel_matches_reference():
    """MLA packed decode: latent pool, V = latent prefix of K."""
    import numpy as np
    from semi_pd_tpu.ops.attention.ragged_paged_attention import (
        ragged_paged_attention_packed,
    )

    rng = np.random.default_rng(43)
    Hq, Dlat, VDIM, PS, L = 4, 256, 128, 8, 2
    kv_lens = [20, 7, 31]
    B = len(kv_lens)
    n_pages = sum(-(-k // PS) for k in kv_lens) + 2
    S = n_pages * PS
    kvc = jnp.asarray(
        rng.normal(size=(L, 1, S, 1, Dlat)).astype(np.float32) * 0.3)
    q = jnp.asarray(rng.normal(size=(B, Hq, Dlat)).astype(np.float32) * 0.3)
    maxP = max(-(-k // PS) for k in kv_lens) + 1
    pt = np.zeros((B, maxP), np.int32); used = 1
    for b in range(B):
        n = -(-kv_lens[b] // PS)
        pt[b, :n] = np.arange(used, used + n); used += n
    pt = jnp.asarray(pt)
    kvl = jnp.asarray(kv_lens, jnp.int32)
    ref = ragged_paged_attention_reference(
        q, kvc, 1, pt, jnp.asarray(np.arange(B), jnp.int32),
        jnp.asarray(np.asarray(kv_lens) - 1, jnp.int32), kvl,
        page_size=PS, scale=0.2, v_dim=VDIM)
    out = ragged_paged_attention_packed(
        q, kvc, 1, pt, kvl, page_size=PS, scale=0.2, v_dim=VDIM, rpb=2,
        kv_block=32, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_packed_sliding_window_matches_reference():
    """Packed decode with a sliding window (gemma2/mistral-class): chunks
    before the group's earliest window start are skipped; per-row masks
    handle ragged window starts inside a request group."""
    import numpy as np
    from semi_pd_tpu.ops.attention.ragged_paged_attention import (
        ragged_paged_attention_chunked_packed, ragged_paged_attention_packed,
    )

    rng = np.random.default_rng(51)
    Hq, Hkv, D, PS, L, W = 8, 2, 64, 8, 2, 24
    kv_lens = [70, 15, 40, 9]
    B = len(kv_lens)
    n_pages = sum(-(-k // PS) for k in kv_lens) + 2
    S = n_pages * PS
    kv5 = rng.normal(size=(L, 2, S, Hkv, D)).astype(np.float32)
    q = jnp.asarray(rng.normal(size=(B, Hq, D)).astype(np.float32))
    maxP = max(-(-k // PS) for k in kv_lens) + 1
    pt = np.zeros((B, maxP), np.int32); used = 1
    for b in range(B):
        n = -(-kv_lens[b] // PS)
        pt[b, :n] = np.arange(used, used + n); used += n
    pt = jnp.asarray(pt)
    kvl = jnp.asarray(kv_lens, jnp.int32)
    ref = ragged_paged_attention_reference(
        q, jnp.asarray(kv5), 1, pt, jnp.asarray(np.arange(B), jnp.int32),
        jnp.asarray(np.asarray(kv_lens) - 1, jnp.int32), kvl,
        page_size=PS, scale=0.25, sliding_window=W)
    CT = 2 * Hkv * D // 128
    kvc = jnp.asarray(np.swapaxes(kv5, 1, 2).reshape(L, S, CT, 128))
    out_c = ragged_paged_attention_chunked_packed(
        q, kvc, 1, pt, kvl, page_size=PS, num_kv_heads=Hkv, head_dim=D,
        scale=0.25, sliding_window=W, rpb=2, kv_block=32, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out_c), np.asarray(ref), rtol=2e-5, atol=2e-5,
        err_msg="chunked")
    out_a = ragged_paged_attention_packed(
        q, jnp.asarray(kv5), 1, pt, kvl, page_size=PS, scale=0.25,
        sliding_window=W, rpb=2, kv_block=32, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out_a), np.asarray(ref), rtol=2e-5, atol=2e-5,
        err_msg="aligned")
