"""Kernel microbenchmark: Pallas ragged paged attention vs the jnp/XLA
reference backend at flagship serving shapes (SURVEY.md §7.3 bullet 2:
"must beat XLA-default attention and hit memory-bound roofline on decode";
reference analog: flashinfer_backend.py:454 decode path).

Run on the TPU: `python bench_kernels.py`. Prints one JSON line per case:
  {"case": "decode", "pallas_ms": ..., "xla_ms": ..., "speedup": ...,
   "hbm_gbps": ..., "roofline_pct": ...}
and writes the full list to BENCH_KERNELS.json.

Decode attention is memory-bound: the floor is reading every live KV byte
once. roofline_pct = (bytes_touched / time) / HBM_PEAK. v5e (TPU v5 lite)
HBM peak = 819 GB/s.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from semi_pd_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from semi_pd_tpu.ops.attention.ragged_paged_attention import (
    ragged_paged_attention,
)
from semi_pd_tpu.ops.attention.reference import (
    ragged_paged_attention_reference,
)
from semi_pd_tpu.runtime.forward_batch import build_attn_meta

HBM_PEAK_GBPS = 819.0  # v5e
MXU_PEAK_TFLOPS = 197.0  # v5e bf16 (197 TFLOP/s per chip)
PAGE = int(os.environ.get("BENCH_PAGE", "16"))
HQ, HKV, D = 32, 8, 64  # 1B-class flagship (llama-3.2-1B shapes)
SCALE = D ** -0.5


def attn_flops(q_lens, kv_len, Hq, D, Dv=None):
    """Causal ragged attention FLOPs: per (q row, visible kv slot, q head),
    one QK^T dot (2D) and one PV accumulate (2Dv). Row at in-sequence
    position p (absolute q_pos = kv_len - n + p) sees q_pos + 1 slots."""
    Dv = Dv if Dv is not None else D
    visible = 0
    for n in q_lens:
        # sum over rows of (kv_len - n + j + 1) for j in [0, n)
        visible += n * (kv_len - n + 1) + n * (n - 1) // 2
    return visible * Hq * 2 * (D + Dv)


def make_case(B, kv_len, q_lens, seed=0, chunked=False, shuffled=False,
              page=None):
    """One shared KV pool + batch metadata for both backends. chunked=True
    uses the production pool layout for sub-lane head dims ([L, S, CT, 128],
    K chunks then V chunks per slot — what the runner picks for D=64).
    shuffled=True scatters the page table (fragmented-pool gather path;
    default contiguous runs take the coalesced single-DMA path, matching
    the min-heap allocator's steady state)."""
    rng = np.random.default_rng(seed)
    page = page or PAGE
    pages_per_req = -(-kv_len // page)
    num_pages = 1 + B * pages_per_req
    S = num_pages * page
    if chunked:
        CT = 2 * HKV * D // 128
        kv_cache = jnp.asarray(
            rng.normal(size=(1, S, CT, 128)).astype(np.float32), jnp.bfloat16
        )
    else:
        kv_cache = jnp.asarray(
            rng.normal(size=(1, 2, S, HKV, D)).astype(np.float32), jnp.bfloat16
        )
    perm = (rng.permutation(np.arange(1, num_pages)) if shuffled
            else np.arange(1, num_pages))
    page_table = np.zeros((B, pages_per_req), np.int32)
    for b in range(B):
        page_table[b] = perm[b * pages_per_req + np.arange(pages_per_req)]
    T = int(sum(q_lens))
    q = jnp.asarray(rng.normal(size=(T, HQ, D)).astype(np.float32), jnp.bfloat16)
    kv_lens = np.full(B, kv_len, np.int32)
    q_req_idx = np.repeat(np.arange(B, dtype=np.int32), q_lens)
    q_pos = np.concatenate(
        [np.arange(kv_len - n, kv_len, dtype=np.int32) for n in q_lens]
    )
    meta = build_attn_meta(np.asarray(q_lens, np.int64), kv_lens.astype(np.int64), T)
    return dict(
        q=q, kv=kv_cache, pt=jnp.asarray(page_table),
        kv_lens=jnp.asarray(kv_lens), meta=meta,
        q_req_idx=jnp.asarray(q_req_idx), q_pos=jnp.asarray(q_pos),
        bytes_touched=B * kv_len * 2 * HKV * D * 2,  # K+V bf16 read once
    )


def timeit(fn, iters=5, warmup=2):
    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.monotonic()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.monotonic() - t0) / iters


# Kernel invocations per jitted dispatch: each host->device dispatch through
# the tunneled attachment costs ~4ms — far more than the kernel itself — so
# the kernel is CHAINED inside one program (q depends on the previous
# output, defeating CSE) and the per-call time is the slope between two
# chain lengths (subtracting the dispatch overhead exactly).
CHAIN = 16


def chained_slope(long_fn, short_fn, args, iters, name=""):
    """Per-call time as the slope between two chain lengths. The attachment
    intermittently stalls a dispatch for tens of ms; a stall inside t_short
    makes the slope <= 0 (observed: one 0.0ms reading -> a 655520%-of-
    roofline artifact). Re-measure until the slope is positive-sane; if the
    retries exhaust, warn and report the row as suspect instead of silently
    clamping (ADVICE r4: an absurd roofline_pct row must be distinguishable
    from a real measurement)."""
    slope, sane = 1e-7, False
    for _ in range(4):
        t_long = timeit(lambda: long_fn(*args), iters)
        t_short = timeit(lambda: short_fn(*args), iters)
        slope = (t_long - t_short) / (CHAIN - 1)
        if slope > 0.05 * t_long / CHAIN:
            sane = True
            break
    if not sane:
        print(f"# WARNING {name}: slope retries exhausted without a sane "
              f"positive slope ({slope * 1e3:.4f} ms) — row marked suspect",
              file=sys.stderr)
    return max(slope, 1e-7), sane


# Raw-output tolerance for cross-backend/cross-schedule asserts: both sides
# compute in bf16 (f32 accumulation) over ~0.3-magnitude outputs, so 0.02
# absolute bounds genuine divergence while absorbing rounding-order noise.
RAW_TOL = 0.02


def run_case(name, B, kv_len, q_lens, iters=5, chunked=False, kv_block=None,
             shuffled=False, page=None):
    page = page or PAGE
    c = make_case(B, kv_len, q_lens, chunked=chunked, shuffled=shuffled,
                  page=page)

    # The chain carries BOTH q and the kv pool: each iteration writes this
    # step's K/V into the pool slots before reading (exactly the serving
    # write+read pattern, via the real paged_attention layer entry). Without
    # the loop-carried kv, XLA hoists the whole KV gather out of the scan
    # and the slope only measures the attention math.
    from semi_pd_tpu.layers import attention as attention_backend

    T = int(sum(q_lens))
    rng = np.random.default_rng(7)
    k_new0 = jnp.asarray(
        rng.normal(size=(T, HKV, D)).astype(np.float32), jnp.bfloat16)
    v_new0 = k_new0 * 0.5
    out_slots = []
    pos = 0
    pt_np = np.asarray(c["pt"])
    for b, n in enumerate(q_lens):
        for j in range(n):
            p = kv_len - n + j
            out_slots.append(pt_np[b][p // page] * page + p % page)
    out_slots = jnp.asarray(np.asarray(out_slots, np.int32))

    from types import SimpleNamespace

    from semi_pd_tpu.layers.attention import paged_attention

    def mk(backend):
        attention_backend.set_attention_backend(backend)

        def make_fn(reps):
            def fn(q0, kv, k0, v0, pt, kv_lens, meta, q_req_idx, q_pos, slots):
                fb = SimpleNamespace(
                    page_table=pt, kv_lens=kv_lens, attn_meta=meta,
                    q_req_idx=q_req_idx, q_pos=q_pos, mask_pos=None,
                    win_base=None, out_slots=slots, kv_scales=None,
                )

                def body(carry, _):
                    q, kv, k_new, v_new = carry
                    out, kv = paged_attention(
                        q, k_new, v_new, kv, 0, fb, page_size=page,
                        scale=SCALE, kv_block=kv_block,
                    )
                    q = q0 + 1e-3 * out.astype(q0.dtype)
                    k_new = k0 + 1e-3 * out[:, :HKV].astype(k0.dtype)
                    v_new = v0 + 1e-3 * out[:, :HKV].astype(v0.dtype)
                    return (q, kv, k_new, v_new), None

                (q, kv, _, _), _ = jax.lax.scan(
                    body, (q0, kv, k0, v0), None, length=reps)
                return q

            return jax.jit(fn)

        args = (c["q"], c["kv"], k_new0, v_new0, c["pt"], c["kv_lens"],
                c["meta"], c["q_req_idx"], c["q_pos"], out_slots)
        long_fn, short_fn = make_fn(CHAIN), make_fn(1)
        slope, sane = chained_slope(long_fn, short_fn, args, iters,
                                    name=f"{name}:{backend}")
        # Raw attention output of ONE unchained call for the correctness
        # assert (ADVICE r4: the chained q0 + 1e-3*out carry attenuated
        # divergence 1000x, making the old assert vacuous).
        def raw(q, kv, k0, v0, pt, kv_lens, meta, q_req_idx, q_pos, slots):
            fb = SimpleNamespace(
                page_table=pt, kv_lens=kv_lens, attn_meta=meta,
                q_req_idx=q_req_idx, q_pos=q_pos, mask_pos=None,
                win_base=None, out_slots=slots, kv_scales=None,
            )
            out, _ = paged_attention(
                q, k0, v0, kv, 0, fb, page_size=page, scale=SCALE,
                kv_block=kv_block,
            )
            return out

        raw_out = np.asarray(jax.jit(raw)(*args), np.float32)
        return slope, sane, raw_out

    t_pallas, sane_p, out_pallas = mk("pallas")
    t_xla, sane_x, out_xla = mk("reference")
    attention_backend.set_attention_backend("pallas")
    # cross-backend correctness on the raw (unattenuated) attention output
    err = float(np.abs(out_pallas - out_xla).max())
    assert err < RAW_TOL, f"{name}: pallas/xla diverge (max abs err {err})"

    gbps = c["bytes_touched"] / t_pallas / 1e9
    row = {
        "case": name,
        "B": B, "kv_len": kv_len, "T": int(sum(q_lens)),
        "pallas_ms": round(t_pallas * 1e3, 3),
        "xla_ms": round(t_xla * 1e3, 3),
        "speedup": round(t_xla / t_pallas, 2),
        "hbm_gbps": round(gbps, 1),
        "roofline_pct": round(100 * gbps / HBM_PEAK_GBPS, 1),
        "max_err": round(err, 5),
    }
    if not (sane_p and sane_x):
        row["slope_suspect"] = True
    if int(sum(q_lens)) != B:  # extend: compute-shaped — report MXU util
        fl = attn_flops(q_lens, kv_len, HQ, D)
        row["mxu_pct"] = round(
            100 * fl / t_pallas / (MXU_PEAK_TFLOPS * 1e12), 1)
    print(json.dumps(row), flush=True)
    _checkpoint_rows(row)
    return row


# Incremental checkpoint: the attachment can wedge mid-sweep for minutes
# (observed round-5: a 15-min stall on the ragged-extend case lost every
# completed row because the file was only written at exit).
_ROWS_CKPT = []


def _checkpoint_rows(row):
    if row.get("roofline_pct", 0) > 100:
        # A reading past the physical HBM peak is measurement noise (a
        # chained slope of two dispatch-jitter-dominated timings on a
        # degraded attachment — observed 340%-of-roofline rows during a
        # 515s-warmup window), never a real kernel time.
        row["slope_suspect"] = True
        print(f"# WARNING {row['case']}: {row['roofline_pct']}% of roofline "
              f"is physically impossible — row marked suspect",
              file=sys.stderr)
    _ROWS_CKPT.append(row)
    try:
        with open("BENCH_KERNELS.partial.json", "w") as f:
            json.dump(_ROWS_CKPT, f, indent=1)
    except OSError:
        pass


def run_case_packed(name, B, kv_len, rpb, iters=5, kv_block=1024, page=None):
    """Multi-request packed decode cell (VERDICT r3 #2: measure packing
    even if negative). Chained-slope timing identical to run_case (KV
    scatter included) so rows compare 1:1 with the blocked kernel's."""
    from semi_pd_tpu.ops.attention.ragged_paged_attention import (
        ragged_paged_attention_chunked,
        ragged_paged_attention_chunked_packed,
    )
    from semi_pd_tpu.runtime.forward_batch import build_attn_meta as _bam

    page = page or PAGE
    q_lens = [1] * B
    c = make_case(B, kv_len, q_lens, chunked=True, page=page)
    rng = np.random.default_rng(7)
    k_new0 = jnp.asarray(
        rng.normal(size=(B, HKV, D)).astype(np.float32), jnp.bfloat16)
    v_new0 = k_new0 * 0.5
    pt_np = np.asarray(c["pt"])
    slots = jnp.asarray(np.asarray(
        [pt_np[b][(kv_len - 1) // page] * page + (kv_len - 1) % page
         for b in range(B)], np.int32))
    CT = 2 * HKV * D // 128

    def make_fn(reps, packed):
        def fn(q0, kv, k0, v0, pt, kv_lens, meta, slots):
            def body(carry, _):
                q, kv, k_new, v_new = carry
                val = jnp.concatenate(
                    [k_new.reshape(B, HKV * D // 128, 128),
                     v_new.reshape(B, HKV * D // 128, 128)], axis=1)
                kv = kv.at[0, slots].set(val.astype(kv.dtype))
                if packed:
                    out = ragged_paged_attention_chunked_packed(
                        q, kv, 0, pt, kv_lens, page_size=page,
                        num_kv_heads=HKV, head_dim=D, scale=SCALE,
                        rpb=rpb, kv_block=kv_block)
                else:
                    # force the BLOCKED schedule: since round 4 the driver
                    # defaults eligible decode to the packed kernel, which
                    # would make this baseline compare packed to packed
                    out = ragged_paged_attention_chunked(
                        q, kv, 0, pt, kv_lens, meta, page_size=page,
                        num_kv_heads=HKV, head_dim=D, scale=SCALE,
                        kv_block=kv_block, stream=False, force_blocked=True)
                q = q0 + 1e-3 * out.astype(q0.dtype)
                k_new = k0 + 1e-3 * out[:, :HKV].astype(k0.dtype)
                v_new = v0 + 1e-3 * out[:, :HKV].astype(v0.dtype)
                return (q, kv, k_new, v_new), None

            (q, kv, _, _), _ = jax.lax.scan(
                body, (q0, kv, k0, v0), None, length=reps)
            return q

        return jax.jit(fn)

    meta = c["meta"]
    args = (c["q"], c["kv"], k_new0, v_new0, c["pt"], c["kv_lens"], meta,
            slots)
    res = {}
    suspect = False
    for packed in (True, False):
        long_fn, short_fn = make_fn(CHAIN, packed), make_fn(1, packed)
        slope, sane = chained_slope(
            long_fn, short_fn, args, iters,
            name=f"{name}:{'packed' if packed else 'blocked'}")
        suspect = suspect or not sane
        res[packed] = slope

    # Raw single-call correctness: packed vs blocked on the identical
    # scattered pool (ADVICE r4 — see run_case).
    def raw(packed):
        def fn(q, kv):
            if packed:
                return ragged_paged_attention_chunked_packed(
                    q, kv, 0, c["pt"], c["kv_lens"], page_size=page,
                    num_kv_heads=HKV, head_dim=D, scale=SCALE,
                    rpb=rpb, kv_block=kv_block)
            return ragged_paged_attention_chunked(
                q, kv, 0, c["pt"], c["kv_lens"], meta, page_size=page,
                num_kv_heads=HKV, head_dim=D, scale=SCALE,
                kv_block=kv_block, stream=False, force_blocked=True)

        return np.asarray(jax.jit(fn)(c["q"], c["kv"]), np.float32)

    err = float(np.abs(raw(True) - raw(False)).max())
    assert err < RAW_TOL, f"{name}: packed/blocked diverge (max abs err {err})"
    t_packed, t_blocked = res[True], res[False]
    gbps = c["bytes_touched"] / t_packed / 1e9
    row = {
        "case": name, "B": B, "kv_len": kv_len, "T": B, "rpb": rpb,
        "pallas_ms": round(t_packed * 1e3, 3),
        "blocked_ms": round(t_blocked * 1e3, 3),
        "speedup": round(t_blocked / t_packed, 2),
        "hbm_gbps": round(gbps, 1),
        "roofline_pct": round(100 * gbps / HBM_PEAK_GBPS, 1),
        "max_err": round(err, 5),
    }
    if suspect:
        row["slope_suspect"] = True
    print(json.dumps(row), flush=True)
    _checkpoint_rows(row)
    return row


def run_case_mla(name, B, kv_len, iters=5, kv_block=None):
    """Absorbed-MLA decode (DeepSeek latent KV): pool [1, 1, S, 1, 768]
    (kv_lora 512 + rope 64, lane-padded), v = 512-dim latent prefix.
    Same chained-slope timing as run_case, with the latent row of each
    request rewritten every iteration so the pool stays loop-carried.

    The scatter runs BEFORE the kernel read — the serving order
    (layers/attention.py paged_attention_mla writes latent_new, then
    attends). The round-4 sweep measured write-AFTER-read, which forces XLA
    to materialize a copy of the whole loop-carried pool for the in-flight
    kernel read (~0.13 ms = one 100 MB pool copy at roofline) — a harness
    artifact, not a serving cost; BENCH_PACKED3_r4's 53.9% harness had no
    such hazard."""
    Dlat, VDIM, HQ_MLA = 768, 512, 16
    rng = np.random.default_rng(11)
    pages_per_req = -(-kv_len // PAGE)
    num_pages = 1 + B * pages_per_req
    S = num_pages * PAGE
    kv = jnp.asarray(
        rng.normal(size=(1, 1, S, 1, Dlat)).astype(np.float32) * 0.3,
        jnp.bfloat16)
    pt = np.zeros((B, pages_per_req), np.int32)
    for b in range(B):
        pt[b] = 1 + b * pages_per_req + np.arange(pages_per_req)
    pt = jnp.asarray(pt)
    kv_lens_np = np.full(B, kv_len, np.int32)
    kv_lens = jnp.asarray(kv_lens_np)
    q0 = jnp.asarray(
        rng.normal(size=(B, HQ_MLA, Dlat)).astype(np.float32) * 0.3,
        jnp.bfloat16)
    meta = build_attn_meta(np.ones(B, np.int64), kv_lens_np.astype(np.int64), B)
    slots = jnp.asarray(
        np.asarray([pt[b][(kv_len - 1) // PAGE] * PAGE + (kv_len - 1) % PAGE
                    for b in range(B)], np.int32))
    q_req_idx = jnp.arange(B, dtype=jnp.int32)
    q_pos = jnp.full((B,), kv_len - 1, jnp.int32)

    lat0 = jnp.asarray(
        rng.normal(size=(B, Dlat)).astype(np.float32) * 0.3, jnp.bfloat16)

    def make_fn(reps, use_pallas):
        def fn(q0, kv, lat0):
            def body(carry, _):
                q, kv, lat = carry
                # serving order: write this step's latent, THEN attend
                kv = kv.at[0, 0, slots, 0, :].set(lat.astype(kv.dtype))
                if use_pallas:
                    out = ragged_paged_attention(
                        q, kv, 0, pt, kv_lens, meta, page_size=PAGE,
                        scale=SCALE, v_dim=VDIM, kv_block=kv_block)
                else:
                    out = ragged_paged_attention_reference(
                        q, kv, 0, pt, q_req_idx, q_pos, kv_lens,
                        page_size=PAGE, scale=SCALE, v_dim=VDIM)
                lat = lat0 + 1e-3 * jnp.pad(
                    out.mean(axis=1), ((0, 0), (0, Dlat - VDIM))
                ).astype(lat0.dtype)
                q = q0 + 1e-3 * jnp.pad(
                    out, ((0, 0), (0, 0), (0, Dlat - VDIM))).astype(q0.dtype)
                return (q, kv, lat), None

            (q, kv, lat), _ = jax.lax.scan(body, (q0, kv, lat0), None,
                                           length=reps)
            return q

        return jax.jit(fn)

    res = {}
    suspect = False
    for tag, use_pallas in (("pallas", True), ("xla", False)):
        long_fn, short_fn = make_fn(CHAIN, use_pallas), make_fn(1, use_pallas)
        res[tag], sane = chained_slope(
            long_fn, short_fn, (q0, kv, lat0), iters, name=f"{name}:{tag}")
        suspect = suspect or not sane

    # Raw single-call correctness (ADVICE r4 — see run_case).
    def raw(use_pallas):
        def fn(q, kv):
            if use_pallas:
                return ragged_paged_attention(
                    q, kv, 0, pt, kv_lens, meta, page_size=PAGE,
                    scale=SCALE, v_dim=VDIM, kv_block=kv_block)
            return ragged_paged_attention_reference(
                q, kv, 0, pt, q_req_idx, q_pos, kv_lens,
                page_size=PAGE, scale=SCALE, v_dim=VDIM)

        return np.asarray(jax.jit(fn)(q0, kv), np.float32)

    err = float(np.abs(raw(True) - raw(False)).max())
    assert err < RAW_TOL, f"{name}: pallas/xla diverge (max abs err {err})"

    bytes_touched = B * kv_len * Dlat * 2  # latent read once, bf16
    gbps = bytes_touched / res["pallas"] / 1e9
    row = {
        "case": name, "B": B, "kv_len": kv_len, "T": B,
        "pallas_ms": round(res["pallas"] * 1e3, 3),
        "xla_ms": round(res["xla"] * 1e3, 3),
        "speedup": round(res["xla"] / res["pallas"], 2),
        "hbm_gbps": round(gbps, 1),
        "roofline_pct": round(100 * gbps / HBM_PEAK_GBPS, 1),
        "max_err": round(err, 5),
    }
    if suspect:
        row["slope_suspect"] = True
    print(json.dumps(row), flush=True)
    _checkpoint_rows(row)
    return row


def run_case_aligned(name, B, kv_len, iters=5):
    """Aligned-layout (D=128) decode: pool [1, 2, S, Hkv, 128], the layout
    the runner picks for lane-multiple head dims. Times the default routing
    (packed since r4) against the forced-blocked kernel via the trace-time
    RPA_DECODE_PACKED switch — the BENCH_PACKED3_r4 aligned rows, made
    reproducible in the standard sweep."""
    HKV_A, D_A, HQ_A = 8, 128, 32
    rng = np.random.default_rng(13)
    pages_per_req = -(-kv_len // PAGE)
    num_pages = 1 + B * pages_per_req
    S = num_pages * PAGE
    kv = jnp.asarray(
        rng.normal(size=(1, 2, S, HKV_A, D_A)).astype(np.float32) * 0.3,
        jnp.bfloat16)
    pt = np.zeros((B, pages_per_req), np.int32)
    for b in range(B):
        pt[b] = 1 + b * pages_per_req + np.arange(pages_per_req)
    pt = jnp.asarray(pt)
    kv_lens_np = np.full(B, kv_len, np.int32)
    kv_lens = jnp.asarray(kv_lens_np)
    q0 = jnp.asarray(
        rng.normal(size=(B, HQ_A, D_A)).astype(np.float32) * 0.3,
        jnp.bfloat16)
    meta = build_attn_meta(np.ones(B, np.int64), kv_lens_np.astype(np.int64), B)
    slots = jnp.asarray(
        np.asarray([pt[b][(kv_len - 1) // PAGE] * PAGE + (kv_len - 1) % PAGE
                    for b in range(B)], np.int32))
    scale = D_A ** -0.5

    def make_fn(reps):
        def fn(q0, kv):
            def body(carry, _):
                q, kv = carry
                out = ragged_paged_attention(
                    q, kv, 0, pt, kv_lens, meta, page_size=PAGE, scale=scale)
                kv = kv.at[0, 0, slots, :, :].set(
                    out[:, :HKV_A].astype(kv.dtype))
                q = q0 + 1e-3 * out.astype(q0.dtype)
                return (q, kv), None

            (q, kv), _ = jax.lax.scan(body, (q0, kv), None, length=reps)
            return q

        return jax.jit(fn)

    res = {}
    suspect = False
    prev_packed = os.environ.get("RPA_DECODE_PACKED")  # restore user value
    for tag, packed in (("packed", "1"), ("blocked", "0")):
        os.environ["RPA_DECODE_PACKED"] = packed  # read at trace time
        try:
            long_fn, short_fn = make_fn(CHAIN), make_fn(1)
            res[tag], sane = chained_slope(
                long_fn, short_fn, (q0, kv), iters, name=f"{name}:{tag}")
            suspect = suspect or not sane
            # Raw single unchained call under this routing for the
            # correctness assert (ADVICE r4 — see run_case).
            res[tag + "_out"] = np.asarray(jax.jit(
                lambda q, kv: ragged_paged_attention(
                    q, kv, 0, pt, kv_lens, meta, page_size=PAGE, scale=scale)
            )(q0, kv), np.float32)
        finally:
            if prev_packed is None:
                os.environ.pop("RPA_DECODE_PACKED", None)
            else:
                os.environ["RPA_DECODE_PACKED"] = prev_packed
    err = float(np.abs(res["packed_out"] - res["blocked_out"]).max())
    assert err < RAW_TOL, f"{name}: packed/blocked diverge (max abs err {err})"
    bytes_touched = B * kv_len * 2 * HKV_A * D_A * 2
    gbps = bytes_touched / res["packed"] / 1e9
    row = {
        "case": name, "B": B, "kv_len": kv_len, "T": B,
        "pallas_ms": round(res["packed"] * 1e3, 3),
        "blocked_ms": round(res["blocked"] * 1e3, 3),
        "speedup": round(res["blocked"] / res["packed"], 2),
        "hbm_gbps": round(gbps, 1),
        "roofline_pct": round(100 * gbps / HBM_PEAK_GBPS, 1),
        "max_err": round(err, 5),
    }
    if suspect:
        row["slope_suspect"] = True
    print(json.dumps(row), flush=True)
    _checkpoint_rows(row)
    return row


def main():
    # Pay the tunnel's first-D2H up front so it doesn't pollute timings.
    t0 = time.monotonic()
    jax.device_get(jnp.zeros((8,), jnp.int32) + 1)
    print(f"# tunnel warmup {time.monotonic()-t0:.1f}s", file=sys.stderr)

    rows = []
    # Decode: one token per request (memory-bound; roofline target).
    # "chunked" = the production pool layout for D=64 (one K+V DMA per page)
    rows.append(run_case("decode_b64_kv1024", 64, 1024, [1] * 64))
    rows.append(run_case("decode_b64_kv1024_chunked", 64, 1024, [1] * 64,
                         chunked=True))
    rows.append(run_case("decode_b64_kv1024_chunked_kvb256", 64, 1024,
                         [1] * 64, chunked=True, kv_block=256))
    rows.append(run_case("decode_b128_kv2048_chunked", 128, 2048, [1] * 128,
                         chunked=True))
    rows.append(run_case("decode_b16_kv8192_chunked", 16, 8192, [1] * 16,
                         chunked=True))
    # Fragmented pool (shuffled page table): the per-page gather branch —
    # the floor the coalesced path lifts from.
    rows.append(run_case("decode_b16_kv8192_chunked_shuffled", 16, 8192,
                         [1] * 16, chunked=True, shuffled=True))
    # page_size escape hatch (VERDICT r3 #2): fewer/larger DMA issues per
    # KV block. Contiguous tables already coalesce page runs into one DMA
    # per block, so the shuffled (fragmented) rows are where page size can
    # move the issue count; the contiguous rows check for regressions.
    for ps in (32, 64):
        rows.append(run_case(f"decode_b16_kv8192_chunked_p{ps}", 16, 8192,
                             [1] * 16, chunked=True, page=ps))
        rows.append(run_case(
            f"decode_b16_kv8192_chunked_shuffled_p{ps}", 16, 8192,
            [1] * 16, chunked=True, shuffled=True, page=ps))
        rows.append(run_case(f"decode_b64_kv1024_chunked_p{ps}", 64, 1024,
                             [1] * 64, chunked=True, page=ps))
    # Cross-request streaming decode kernel (RPA_DECODE_STREAM): kv blocks
    # of the whole batch form one NBUF-deep DMA pipeline. Env is read at
    # trace time; each run_case builds fresh jits, so scoping it here works.
    os.environ["RPA_DECODE_STREAM"] = "1"
    try:
        for nbuf in ("4", "8"):
            os.environ["RPA_STREAM_NBUF"] = nbuf
            rows.append(run_case(
                f"decode_b64_kv1024_stream_n{nbuf}", 64, 1024, [1] * 64,
                chunked=True, kv_block=512))
            rows.append(run_case(
                f"decode_b128_kv2048_stream_n{nbuf}", 128, 2048, [1] * 128,
                chunked=True, kv_block=512))
        os.environ["RPA_STREAM_NBUF"] = "4"
        rows.append(run_case("decode_b16_kv8192_stream", 16, 8192, [1] * 16,
                             chunked=True, kv_block=1024))
    except Exception as e:  # keep the report even if the new path fails
        print(f"# stream cases failed: {e}", file=sys.stderr)
    finally:
        os.environ.pop("RPA_DECODE_STREAM", None)
        os.environ.pop("RPA_STREAM_NBUF", None)
    # Multi-request packed decode (the default serving schedule since r4)
    try:
        rows.append(run_case_packed(
            "decode_b16_kv8192_packed_rpb2", 16, 8192, 2))
        rows.append(run_case_packed(
            "decode_b64_kv1024_packed_rpb4", 64, 1024, 4))
    except Exception as e:
        print(f"# packed cases failed: {e}", file=sys.stderr)
    # Extend: chunked prefill continuation (512 new tokens on 1.5k history)
    rows.append(run_case("extend_b8_q256_kv2048", 8, 2048, [256] * 8))
    rows.append(run_case("extend_b8_q256_kv2048_chunked", 8, 2048, [256] * 8,
                         chunked=True))
    # Mixed ragged extend
    rows.append(run_case(
        "extend_ragged", 8, 1024, [512, 256, 128, 64, 384, 448, 192, 64]
    ))
    # Aligned-layout (D=128) packed vs blocked
    try:
        rows.append(run_case_aligned("decode_aligned_b16_kv4096", 16, 4096))
        rows.append(run_case_aligned("decode_aligned_b64_kv1024", 64, 1024))
    except Exception as e:
        print(f"# aligned cases failed: {e}", file=sys.stderr)
    # Absorbed-MLA decode (DeepSeek-V2-Lite latent shapes), blocked + stream
    try:
        rows.append(run_case_mla("decode_mla_b64_kv1024", 64, 1024))
        rows.append(run_case_mla("decode_mla_b16_kv4096", 16, 4096))
        os.environ["RPA_DECODE_STREAM"] = "1"
        rows.append(run_case_mla("decode_mla_b64_kv1024_stream", 64, 1024,
                                 kv_block=512))
    except Exception as e:
        print(f"# mla cases failed: {e}", file=sys.stderr)
    finally:
        os.environ.pop("RPA_DECODE_STREAM", None)
    with open("BENCH_KERNELS.json", "w") as f:
        json.dump(rows, f, indent=1)
    dec = [r for r in rows if r["case"].startswith("decode")]
    print(json.dumps({
        "metric": "pallas RPA decode roofline",
        "value": max(r["roofline_pct"] for r in dec),
        "unit": "% of v5e HBM peak",
        "min_speedup_vs_xla": min(
            r["speedup"] for r in rows if "blocked_ms" not in r),
    }))


if __name__ == "__main__":
    main()
