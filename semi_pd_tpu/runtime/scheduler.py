"""Continuous-batching scheduler with phase-wise disaggregated computation.

This is the TPU re-derivation of Semi-PD's three mechanisms (SURVEY.md §0):

1. **Compute isolation without MPS.** The reference runs prefill/decode as OS
   processes under CUDA MPS SM-partitioning (engine.py:591-642). A TPU core
   runs one program at a time, so isolation is re-derived as a *cadence
   guarantee*: every tick dispatches the decode step first, then at most one
   prefill chunk whose size is adaptively bounded so
   ``t_decode + t_chunk <= decode_slo_ms``. The chunk budget is the
   SM-percentage-equivalent knob (ServerArgs.semi_pd_prefill_share /
   decode_slo_ms); a measured per-token prefill cost model (EWMA) converts
   the time budget to tokens.

2. **Unified storage for free.** Both phases are shapes of one jitted program
   over the same donated KV buffers (model_runner.py); there is no IPC
   (reference semi-pd-ipc/ipc.cpp + model_runner.py:346-624) because there is
   nothing to share across — one process, one HBM pool, one page table.

3. **Decode-owned admission.** The reference's asymmetric ZMQ protocol
   (P asks D for the next prefill batch, semi_pd_decode_scheduler.py:310;
   pre-allocated slots travel in GetNextPrefillBatchOutput io_struct.py:734)
   survives as the *algorithm*: the same PrefillAdder runs against the
   decode-owned allocator, slots/pages are pre-allocated before the prefill
   program runs, retracted decodes re-queue at the head
   (semi_pd_scheduler.py:52-56), and finished prefills merge into the running
   batch in FIFO order (semi_pd_decode_scheduler.py:339-377).

Colocated baseline mode (enable_semi_pd=False) reproduces the reference's
inherited SGLang loop (scheduler.py:540 event_loop_normal): prefill batches
are prioritized and may stall decode — the baseline our bench beats.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from collections import deque
from typing import Dict, List, Optional, Tuple

import numpy as np

from semi_pd_tpu.config.server_args import ServerArgs
from semi_pd_tpu.mem.chunk_cache import ChunkCache
from semi_pd_tpu.mem.radix_cache import RadixCache
from semi_pd_tpu.runtime.batch import (
    HostBatch,
    build_decode_batch,
    build_extend_batch,
    build_spec_verify_batch,
)
from semi_pd_tpu.runtime.forward_batch import ForwardMode
from semi_pd_tpu.runtime.model_runner import ModelRunner
from semi_pd_tpu.runtime.req import FinishReason, Req
from semi_pd_tpu.runtime.schedule_policy import PrefillAdder, sort_waiting_queue

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class _RingEntry:
    """One dispatched step awaiting readback (see Scheduler._ring)."""

    kind: str  # "decode" | "extend"
    hb: HostBatch
    tokens: object  # device [B] i32
    logprobs: object  # device [B] f32
    epochs: List[int]
    admitted: Optional[List[Tuple[Req, int]]] = None  # extend only
    done_flags: Optional[List[bool]] = None  # extend only: prompt completed
    hidden: Optional[np.ndarray] = None  # EAGLE seed (sync path only)
    t_dispatch: float = 0.0  # monotonic dispatch time (watchdog autopsy)
    tk_vals: Optional[np.ndarray] = None  # [B, k] top-k logprobs (sync only)
    tk_ids: Optional[np.ndarray] = None  # [B, k] top-k token ids


class Scheduler:
    def __init__(self, server_args: ServerArgs, runner: ModelRunner):
        self.args = server_args
        self.runner = runner
        self.page_size = server_args.page_size

        self.waiting: deque[Req] = deque()
        self.running: List[Req] = []
        self.reqs_by_rid: Dict[str, Req] = {}

        alloc = runner.page_allocator
        if server_args.disable_radix_cache:
            self.tree_cache = ChunkCache(self.page_size, alloc.free)
        else:
            # Native C++ tree on the admission hot path (csrc/radix_tree.cpp);
            # pure-python fallback when no compiler is available.
            try:
                from semi_pd_tpu.mem.radix_native import NativeRadixCache

                self.tree_cache = NativeRadixCache(self.page_size, alloc.free)
            except RuntimeError:
                self.tree_cache = RadixCache(self.page_size, alloc.free)

        # Hierarchical (host) KV tier + async write controller
        self.host_cache = None
        self.hicache_ctl = None
        if server_args.enable_hierarchical_cache and not server_args.disable_radix_cache:
            from semi_pd_tpu.mem.hicache import HiCacheController, HostKVStore

            self.host_cache = HostKVStore(
                self.page_size, server_args.hicache_max_bytes
            )
            self.hicache_ctl = HiCacheController(
                self.host_cache, runner.split_pages,
                policy=server_args.hicache_write_policy,
            )

        # Bucket tables
        self.t_buckets = server_args.prefill_token_buckets
        self.b_buckets = server_args.decode_bs_buckets
        maxp = runner.req_pool.max_pages_per_req
        self.p_buckets = []
        p = 8
        while p < maxp:
            self.p_buckets.append(p)
            p *= 4
        self.p_buckets.append(maxp)

        # Cost model for semi-PD chunk sizing (EWMA, seconds). Prefill cost
        # is affine: chunk_time = overhead + cost_per_token * n — modeling
        # the fixed dispatch overhead separately keeps small chunks from
        # being overpriced per-token (which used to spiral the EWMA budget
        # down to a hard floor; observed 4x slowdown on hardware).
        self._prefill_cost_per_token = 50e-6
        self._prefill_overhead = 3e-3
        self._decode_cost = 5e-3
        self._readback_cost = 5e-3
        # Banked prefill interference allowance (seconds) — see
        # _prefill_chunk_budget. Seeded at one chunk-overhead so the first
        # chunk after a quiet period does not wait for the bank to fill.
        self._prefill_deficit = self._prefill_overhead
        # Injectable clock for the wall-based accrual (cadence tests drive
        # the controller on simulated time).
        self._now = time.monotonic
        self._last_budget_t = self._now()
        self._recent_prefill_time = 0.0
        # Full wall time of a decode-only flush cycle INCLUDING the readback
        # wait. With async dispatch the device executes during the readback
        # wait, so per-step wall times are meaningless (observed: decode
        # "cost" 0.7ms while real steps ran 40-80ms); the cycle is the unit
        # the client observes (depth tokens per cycle) and the unit the SLO
        # constrains.
        self._cycle_base = 30e-3
        # Slew-limited EWMA: the attachment intermittently stalls for
        # hundreds of ms (observed); one stalled cycle must not multiply a
        # cost estimate (a poisoned slope collapses the chunk budget and the
        # starved cycles that follow keep confirming it). Each observation
        # moves the estimate at most 2x / 0.5x.
        self._ewma = lambda old, new: 0.8 * old + 0.2 * min(
            max(new, 0.5 * old), 2.0 * old
        )

        # In-flight step ring: dispatched steps whose results have not been
        # read back. TPU-native generalization of the reference's overlap
        # thread + future-token-ids (tp_worker_overlap_thread.py:44-50,142):
        # decode step N+1 is dispatched chained to step N's still-on-device
        # sampled tokens, and results are read in ONE fused D2H transfer
        # every overlap_depth steps (D2H carries ~27ms fixed latency on
        # tunneled TPU attachments — reading per-step would dominate the
        # ~13ms step itself).
        self._ring: List[_RingEntry] = []
        # Extend entries held across one flush: their results (a sampled
        # token on final chunks only) are latency-insensitive, and reading
        # them with the decode tokens would make the blocking readback WAIT
        # for the chunk's device time. Held, the chunk executes under the
        # readback's D2H latency instead (split flush).
        self._held: List[_RingEntry] = []
        self._last_decode = None  # (hb, dev_tokens) of newest in-flight decode
        self._decode_lag = 0  # in-flight decode steps ahead of host kv state
        self._cycle_t0 = None  # dispatch time of the cycle's first entry
        self.overlap_depth = max(1, server_args.overlap_depth)
        self.enable_overlap = not server_args.disable_overlap_schedule
        if not self.enable_overlap:
            self.overlap_depth = 1
        # Adaptive ring depth: the static default (4) was tuned for one
        # attachment; the measured readback/step ratio varies 50x between a
        # local CPU device (~0 readback) and a tunneled TPU (~45ms readback,
        # ~1ms steps). _adapt_depth re-sizes after each accounted cycle.
        self._depth_floor = self.overlap_depth
        self._adaptive_depth = (
            server_args.adaptive_overlap_depth and self.enable_overlap
        )
        self._max_stall_s = (
            server_args.max_stall_ms / 1e3 if server_args.max_stall_ms
            else 4.0 * server_args.decode_slo_ms / 1e3
        )
        # Speculative decoding (NGRAM: runtime/speculative.py; EAGLE:
        # speculative/eagle.py fused program)
        self.spec_algo = server_args.speculative_algorithm
        if self.spec_algo == "NEXTN":
            # NextN/MTP (deepseek) rides the EAGLE round machinery; the
            # runner picked the NextN draft module by target architecture.
            self.spec_algo = "EAGLE"
        self.spec_gamma = (
            server_args.speculative_num_draft_tokens
            if self.spec_algo in ("NGRAM", "EAGLE") else 0
        )
        self.n_spec_steps = 0
        self.n_spec_accepted = 0

        # Stats
        self._last_dispatch_t = None  # monotonic time of newest dispatch
        self._last_flush_t = None  # monotonic time of newest readback
        self._last_stats_log = time.monotonic()
        self.n_finished = 0
        self._page_size_advised = False
        self.n_retracted = 0
        self.n_jump_tokens = 0
        # Reqs that emitted grammar-forced tokens without forwards; folded
        # into a KV back-fill extend at the top of the next tick (after the
        # engine has detokenized the produced pairs).
        self._refill_parked: List[Req] = []
        self.n_cached_prefix_tokens = 0
        self.n_prefill_tokens = 0
        self.n_decode_tokens = 0

        # DP-attention fast path (runner._build_dp_step_fns): the packed
        # step shards requests + the KV slot axis over "dp"; the masked /
        # penalty / speculative paths stay on the global-view GSPMD program,
        # which is still correct over the dp-sharded pool (just not local).
        self._step_packed = (
            runner.step_packed_dp if getattr(runner, "dp_attn", 1) > 1
            else runner.step_packed
        )

    # ================================================================ API
    def add_request(self, req: Req) -> None:
        if len(req.input_ids) >= self.runner.max_context_len:
            if self.args.allow_auto_truncate:
                # Keep the prompt tail (reference tokenizer_manager
                # allow_auto_truncate), leaving room for >= 1 new token.
                keep = self.runner.max_context_len - 1
                logger.warning(
                    "rid=%s prompt %d > context %d: truncated to last %d "
                    "tokens (--allow-auto-truncate)",
                    req.rid, len(req.input_ids), self.runner.max_context_len,
                    keep)
                req.input_ids = req.input_ids[-keep:]
                req.origin_prompt_len = len(req.input_ids)
            else:
                req.finish_reason = FinishReason.ABORT
                return
        self.reqs_by_rid[req.rid] = req
        self.waiting.append(req)

    def abort_request(self, rid: str) -> None:
        req = self.reqs_by_rid.get(rid)
        if req is None or req.finished:
            return
        req.finish_reason = FinishReason.ABORT
        if req in self.running:
            self.running.remove(req)
            self._release_finished(req)
        elif req in self.waiting:
            self.waiting.remove(req)
            if req.pages or req.req_slot is not None:
                self._release_finished(req)
        elif req in self._refill_parked:
            self._refill_parked.remove(req)
            self._release_finished(req)

    def has_work(self) -> bool:
        return bool(
            self.waiting or self.running or self._ring or self._held
            or self._refill_parked
        )

    def drain(self) -> None:
        """Read back any in-flight steps whose requests have all finished
        (their results are discards). Makes an idle scheduler truly idle."""
        if (self._ring or self._held) and not (
                self.running or self.waiting or self._refill_parked):
            self._flush_ring()

    def finish_stream_req(self, req: Req) -> None:
        """Release a request finished by a host-side condition (stop string
        found after detokenization)."""
        if req in self.running:
            self.running.remove(req)
            self._release_finished(req)

    # ================================================================ tick
    def tick(self) -> List[Tuple[Req, int]]:
        """One scheduler iteration. Returns (req, new_token) pairs produced
        this tick (token == -1 for non-final prefill chunks)."""
        now = time.monotonic()
        if (now - self._last_stats_log > self.args.decode_log_interval
                and self.running):
            # reference log_decode_stats (scheduler.py:925-980)
            alloc = self.runner.page_allocator
            total = alloc.usable_pages
            used = total - alloc.available_pages()
            logger.info(
                "decode stats: #running=%d #queue=%d kv=%.1f%% "
                "gen=%d prefill=%d cached=%d retracted=%d",
                len(self.running), len(self.waiting), 100 * used / max(total, 1),
                self.n_decode_tokens, self.n_prefill_tokens,
                self.n_cached_prefix_tokens, self.n_retracted,
            )
            self._last_stats_log = now
            # One-shot page-size advisory (VERDICT r4 #3: auto-selection
            # signal): with negligible measured prefix reuse, page 64 buys
            # ~10% decode bandwidth (BENCH_KERNELS *_p64 vs default rows)
            # and costs nothing; with reuse, sharing is quantized to page
            # granularity and 16 stays right.
            if (not self._page_size_advised and self.n_finished > 200
                    and self.page_size < 64
                    and not isinstance(self.tree_cache, ChunkCache)
                    and self.n_prefill_tokens > 10000
                    and self.n_cached_prefix_tokens
                    < 0.05 * self.n_prefill_tokens):
                self._page_size_advised = True
                logger.info(
                    "radix prefix hit-rate %.1f%% over %d finished requests "
                    "— little prefix reuse on this workload; --page-size 64 "
                    "(or 'auto' with --disable-radix-cache) measures ~10%% "
                    "more decode bandwidth on v5e",
                    100 * self.n_cached_prefix_tokens
                    / max(self.n_prefill_tokens, 1), self.n_finished,
                )
        self._fold_refill_parked()
        if self.args.enable_semi_pd:
            return self._tick_semi_pd()
        return self._tick_colocated()

    def _tick_colocated(self) -> List[Tuple[Req, int]]:
        """Reference event_loop_normal: run a prefill batch when one can form,
        else a decode batch — a long prefill stalls decode for its duration.

        With --enable-mixed-chunk (reference ForwardMode.MIXED folds decodes
        into the chunked-prefill forward, schedule_batch.py mix_with_running)
        the tick ALSO runs the decode step alongside the chunk: same
        user-visible effect — decode keeps flowing through long prefills at
        full chunk size — via two pipelined dispatches per tick instead of
        one padded fused batch, which would pollute the decode shape buckets."""
        extend = self._form_extend_batch(self.args.chunked_prefill_size)
        if extend is not None:
            out = []
            if self.args.enable_mixed_chunk and (self.running or self._ring):
                out += self._run_decode()
            return out + self._run_extend(extend)
        if self.running or self._ring:
            return self._run_decode()
        return self._flush_ring()

    def _tick_semi_pd(self) -> List[Tuple[Req, int]]:
        """Decode first (cadence guaranteed), then at most one bounded
        prefill chunk on the same unified storage. Cost EWMAs are fed by
        flush-cycle accounting (_account_costs) — with async dispatch,
        per-call wall times no longer measure device work."""
        out = []
        if self.running or self._ring:
            out += self._run_decode()

        budget = self._prefill_chunk_budget()
        extend = self._form_extend_batch(budget) if budget > 0 else None
        if extend is not None:
            self._note_prefill_dispatch(sum(n for _, n in extend))
            out += self._run_extend(extend)
        if not out and not extend and self._held and not (
                self.running or self._ring):
            # held extends are the only work left: drain them
            out += self._flush_ring()
        return out

    def _prefill_chunk_budget(self) -> int:
        """The MPS-%-equivalent knob: tokens of prefill allowed NOW (0 =
        skip prefill this tick and keep banking allowance).

        With the in-flight ring, one flush delivers ``overlap_depth`` decode
        tokens at once, so the observed ITL is the whole flush cycle:
        depth x (decode step + prefill chunk) + one readback. Two bounds
        shape the per-tick interference allowance:

        * **Cycle stretch** (semi_pd_max_cycle_stretch): prefill may inflate
          the flush cycle at most ``stretch``x over the decode-only base —
          a scale-free bound that holds at every device-health state, and
          the reason semi-PD dominates (never merely trades against) the
          colocated baseline on ITL.
        * **SLO slack** (decode_slo_ms): when the absolute per-token SLO is
          tighter than the stretch bound, it wins; when it is unattainable
          (the pure decode cycle alone exceeds it), the stretch bound still
          grants prefill its proportional share (reference MPS SM-split
          behavior, engine.py:591-642).

        The allowance accrues in a deficit counter across ticks and is only
        spent when it affords a chunk whose useful compute is at least
        ``semi_pd_min_chunk_duty`` x the fixed dispatch overhead — banking
        beats dribbling one overpriced page-sized chunk per tick (round-4
        driver capture: per-tick chunks made semi-PD ITL p95 WORSE than
        colocated at moderate load)."""
        if self.args.prefill_chunk_budget_tokens:
            return min(
                self.args.prefill_chunk_budget_tokens, self.args.chunked_prefill_size
            )
        if not self.running:
            # No decode cadence to protect: full-size chunks.
            self._last_budget_t = self._now()
            return self.args.chunked_prefill_size
        depth = max(self.overlap_depth, 1)
        per_tick_pure = max(self._cycle_base / depth, 1e-6)
        now = self._now()
        dt = min(max(now - self._last_budget_t, 0.0), 1.0)
        self._last_budget_t = now
        # Accrual is WALL-CLOCK based: the allowance is a FRACTION of
        # elapsed pure-decode time (round-5 hardware capture: accruing from
        # the slew-limited cycle-base EWMA under-credited a stalling device
        # ~10x — the EWMA lagged the true 3.5s cycles for the whole pass and
        # prefill starved into a 43s TTFT queue). Chunk execution time is
        # excluded so the fraction stays a bound, not a self-reinforcing
        # feedback.
        dt_pure = max(dt - self._recent_prefill_time, 0.0)
        self._recent_prefill_time = 0.0
        share = self.args.semi_pd_prefill_share
        base_frac = max(self.args.semi_pd_max_cycle_stretch - 1.0, 0.0)
        # MPS-proportional ceiling (reference SM split: prefill always gets
        # its share of the device, engine.py:591-642).
        cap_frac = share / max(1.0 - share, 0.05)
        # SLO framing as a fraction: depth*slo >= cycle_base + depth*chunk.
        slo_cycle = self.args.decode_slo_ms / 1e3 * depth
        slo_slack = ((slo_cycle - self._cycle_base) / depth) * share
        slo_frac = slo_slack / per_tick_pure
        if slo_slack > 0:
            frac = min(base_frac, max(slo_frac, 0.25 * base_frac))
            relief_cap = min(cap_frac, max(slo_frac, base_frac))
        else:
            frac = base_frac
            relief_cap = cap_frac
        # Queue-pressure relief valve: the stretch bound minimizes
        # interference while prefill supply covers demand; when the oldest
        # waiting prompt ages past semi_pd_queue_relief_ms the allowance
        # ramps toward the MPS-proportional share — TTFT is part of the
        # goodput contract too (round-5 capture: a fixed 1.35x stretch on a
        # degraded device capped prefill below offered load and the queue
        # never drained).
        if self.waiting:
            head_age = now - min(
                r.queue_time for r in list(self.waiting)[:8])
            relief_s = self.args.semi_pd_queue_relief_ms / 1e3
            ramp = min(max((head_age - relief_s) / relief_s, 0.0), 1.0)
            frac = frac + (max(relief_cap, frac) - frac) * ramp
        # Split-flush overlap: the cycle's one blocking readback executes
        # held extend chunks on-device underneath the D2H latency — that
        # window is free prefill time. Credit it as its measured fraction
        # of the cycle, plus the absolute per-cycle grace.
        hidden_frac = (
            self._readback_cost / max(self._cycle_base, 1e-6)
            if self.enable_overlap else 0.0
        )
        grace_frac = (
            self.args.semi_pd_stretch_grace_ms / 1e3
            / max(self._cycle_base, 1e-6)
        )
        allow = (frac + hidden_frac + grace_frac) * dt_pure
        # Bank the allowance; cap at one full-size chunk so idle stretches
        # cannot bank an unbounded stall.
        cost = max(self._prefill_cost_per_token, 1e-9)
        bank_cap = (
            self._prefill_overhead
            + self.args.chunked_prefill_size * cost
        )
        self._prefill_deficit = min(self._prefill_deficit + allow, bank_cap)
        # Overhead may consume at most 1/(1+duty) of the spend: the EWMA is
        # learned from noisy cycle residuals and an inflated value would
        # otherwise zero the chunk permanently (observed: host think-time
        # attribution drove it to 91ms -> 16-token chunks -> ever-smaller
        # cycles confirming the bad estimate — a starvation spiral).
        ovh = min(self._prefill_overhead, 0.5 * self._prefill_deficit)
        tokens = int((self._prefill_deficit - ovh) / cost)
        tokens = (tokens // self.page_size) * self.page_size
        min_tokens = max(
            self.page_size,
            min(
                int(self.args.semi_pd_min_chunk_duty * self._prefill_overhead
                    / cost) // self.page_size * self.page_size,
                # never demand more than one chunk can carry
                self.args.chunked_prefill_size,
            ),
        )
        if self.waiting:
            # A chunk that FINISHES a waiting prompt is worth dispatching
            # below the duty floor: its stall cost can never exceed the
            # monolithic stall the colocated baseline would have paid.
            head_need = min(
                max(r.prompt_len - r.prefilled_len, 1)
                for r in list(self.waiting)[:8]
            )
            head_need = -(-head_need // self.page_size) * self.page_size
            min_tokens = min(min_tokens, head_need)
        if tokens < min_tokens:
            return 0  # keep banking
        return min(tokens, self.args.chunked_prefill_size)

    def _note_prefill_dispatch(self, n_tokens: int) -> None:
        """Spend the banked interference allowance for a dispatched chunk
        (the admitted token count may be below the granted budget)."""
        if not self.running:
            return  # free chunk: no decode cadence was at stake
        spent = self._prefill_overhead + n_tokens * self._prefill_cost_per_token
        self._prefill_deficit = max(0.0, self._prefill_deficit - spent)
        # Exclude this chunk's execution time from the next accrual window
        # (wall-clock accrual must count only pure-decode time).
        self._recent_prefill_time += spent

    # ================================================================ prefill
    def _form_extend_batch(self, token_budget: int) -> Optional[List[Tuple[Req, int]]]:
        if not self.waiting or token_budget <= 0:
            return None
        ordered = sort_waiting_queue(
            self.args.schedule_policy, list(self.waiting), self.tree_cache
        )
        adder = PrefillAdder(
            self.runner.page_allocator,
            self.runner.req_pool,
            token_budget,
            self.page_size,
            self.running,
            retract_headroom_tokens=self.args.retract_decode_steps
            * max(len(self.running), 1),
            max_batch_rows=min(64, self.runner.max_running_requests),
        )
        admitted: List[Tuple[Req, int]] = []
        for req in ordered:
            if len(self.running) + len(admitted) >= self.runner.max_running_requests:
                break
            prefix_pages = self._attach_prefix(req)
            n = adder.try_add(req, prefix_pages)
            if n is None:
                continue
            admitted.append((req, n))
        if not admitted:
            return None
        # Allocate slots + pages NOW (decode-owned pre-allocation; reference
        # GetNextPrefillBatchOutput carries these to the P process).
        final: List[Tuple[Req, int]] = []
        for req, n in admitted:
            if self._allocate_for_extend(req, n):
                self.waiting.remove(req)
                final.append((req, n))
            elif (
                self.runner.page_allocator.partitions > 1
                and req.pages and not final and not self.running
            ):
                # DP-attention deadlock breaker: mid-prefill requests pinned
                # to the same exhausted partition can starve each other (each
                # holds pages the other needs, and waiting requests are never
                # retracted). With nothing running and nothing admitted, free
                # this one so it rebalances onto another partition.
                self.waiting.remove(req)
                self._retract(req)  # frees pages, resets, re-queues at head
        return final or None

    def _attach_prefix(self, req: Req) -> int:
        """First-time admission: radix prefix reuse (reference
        scheduler.py:1075 get_new_batch_prefill → match_prefix)."""
        if req.req_slot is not None or req.prefilled_len > 0 or req.pages:
            return len(req.pages)
        if req.lora_id or req.input_embeds:
            # KV depends on the adapter; the tree is adapter-blind, so LoRA
            # requests bypass prefix caching (reference: radix keys would
            # need the lora id folded in — future per-adapter trees).
            # input_embeds prompts carry placeholder ids — not an identity
            # the token-keyed tree may match or index.
            return 0
        pages, node = self.tree_cache.match_prefix(req.input_ids)
        # Must leave >= 1 uncached token to produce logits (reference
        # schedule_policy.py same cap).
        max_pages = (req.prompt_len - 1) // self.page_size
        n = min(len(pages), max_pages)
        if self.host_cache is not None and n < max_pages:
            n = self._try_host_prefix(req, pages, n, max_pages) or n
            if req.pages:  # host path fully set the req up
                return len(req.pages)
        if n > 0:
            req.pages = pages[:n].tolist()
            req.n_prefix_pages = n
            req.prefilled_len = n * self.page_size
            req.last_node = node
            req.cached_tokens = req.prefilled_len
            self.tree_cache.inc_lock_ref(node)
            self.n_cached_prefix_tokens += req.prefilled_len
        else:
            req.last_node = node
        return n

    def _try_host_prefix(self, req, dev_pages, n_dev, max_pages):
        """Device-tree miss tail: extend the prefix from the host tier by
        uploading host pages into fresh device pages (reference
        hiradix_cache load path)."""
        bufs, n_host_tokens = self.host_cache.match(req.input_ids)
        n_host = min(len(bufs), max_pages)
        if n_host <= n_dev:
            return None
        new_pages = self._alloc_pages(n_host - n_dev)
        if new_pages is None:
            return None
        self.runner.upload_pages(
            new_pages, bufs[n_dev:n_host]
        )
        all_pages = np.concatenate(
            [dev_pages[:n_dev].astype(np.int32), new_pages]
        )
        # Insert the combined prefix into the device tree so it is shared and
        # owned there; lock it for this request.
        tokens = req.input_ids[: n_host * self.page_size]
        dup, node = self.tree_cache.insert(tokens, all_pages)
        if dup > n_dev:
            # racing duplicates: free ours that were already present
            self.runner.page_allocator.free(all_pages[n_dev:dup])
        req.pages = all_pages.tolist()
        req.n_prefix_pages = n_host
        req.prefilled_len = n_host * self.page_size
        req.cached_tokens = req.prefilled_len
        req.last_node = node
        self.tree_cache.inc_lock_ref(node)
        self.n_cached_prefix_tokens += req.prefilled_len
        return n_host

    def _allocate_for_extend(self, req: Req, n_tokens: int) -> bool:
        if req.req_slot is None:
            slot = self.runner.req_pool.alloc()
            if slot is None:
                return False
            req.req_slot = slot
            if req.pages:
                self.runner.req_pool.write(
                    slot, 0, np.asarray(req.pages, dtype=np.int32)
                )
        target_kv = req.prefilled_len + n_tokens
        need = (
            target_kv + self.page_size - 1
        ) // self.page_size - len(req.pages)
        if need > 0:
            pages = self._alloc_pages(need, req)
            if pages is None:
                return False
            self.runner.req_pool.write(req.req_slot, len(req.pages), pages)
            req.pages.extend(pages.tolist())
        return True

    PENALTY_HIST = 512  # token-histogram bucket (oldest truncated beyond)

    def _penalty_arrays(self, reqs: List[Req], B: int):
        """Compact per-request token histograms for penalized batches, or
        None when no request uses penalties (the common case)."""
        if not any(r.sampling_params.needs_penalties for r in reqs):
            return None
        from collections import Counter

        from semi_pd_tpu.ops.sampling import PenaltyArrays
        import jax.numpy as jnp

        H = self.PENALTY_HIST
        ids = np.full((B, H), -1, np.int32)
        counts = np.zeros((B, H), np.int32)
        in_prompt = np.zeros((B, H), bool)
        for i, r in enumerate(reqs):
            if not r.sampling_params.needs_penalties:
                continue
            out_c = Counter(r.full_output_ids())
            prompt_set = set(r.input_ids[: r.origin_prompt_len])
            # Generated-token counts first: truncation drops prompt-set
            # entries, keeping frequency penalties exact for long outputs.
            all_toks = list(dict.fromkeys(list(out_c.keys()) + list(prompt_set)))
            toks = all_toks[:H]
            if len(all_toks) > H and not getattr(self, "_penalty_trunc_warned", False):
                self._penalty_trunc_warned = True
                logger.warning(
                    "penalty histogram truncated to %d of %d distinct tokens "
                    "(prompt-set entries dropped first; reference keeps "
                    "full-vocab penalty tensors)", H, len(all_toks),
                )
            for j, t in enumerate(toks):
                ids[i, j] = t
                counts[i, j] = out_c.get(t, 0)
                in_prompt[i, j] = t in prompt_set
        # host arrays: the runner device_puts them (and the multi-host
        # mirror pickles them to follower processes)
        return PenaltyArrays(
            hist_ids=ids, hist_counts=counts, hist_prompt=in_prompt,
        )

    def _vocab_mask(self, reqs: List[Req], B: int):
        """Dense [B, V] grammar mask, or None when no request is constrained
        (the unconstrained step variant then runs mask-free). When a custom
        logit processor is active the return is a float32 additive-bias
        array instead (grammar bans folded in as -inf); the fused sampler
        picks where-vs-add at trace time by dtype (ops/sampling.sample)."""
        has_grammar = any(r.grammar is not None for r in reqs)
        has_custom = any(
            r.sampling_params.custom_logit_processor is not None for r in reqs
        )
        if not has_grammar and not has_custom:
            return None
        V = self.runner.model_config.vocab_size
        if not has_custom:
            mask = np.ones((B, V), dtype=bool)
            for i, r in enumerate(reqs):
                if r.grammar is not None and not r.grammar.finished:
                    m = r.grammar.vocab_mask()
                    mask[i, : len(m)] = m
                    mask[i, len(m):] = False
            return mask
        from semi_pd_tpu.sampling.logit_processor import resolve_processor

        bias = np.zeros((B, V), dtype=np.float32)
        for i, r in enumerate(reqs):
            if r.grammar is not None and not r.grammar.finished:
                m = r.grammar.vocab_mask()
                bias[i, : len(m)][~m] = -np.inf
                bias[i, len(m):] = -np.inf
            name = r.sampling_params.custom_logit_processor
            if name is not None:
                row = resolve_processor(name).bias(
                    r.output_ids, r.sampling_params.custom_params, V
                )
                if row is not None:
                    merged = bias[i] + row
                    if np.isneginf(merged).all():
                        # grammar x processor bans everything (e.g. a
                        # thinking budget forcing a token the grammar
                        # forbids): the grammar wins — an all--inf row
                        # would NaN the softmax / emit token 0
                        logger.warning(
                            "custom logit processor %r bans every "
                            "grammar-legal token for rid=%s; ignoring its "
                            "bias this step", name, r.rid)
                    else:
                        bias[i] = merged
        return bias

    def _run_extend(self, admitted: List[Tuple[Req, int]]) -> List[Tuple[Req, int]]:
        """Dispatch a prefill/extend step. The common (unconstrained) path
        pushes the result onto the in-flight ring; grammar/penalty/EAGLE
        paths stay synchronous (their host state depends on the tokens)."""
        hb = build_extend_batch(
            admitted,
            self.runner.req_pool.page_table,
            self.page_size,
            self.t_buckets,
            self.b_buckets,
            self.p_buckets,
        )
        reqs_only = [r for r, _ in admitted]
        mask = self._vocab_mask(reqs_only, hb.B)
        pen = self._penalty_arrays(reqs_only, hb.B)
        topk = max((r.top_logprobs_num for r in reqs_only), default=0)
        out = []
        hidden = None
        tkv = tki = None
        sync = True
        if self.spec_algo == "EAGLE" and pen is None and topk == 0:
            out += self._flush_ring()
            tokens, logprobs, hidden = self.runner.step_with_hidden_host(
                hb, mask
            )
            hidden = np.asarray(hidden)
        elif mask is None and pen is None and topk == 0 and hb.packable():
            tokens, logprobs = self._step_packed(hb)
            sync = False
        elif topk > 0:
            # top-k logprob extraction rides a dedicated step variant
            # (reference logits_processor.py:194); sync like the grammar
            # path — the [B, k] extras stay off the hot readback.
            out += self._flush_ring()
            tokens, logprobs, tkv, tki = self.runner.step_topk_host(
                hb, topk, mask, pen
            )
            tkv, tki = np.asarray(tkv), np.asarray(tki)
        else:
            out += self._flush_ring()  # keep token stream order
            tokens, logprobs = self.runner.step_host(hb, mask, pen)
        self._note_dispatch()
        self.n_prefill_tokens += sum(n for _, n in admitted)

        # Dispatch-time bookkeeping: chunked requests go back to the queue
        # head immediately so the next chunk can dispatch before this one's
        # results are read (reference add_chunked_req).
        done_flags = []
        for req, n in admitted:
            req.prefilled_len += n
            done = req.prefilled_len >= req.prompt_len
            done_flags.append(done)
            if not done:
                self.waiting.appendleft(req)
        entry = _RingEntry(
            kind="extend", hb=hb, tokens=tokens, logprobs=logprobs,
            epochs=[r.epoch for r in reqs_only], admitted=list(admitted),
            done_flags=done_flags, hidden=hidden, tk_vals=tkv, tk_ids=tki,
        )
        if sync:
            if self.args.debug_tensor_dump_output_folder:
                self._dump_step(entry, np.asarray(tokens), np.asarray(logprobs))
            out += self._process_extend_entry(
                entry, np.asarray(tokens), np.asarray(logprobs)
            )
            return out
        return out + self._push_entry(entry)

    def _process_extend_entry(
        self, e: _RingEntry, tokens: np.ndarray, logprobs: np.ndarray
    ) -> List[Tuple[Req, int]]:
        out = []
        for i, ((req, _n), done) in enumerate(zip(e.admitted, e.done_flags)):
            if req.epoch != e.epochs[i]:
                continue
            if req.finished:
                # aborted while in flight: release what it still holds
                if req.req_slot is not None or req.pages:
                    self._free_req_memory(req)
                continue
            if not done:
                out.append((req, -1))
                continue
            tok = int(tokens[i])
            req.output_ids.append(tok)
            if e.hidden is not None:
                req.spec_hidden = e.hidden[i]
            if req.grammar is not None:
                req.grammar.accept_token(tok)
            if req.return_logprob and logprobs is not None:
                req.output_logprobs.append(float(logprobs[i]))
                if req.top_logprobs_num and e.tk_vals is not None:
                    n = req.top_logprobs_num
                    req.output_top_logprobs.append(
                        (e.tk_vals[i][:n].tolist(), e.tk_ids[i][:n].tolist())
                    )
            if req.first_token_time is None:
                req.first_token_time = time.monotonic()
            req.is_retracted = False
            req.check_finished()
            if req.finished:
                self._release_finished(req)
            else:
                self.running.append(req)
            out.append((req, tok))
            self._maybe_jump_forward(req, out)
        return out

    # ================================================================ ring
    def _note_dispatch(self) -> None:
        """Start the flush-cycle clock at the first dispatch of a cycle so
        idle host time never pollutes the cost model."""
        now = time.monotonic()
        self._last_dispatch_t = now
        if self._cycle_t0 is None:
            self._cycle_t0 = now

    def _push_entry(self, e: _RingEntry) -> List[Tuple[Req, int]]:
        """Append to the in-flight ring, flushing first if the ring is at
        depth. Returns tokens produced by the flush (possibly none)."""
        out = []
        e.t_dispatch = time.monotonic()
        if len(self._ring) >= self._ring_target():
            out = self._flush_ring(hold_extends=True)
            self._note_dispatch()
            if e.kind == "decode":
                # e was chained before the flush and stays in flight: it is
                # now the one decode step ahead of (caught-up) host state.
                self._last_decode = (e.hb, e.tokens)
                self._decode_lag = 1
        self._ring.append(e)
        return out

    def _flush_ring(self, hold_extends: bool = False) -> List[Tuple[Req, int]]:
        """Read back in-flight steps in ONE fused D2H transfer and process
        results in dispatch order.

        With hold_extends (the depth-triggered flush on the overlap hot
        path), this cycle's extend entries are NOT read: their device work
        then executes underneath the blocking readback's D2H latency instead
        of serializing into it, and their results (latency-insensitive — a
        sampled token on final chunks only) drain at the next flush. All
        other call sites fully drain, including previously held entries."""
        if not (self._ring or self._held):
            return []
        ring, self._ring = self._ring, []
        entries = self._held + ring
        self._held = []
        if hold_extends:
            tail = [e for e in ring if e.kind == "extend"]
            if tail and len(tail) < len(entries):
                self._held = tail
                held_ids = {id(e) for e in tail}
                entries = [e for e in entries if id(e) not in held_ids]
        self._last_decode = None
        self._decode_lag = 0
        t_read0 = time.monotonic()
        # Slim the payload: logprob values cross the wire only when some
        # request in the cycle wants them (or step dumping needs them)
        want_lps = bool(self.args.debug_tensor_dump_output_folder) or any(
            r.return_logprob for e in entries for r in e.hb.reqs
        )
        toks_np, lps_np = self.runner.read_results(
            [e.tokens for e in entries], [e.logprobs for e in entries],
            want_logprobs=want_lps,
        )
        now = time.monotonic()
        self._last_flush_t = now
        self._readback_cost = self._ewma(self._readback_cost, now - t_read0)
        if self._cycle_t0 is not None:
            # FULL cycle wall including the readback wait: async dispatch
            # hides device work inside it, so excluding it attributed ~zero
            # cost to decode and starved the chunk budget.
            self._account_costs(entries, now - self._cycle_t0)
        self._cycle_t0 = None
        # Mixed cycles never reach the decode-only accounting branch, but
        # the readback estimate refreshed above is reason enough to re-size.
        self._adapt_depth()
        out = []
        for e, t_np, l_np in zip(entries, toks_np, lps_np):
            if self.args.debug_tensor_dump_output_folder:
                self._dump_step(e, t_np, l_np)
            if e.kind == "decode":
                out += self._process_decode_entry(e, t_np, l_np)
            else:
                out += self._process_extend_entry(e, t_np, l_np)
        return out

    def _dump_step(self, e: _RingEntry, toks, lps) -> None:
        """--debug-tensor-dump-output-folder: write each step's host batch
        + sampled tokens as .npz for offline diffing (reference
        --debug-tensor-dump-* in model_runner.py dumps forward inputs/
        logits; here the readback point is where host truth materializes)."""
        import os

        folder = self.args.debug_tensor_dump_output_folder
        os.makedirs(folder, exist_ok=True)
        n = self._dump_counter = getattr(self, "_dump_counter", -1) + 1
        hb = e.hb
        np.savez(
            os.path.join(folder, f"step_{n:06d}_{e.kind}.npz"),
            mode=np.asarray(str(hb.mode)),
            rids=np.asarray([r.rid for r in hb.reqs]),
            input_ids=np.asarray(hb.input_ids),
            positions=np.asarray(hb.q_pos),
            kv_lens=np.asarray(hb.kv_lens),
            extend_lens=np.asarray(hb.extend_lens or []),
            tokens=np.asarray(toks),
            logprobs=np.asarray(lps),
        )

    def _account_costs(self, entries: List[_RingEntry], dt: float) -> None:
        """Attribute a flush cycle's FULL wall time to the cost EWMAs that
        drive the semi-PD chunk budget. Decode-only cycles set the cycle
        base (decode steps + readback — what the SLO must cover anyway);
        mixed cycles' surplus over the base is the prefill cost, modeled as
        affine (overhead + per_token * n)."""
        if dt <= 0:
            return
        n_dec = sum(1 for e in entries if e.kind == "decode")
        exts = [e for e in entries if e.kind == "extend"]
        pre_toks = sum(sum(n for _, n in e.admitted) for e in exts)
        if n_dec and not pre_toks:
            depth = max(self.overlap_depth, 1)
            # normalize partial cycles to the standard depth
            scaled = dt * depth / max(n_dec, 1)
            self._cycle_base = self._ewma(self._cycle_base, scaled)
            self._decode_cost = self._ewma(
                self._decode_cost,
                max(dt - self._readback_cost, 1e-4) / max(n_dec, 1),
            )
            self._adapt_depth()
            return
        if not exts:
            return
        base = self._cycle_base * n_dec / max(self.overlap_depth, 1)
        est = dt - base
        if est <= 0:
            return
        if pre_toks / len(exts) >= 256:
            slope = (est - len(exts) * self._prefill_overhead) / pre_toks
            if slope > 0:
                self._prefill_cost_per_token = self._ewma(
                    self._prefill_cost_per_token, slope
                )
        elif not n_dec:
            # Overhead only from PURE-extend cycles: in mixed cycles the
            # residual contains host bookkeeping time between dispatches,
            # which must not be billed to (and starve) prefill.
            ovh = (est - self._prefill_cost_per_token * pre_toks) / len(exts)
            self._prefill_overhead = self._ewma(
                self._prefill_overhead, max(ovh, 0.0)
            )

    def _adapt_depth(self) -> None:
        """Re-size the in-flight ring to the measured attachment.

        Target depth = ceil(readback / step): enough in-flight steps that the
        fixed D2H latency is amortized to <= half of a decode-only cycle
        (readback + depth * step). Capped by the stall bound — one flush
        cycle IS the client-visible token-burst gap, so it may not exceed
        max_stall_ms — by max_overlap_depth, and slew-limited to 2x per
        adjustment so one stalled readback cannot explode the ring."""
        if not self._adaptive_depth:
            return
        step = max(self._decode_cost, 1e-5)
        want = -(-self._readback_cost // step)  # ceil
        stall_cap = (self._max_stall_s - self._readback_cost) / step
        want = min(want, stall_cap, float(self.args.max_overlap_depth),
                   2.0 * self.overlap_depth)
        floor = min(self._depth_floor, self.args.max_overlap_depth)
        self.overlap_depth = max(int(want), floor, 1)

    def _ring_target(self) -> int:
        """Flush threshold for the ring: the adaptive depth, capped by the
        largest number of decode tokens any running request still needs —
        steps past every request's budget are pure waste (EOS/length
        overshoot is bounded by the ring depth)."""
        d = max(self.overlap_depth, 1)
        if self.running:
            rem = max(
                (r.sampling_params.max_new_tokens or d) - len(r.output_ids)
                for r in self.running
            )
            d = max(1, min(d, rem))
        return d

    # ================================================================ decode
    def _run_decode(self) -> List[Tuple[Req, int]]:
        """In-flight pipeline: when the running batch is unchanged since the
        newest in-flight decode, dispatch the NEXT step chained to its
        on-device tokens (up to overlap_depth in flight); otherwise flush,
        then dispatch fresh from host state."""
        topk = max((r.top_logprobs_num for r in self.running), default=0)
        if topk > 0:
            # top-k logprob batches run synchronously on a dedicated step
            # variant (like the grammar path): the [B, k] extras never ride
            # the chained/fused-readback hot loop. Takes precedence over
            # speculative decoding — per-draft-position top-k is not
            # extracted (reference spec+logprobs support is likewise
            # limited, semi_pd_decode_scheduler.py:354).
            out = self._flush_ring()
            if self.running:
                out += self._decode_topk(topk)
            return out
        if self.spec_gamma > 0:
            out = self._flush_ring()
            if self.running:
                if self.spec_algo == "EAGLE":
                    out += self._run_eagle_decode()
                else:
                    out += self._run_spec_decode()
            return out
        chained = self._try_dispatch_chained() if self.enable_overlap else None
        if chained is not None:
            return self._push_entry(chained)
        out = self._flush_ring()
        if self.running:
            e = self._dispatch_decode()
            if e is not None:
                self._note_dispatch()
                e.t_dispatch = time.monotonic()
                self._ring.append(e)
        return out

    def _run_eagle_decode(self) -> List[Tuple[Req, int]]:
        """Fused EAGLE round (speculative/eagle.py). Same batch geometry as
        the NGRAM verify window; drafts are generated on device."""
        g = self.spec_gamma
        if any(
            r.grammar is not None or r.sampling_params.needs_per_step_host
            or getattr(r, "spec_hidden", None) is None
            for r in self.running
        ):
            return self._fallback_plain_decode()

        tree = getattr(self.runner, "tree_template", None)
        if tree is not None and all(
            r.sampling_params.temperature <= 0.0 for r in self.running
        ):
            return self._run_eagle_tree_decode(tree)

        drafts_dummy = [[0] * g for _ in self.running]
        for r in self.running:
            target = r.kv_len + 1 + g
            need = (target + self.page_size - 1) // self.page_size - len(r.pages)
            if need > 0:
                pages = self._alloc_pages(need, r)
                if pages is None:
                    return self._fallback_plain_decode()
                self.runner.req_pool.write(r.req_slot, len(r.pages), pages)
                r.pages.extend(pages.tolist())

        hb, _, _ = build_spec_verify_batch(
            self.running, drafts_dummy, g,
            self.runner.req_pool.page_table, self.page_size,
            self.b_buckets, self.p_buckets,
        )
        H = self.runner.model_config.hidden_size
        prev_hidden = np.zeros((hb.B, H), np.float32)
        for i, r in enumerate(hb.reqs):
            prev_hidden[i] = r.spec_hidden
        accept_len, next_tok, drafts, next_hidden = (
            self.runner.eagle_step_host(hb, prev_hidden, g)
        )
        accept_len = np.asarray(accept_len)
        next_tok = np.asarray(next_tok)
        drafts = np.asarray(drafts)
        next_hidden = np.asarray(next_hidden)

        out = []
        still = []
        for i, req in enumerate(hb.reqs):
            toks = drafts[i][: int(accept_len[i])].tolist() + [int(next_tok[i])]
            self.n_spec_steps += 1
            self.n_spec_accepted += int(accept_len[i])
            req.spec_hidden = next_hidden[i]
            for tok in toks:
                req.output_ids.append(tok)
                self.n_decode_tokens += 1
                req.check_finished()
                out.append((req, tok))
                if req.finished:
                    break
            if req.finished:
                self._release_finished(req)
            else:
                still.append(req)
        self.running = still
        return out

    def _run_eagle_tree_decode(self, tree) -> List[Tuple[Req, int]]:
        """EAGLE top-k TREE round (speculative/eagle.py eagle_tree_round):
        one fused dispatch drafts a static token tree, verifies every node
        with the target, accepts the deepest matching path and compacts its
        KV into slot order. Greedy-only (caller checked). Reference:
        eagle_worker.py:162-366 + build_eagle_tree.py."""
        from semi_pd_tpu.runtime.batch import build_tree_verify_batch

        N = tree.num_nodes
        for r in self.running:
            target = r.kv_len + N
            need = (target + self.page_size - 1) // self.page_size - len(r.pages)
            if need > 0:
                pages = self._alloc_pages(need, r)
                if pages is None:
                    return self._fallback_plain_decode()
                self.runner.req_pool.write(r.req_slot, len(r.pages), pages)
                r.pages.extend(pages.tolist())

        hb = build_tree_verify_batch(
            self.running, tree,
            self.runner.req_pool.page_table, self.page_size,
            self.b_buckets, self.p_buckets,
        )
        H = self.runner.model_config.hidden_size
        prev_hidden = np.zeros((hb.B, H), np.float32)
        for i, r in enumerate(hb.reqs):
            prev_hidden[i] = r.spec_hidden
        accept_len, next_tok, path_tokens, next_hidden = (
            self.runner.eagle_tree_step_host(hb, prev_hidden)
        )
        accept_len = np.asarray(accept_len)
        next_tok = np.asarray(next_tok)
        path_tokens = np.asarray(path_tokens)
        next_hidden = np.asarray(next_hidden)

        out = []
        still = []
        for i, req in enumerate(hb.reqs):
            toks = path_tokens[i][: int(accept_len[i])].tolist() + [
                int(next_tok[i])
            ]
            self.n_spec_steps += 1
            self.n_spec_accepted += int(accept_len[i])
            req.spec_hidden = next_hidden[i]
            for tok in toks:
                req.output_ids.append(tok)
                self.n_decode_tokens += 1
                req.check_finished()
                out.append((req, tok))
                if req.finished:
                    break
            if req.finished:
                self._release_finished(req)
            else:
                still.append(req)
        self.running = still
        return out

    def _decode_topk(self, k: int) -> List[Tuple[Req, int]]:
        """Synchronous decode step with device-side top-k logprob extraction
        (reference logits_processor.py:194). Called with the ring flushed;
        results are processed immediately (the topk arrays would not survive
        the fused readback, which carries tokens+logprobs only)."""
        if not self._prepare_decode_pages(lag=0):
            return []
        hb = build_decode_batch(
            self.running,
            self.runner.req_pool.page_table,
            self.page_size,
            self.b_buckets,
            self.p_buckets,
        )
        mask = self._vocab_mask(self.running, hb.B)
        pen = self._penalty_arrays(self.running, hb.B)
        tokens, logprobs, tkv, tki = self.runner.step_topk_host(
            hb, k, mask, pen
        )
        self._note_dispatch()
        e = _RingEntry(
            kind="decode", hb=hb, tokens=tokens, logprobs=logprobs,
            epochs=[r.epoch for r in hb.reqs],
            tk_vals=np.asarray(tkv), tk_ids=np.asarray(tki),
        )
        # Sync step: its wall time is not a flush cycle — keep it out of the
        # cost EWMAs that drive the semi-PD chunk budget.
        self._cycle_t0 = None
        return self._process_decode_entry(
            e, np.asarray(tokens), np.asarray(logprobs)
        )

    def _fallback_plain_decode(self) -> List[Tuple[Req, int]]:
        """Synchronous plain decode step (spec-decode fallback paths): the
        ring is already flushed when these run, so dispatch + immediate
        flush reads just this one step."""
        e = self._dispatch_decode()
        if e is None:
            return []
        self._note_dispatch()
        e.t_dispatch = time.monotonic()
        self._ring.append(e)
        return self._flush_ring()

    def _run_spec_decode(self) -> List[Tuple[Req, int]]:
        """NGRAM speculative step: draft, verify in one forward, accept up to
        gamma+1 tokens per request (reference: EAGLEWorker
        forward_batch_speculative_generation, eagle_worker.py:162 — chain
        drafts, no tree, no draft model)."""
        from semi_pd_tpu.runtime.speculative import ngram_draft

        g = self.spec_gamma
        if any(
            r.grammar is not None or r.sampling_params.needs_per_step_host
            for r in self.running
        ):
            # masks depend on each accepted token: fall back to plain decode
            return self._fallback_plain_decode()

        drafts = [ngram_draft(r, g) for r in self.running]
        # Allocate pages covering last token + drafts per request
        for r, d in zip(self.running, drafts):
            target = r.kv_len + 1 + len(d)
            need = (target + self.page_size - 1) // self.page_size - len(r.pages)
            if need > 0:
                pages = self._alloc_pages(need, r)
                if pages is None:
                    # Even a cleared draft still needs one page for the bonus
                    # token when kv_len lands on a page boundary: let plain
                    # decode handle allocation (it can retract on exhaustion).
                    return self._fallback_plain_decode()
                self.runner.req_pool.write(r.req_slot, len(r.pages), pages)
                r.pages.extend(pages.tolist())

        hb, drafts_np, draft_lens = build_spec_verify_batch(
            self.running, drafts, g,
            self.runner.req_pool.page_table, self.page_size,
            self.b_buckets, self.p_buckets,
        )
        accept_len, next_tok = self.runner.spec_step_host(
            hb, drafts_np, draft_lens, g
        )
        accept_len = np.asarray(accept_len)
        next_tok = np.asarray(next_tok)

        out = []
        still = []
        for i, req in enumerate(hb.reqs):
            toks = drafts[i][: int(accept_len[i])] + [int(next_tok[i])]
            self.n_spec_steps += 1
            self.n_spec_accepted += int(accept_len[i])
            for tok in toks:
                req.output_ids.append(tok)
                self.n_decode_tokens += 1
                req.check_finished()
                out.append((req, tok))
                if req.finished:
                    break
            if req.finished:
                self._release_finished(req)
            else:
                still.append(req)
        self.running = still
        return out

    def _dispatch_decode(self) -> Optional[_RingEntry]:
        """Build + dispatch a decode step from host state (inputs = last
        sampled tokens known on host). Called with the ring flushed."""
        if not self._prepare_decode_pages(lag=0):
            return None
        hb = build_decode_batch(
            self.running,
            self.runner.req_pool.page_table,
            self.page_size,
            self.b_buckets,
            self.p_buckets,
        )
        mask = self._vocab_mask(self.running, hb.B)
        pen = self._penalty_arrays(self.running, hb.B)
        if mask is None and pen is None and hb.packable():
            tokens, logprobs = self._step_packed(hb)
        else:
            tokens, logprobs = self.runner.step_host(hb, mask, pen)
        self._last_decode = (hb, tokens)
        self._decode_lag = 1
        return _RingEntry(
            kind="decode", hb=hb, tokens=tokens, logprobs=logprobs,
            epochs=[r.epoch for r in hb.reqs],
        )

    def _try_dispatch_chained(self) -> Optional[_RingEntry]:
        """Dispatch step N+1 with step N's device tokens as inputs. Only when
        the batch is provably identical and unconstrained (grammar/penalty
        masks depend on token N, which the host hasn't read). ``lag`` is the
        number of in-flight decode steps this batch is ahead of host state."""
        if self._last_decode is None or not self.running:
            return None
        hb_prev, dev_tokens = self._last_decode
        if hb_prev.mode != ForwardMode.DECODE or hb_prev.reqs != self.running:
            return None
        if any(
            r.grammar is not None or r.sampling_params.needs_per_step_host
            for r in self.running
        ):
            return None
        lag = self._decode_lag
        if not self._prepare_decode_pages(lag=lag, allow_retract=False):
            return None
        hb = build_decode_batch(
            self.running,
            self.runner.req_pool.page_table,
            self.page_size,
            self.b_buckets,
            self.p_buckets,
            lag=lag,
        )
        if hb.B != hb_prev.B:
            return None
        if hb.packable():
            tokens, logprobs = self._step_packed(
                hb, prev_tokens=dev_tokens
            )
        else:
            # chained non-packable: the runner substitutes its own carried
            # decode tokens (== dev_tokens; kept runner-side so multi-host
            # followers can replay without device arrays on the wire)
            tokens, logprobs = self.runner.step_host(hb, chained=True)
        self._last_decode = (hb, tokens)
        self._decode_lag = lag + 1
        return _RingEntry(
            kind="decode", hb=hb, tokens=tokens, logprobs=logprobs,
            epochs=[r.epoch for r in hb.reqs],
        )

    def _process_decode_entry(
        self, e: _RingEntry, tokens: np.ndarray, logprobs: np.ndarray
    ) -> List[Tuple[Req, int]]:
        out = []
        for i, req in enumerate(e.hb.reqs):
            if req.epoch != e.epochs[i] or req.finished:
                # finished/aborted/retracted/jumped at an earlier in-flight
                # step: this step's token for it is discarded
                continue
            tok = int(tokens[i])
            req.output_ids.append(tok)
            self.n_decode_tokens += 1
            if req.grammar is not None:
                req.grammar.accept_token(tok)
            if req.return_logprob and logprobs is not None:
                req.output_logprobs.append(float(logprobs[i]))
                if req.top_logprobs_num and e.tk_vals is not None:
                    n = req.top_logprobs_num
                    req.output_top_logprobs.append(
                        (e.tk_vals[i][:n].tolist(), e.tk_ids[i][:n].tolist())
                    )
            req.check_finished()
            out.append((req, tok))
            if req.finished:
                if req in self.running:
                    self.running.remove(req)
                self._release_finished(req)
            else:
                self._maybe_jump_forward(req, out)
        return out

    def _prepare_decode_pages(self, lag: int = 0, allow_retract: bool = True) -> bool:
        """Allocate the page each request needs for its next token; on
        exhaustion retract newest requests back to waiting (reference
        update_running_batch semi_pd_decode_scheduler.py:90-151 +
        retract_decode schedule_batch.py:1034)."""
        # Fault injection (reference SGLANG_TEST_RETRACT,
        # semi_pd_decode_scheduler.py:42-43): force a retraction once the
        # batch is large enough, to exercise the retract path in CI.
        if (
            allow_retract
            and len(self.running) > 1
            and os.environ.get("SEMI_PD_TPU_TEST_RETRACT")
            and self.n_retracted < int(os.environ.get(
                "SEMI_PD_TPU_TEST_RETRACT_MAX", "3"))
        ):
            self._retract(self.running.pop())
        while self.running:
            need_idx = [
                i for i, r in enumerate(self.running)
                if (r.kv_len + lag) % self.page_size == 0
                and len(r.pages) * self.page_size <= r.kv_len + lag
            ]
            if not need_idx:
                return True
            if self.runner.page_allocator.partitions > 1:
                # DP-attention: a request's page must come from ITS partition
                got, ok = [], True
                for i in need_idx:
                    p = self._alloc_pages(1, self.running[i])
                    if p is None:
                        ok = False
                        break
                    got.append((i, p))
                if ok:
                    for i, p in got:
                        r = self.running[i]
                        self.runner.req_pool.write(r.req_slot, len(r.pages), p)
                        r.pages.append(int(p[0]))
                    return True
                for _, p in got:  # roll back partial allocation
                    self.runner.page_allocator.free(p)
                pages = None
            else:
                pages = self._alloc_pages(len(need_idx))
            if pages is not None:
                for j, i in enumerate(need_idx):
                    r = self.running[i]
                    self.runner.req_pool.write(
                        r.req_slot, len(r.pages), pages[j : j + 1]
                    )
                    r.pages.append(int(pages[j]))
                return True
            if not allow_retract:
                return False
            # Retract the newest request (LIFO — oldest keep making progress).
            victim = self.running.pop()
            self._retract(victim)
            if not self.running:
                # Everything retracted; victim alone couldn't get a page —
                # whole pool is consumed by the radix cache; nuke it.
                self.tree_cache.evict(10**9)
        return bool(self.running)

    def _retract(self, req: Req) -> None:
        self.n_retracted += 1
        self._free_req_memory(req)
        req.reset_for_retract()
        self.waiting.appendleft(req)

    # ================================================================ memory
    def _alloc_pages(self, n: int, req: Optional[Req] = None) -> Optional[np.ndarray]:
        alloc = self.runner.page_allocator
        part = 0
        if alloc.partitions > 1:
            # DP-attention: a request is pinned to one dp partition (its KV
            # lives on that rank's pool shard); assign on first allocation.
            assert req is not None, "dp-attention allocation needs the request"
            if req.dp_rank is None:
                req.dp_rank = alloc.least_loaded_partition()
            part = req.dp_rank
        pages = alloc.alloc(n, part)
        if pages is None:
            missing = n - alloc.available_pages(part if alloc.partitions > 1 else None)
            self.tree_cache.evict(missing)
            pages = alloc.alloc(n, part)
        return pages

    def _free_req_memory(self, req: Req) -> None:
        """Free owned pages; shared prefix pages return to the tree."""
        own = req.pages[req.n_prefix_pages :]
        if own:
            self.runner.page_allocator.free(np.asarray(own, dtype=np.int32))
        if req.last_node is not None and req.n_prefix_pages > 0:
            self.tree_cache.dec_lock_ref(req.last_node)
        if req.req_slot is not None:
            self.runner.req_pool.free(req.req_slot)
        req.pages = []
        req.n_prefix_pages = 0
        req.req_slot = None
        req.last_node = None

    def _maybe_jump_forward(self, req: Req, out: list) -> None:
        """After a sampled token advanced the grammar, emit any forced-token
        chain without model forwards (reference: outlines jump-forward,
        srt/constrained/base_grammar_backend.py:187). The req is parked; its
        KV debt is back-filled by an extend before it decodes again."""
        if (
            self.args.disable_jump_forward
            or req.grammar is None
            or req.grammar.finished
            or req.finished
            # a custom logit processor must see every emitted position; the
            # grammar's forced chain would bypass its bias
            or req.sampling_params.custom_logit_processor is not None
        ):
            return
        jf = req.grammar.jump_forward_tokens()
        if len(jf) < 2:
            return
        for tok in jf:
            req.output_ids.append(tok)
            req.kv_debt += 1
            req.grammar.accept_token(tok)
            self.n_jump_tokens += 1
            out.append((req, tok))
            req.check_finished()
            if req.finished:
                break
        if req in self.running:
            self.running.remove(req)
        # Any in-flight step that sampled for this req is now stale: the
        # jumped tokens supersede the chained continuation.
        req.epoch += 1
        self._refill_parked.append(req)

    def _fold_refill_parked(self) -> None:
        """Move jump-forward reqs to the waiting queue as partial-prefill
        requests: generated tokens fold into the input (like retraction) but
        memory and valid KV are kept; only the debt tokens get prefilled."""
        if not self._refill_parked:
            return
        for req in self._refill_parked:
            if req.finished:
                # finished during the jump (EOS/length/stop-string): release
                # with kv_len already debt-adjusted for the radix insert
                self._release_finished(req)
                continue
            kv_valid = req.kv_len
            req.input_ids = req.all_token_ids()
            req.n_retracted_output += len(req.output_ids)
            req.output_ids = []
            req.surr_offset = 0
            req.read_offset = 0
            req.prefilled_len = kv_valid
            req.kv_debt = 0
            req.spec_hidden = None
            self.waiting.appendleft(req)
        self._refill_parked = []

    def _release_finished(self, req: Req) -> None:
        """Finished: re-insert KV into the prefix cache, release the rest
        (reference radix_cache.py:168 cache_finished_req)."""
        self.n_finished += 1
        req.finish_time = time.monotonic()
        if (not isinstance(self.tree_cache, ChunkCache) and not req.lora_id
                and not req.input_embeds):
            kv_tokens = req.kv_len
            n_full = kv_tokens // self.page_size
            tokens = req.all_token_ids()[: n_full * self.page_size]
            pages = np.asarray(req.pages[:n_full], dtype=np.int32)
            if (self.host_cache is not None and n_full > 0
                    and self.hicache_ctl.should_write(req)):
                # Async write-through (reference cache_controller.py write
                # queue): the page gather is DISPATCHED here — dispatch
                # order vs the donated-buffer steps makes the read safe
                # against page reuse — and the blocking device_get happens
                # on the controller thread, off the decode cadence.
                try:
                    fut = self.runner.download_pages_async(pages)
                    self.hicache_ctl.enqueue_write(tokens, fut, n_full)
                except Exception:  # noqa: BLE001
                    logger.exception("host-tier write-through dispatch failed")
            dup, node = self.tree_cache.insert(tokens, pages)
            # pages[:n_prefix] were always the tree's; pages[n_prefix:dup] are
            # ours but identical content was inserted meanwhile — free ours.
            if dup > req.n_prefix_pages:
                self.runner.page_allocator.free(
                    np.asarray(req.pages[req.n_prefix_pages : dup], dtype=np.int32)
                )
            # Tail pages beyond the cached full pages are ours to free.
            tail = req.pages[max(n_full, req.n_prefix_pages) :]
            if tail:
                self.runner.page_allocator.free(np.asarray(tail, dtype=np.int32))
            if req.last_node is not None and req.n_prefix_pages > 0:
                self.tree_cache.dec_lock_ref(req.last_node)
            if req.req_slot is not None:
                self.runner.req_pool.free(req.req_slot)
            req.pages = []
            req.n_prefix_pages = 0
            req.req_slot = None
            req.last_node = None
        else:
            self._free_req_memory(req)

    # ================================================================ debug
    def dump_state(self) -> dict:
        """Watchdog/wedge autopsy (reference srt/utils.py:1405
        pyspy_dump_schedulers dumps py-spy stacks of every scheduler process;
        single-process TPU equivalent: the scheduler's own in-flight state).
        Safe to call from any thread — reads only; no device access, so it
        works even while the device is wedged mid-D2H."""
        now = time.monotonic()

        def _entry(e: _RingEntry) -> dict:
            return {
                "kind": e.kind,
                "B": e.hb.B,
                "T": int(getattr(e.hb, "T", 0) or 0),
                "mode": str(e.hb.mode),
                "rids": [r.rid for r in e.hb.reqs][:8],
                "age_s": round(now - e.t_dispatch, 3) if e.t_dispatch else None,
            }

        alloc = self.runner.page_allocator
        try:
            avail = int(alloc.available_pages())
        except Exception:  # noqa: BLE001 — partitioned allocator variants
            avail = -1
        return {
            "t_monotonic": round(now, 3),
            "running": len(self.running),
            "waiting": len(self.waiting),
            "running_rids": [r.rid for r in self.running][:8],
            "ring": [_entry(e) for e in self._ring],
            "held": [_entry(e) for e in self._held],
            "overlap_depth": self.overlap_depth,
            "decode_lag": self._decode_lag,
            "last_dispatch_age_s": (
                round(now - self._last_dispatch_t, 3)
                if self._last_dispatch_t else None
            ),
            "last_flush_age_s": (
                round(now - self._last_flush_t, 3)
                if self._last_flush_t else None
            ),
            "cycle_open_s": (
                round(now - self._cycle_t0, 3) if self._cycle_t0 else None
            ),
            "allocator": {
                "usable_pages": int(alloc.usable_pages),
                "available_pages": avail,
                "req_slots_free": int(self.runner.req_pool.available_slots()),
                "req_slots_total": int(self.runner.req_pool.max_reqs),
            },
            "cost_model": {
                "prefill_cost_per_token_us": round(
                    self._prefill_cost_per_token * 1e6, 2),
                "prefill_overhead_ms": round(self._prefill_overhead * 1e3, 2),
                "decode_ms": round(self._decode_cost * 1e3, 3),
                "readback_ms": round(self._readback_cost * 1e3, 2),
                "cycle_base_ms": round(self._cycle_base * 1e3, 2),
            },
            "counters": {
                "finished": self.n_finished,
                "retracted": self.n_retracted,
                "decode_tokens": self.n_decode_tokens,
                "prefill_tokens": self.n_prefill_tokens,
            },
        }

    def check_memory(self) -> None:
        """Idle-state leak check (reference scheduler.py:981-1030)."""
        assert not self.running and not self.waiting
        cached = self.tree_cache.total_cached_pages()
        avail = self.runner.page_allocator.available_pages()
        total = self.runner.page_allocator.usable_pages
        if cached + avail != total:
            raise AssertionError(
                f"KV page leak: {avail} free + {cached} cached != {total}"
            )
        if self.runner.req_pool.available_slots() != self.runner.req_pool.max_reqs:
            raise AssertionError("req slot leak")
