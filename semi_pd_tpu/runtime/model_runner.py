"""ModelRunner: device setup, model + weights, KV pool sizing, jitted step
programs.

Reference: python/sglang/srt/model_executor/model_runner.py (init dist env
:285, load_model :626, init_memory_pool :951 profiling KV size, forward
:1257, sample :1294) + cuda_graph_runner.py (static decode shapes).

TPU-native structure: ONE process drives the whole mesh. The step program is
``(params, k_cache, v_cache, fb) -> (next_tokens, logprobs, new_key, k', v')``
jitted with the KV buffers donated — XLA aliases them in place, which *is*
the unified storage both phases share (the role of the reference's CUDA IPC
export/import, model_runner.py:346-624). Prefill and decode are just
different bucket shapes of this program; semi-PD dispatches them back to back
on the same buffers.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.config.server_args import ServerArgs
from semi_pd_tpu.layers import attention as attention_backend
from semi_pd_tpu.mem.pool import KVCache, KVCacheSpec, PageAllocator, ReqToPagePool
from semi_pd_tpu.model_loader.loader import device_put_params, load_params
from semi_pd_tpu.models.registry import create_model
from semi_pd_tpu.ops import sampling as sampling_ops
from semi_pd_tpu.runtime.forward_batch import ForwardArrays

logger = logging.getLogger(__name__)

def _load_kv_cache_scales(path: str, num_layers: int):
    """Parse a kv-cache-scales JSON (the vLLM schema the reference loads via
    model.load_kv_cache_scales, e.g. models/qwen2.py:296): either
    {"kv_cache": {"scaling_factor": {"0": {"0": s, ...}}}} (per-TP-rank) or
    a flat {"0": s, ...}; per-layer dicts {"k_scale": x, "v_scale": y} are
    also accepted. Returns float32 [L, 2] (k_scale, v_scale)."""
    import json

    import numpy as np

    with open(path) as f:
        doc = json.load(f)
    sf = doc.get("kv_cache", {}).get("scaling_factor", doc)
    if sf and all(isinstance(v, dict) and all(k.isdigit() for k in v)
                  for v in sf.values()):
        sf = sf.get("0") or next(iter(sf.values()))  # TP-rank level
    out = np.ones((num_layers, 2), np.float32)
    for k, v in sf.items():
        li = int(k)
        if li >= num_layers:
            continue
        if isinstance(v, dict):
            out[li, 0] = float(v.get("k_scale", 1.0))
            out[li, 1] = float(v.get("v_scale", 1.0))
        else:
            out[li, :] = float(v)
    return out


def _delete_checkpoint_files(model_path: str) -> None:
    """--delete-ckpt-after-loading: reclaim disk once weights are resident
    (reference server_args.py delete_ckpt_after_loading, applied in
    model_loader/weight_utils.py). Config/tokenizer files are kept — only
    weight shards go."""
    import glob
    import os

    if os.path.isfile(model_path):  # single-file gguf
        paths = [model_path]
    else:
        paths = []
        for pat in ("*.safetensors", "*.bin", "*.pt", "*.gguf"):
            paths += glob.glob(os.path.join(model_path, pat))
    for p in paths:
        try:
            os.remove(p)
            logger.info("deleted checkpoint file %s", p)
        except OSError as e:
            logger.warning("could not delete %s: %s", p, e)


KV_DTYPES = {
    "bfloat16": jnp.bfloat16,
    "float32": jnp.float32,
    "fp8_e4m3": jnp.float8_e4m3fn,
    "fp8_e5m2": jnp.float8_e5m2,
}


class ModelRunner:
    def __init__(
        self,
        server_args: ServerArgs,
        model_config: Optional[ModelConfig] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
    ):
        self.server_args = server_args
        self.mesh = mesh

        if model_config is None:
            model_config = ModelConfig.from_model_path(
                server_args.model_path,
                trust_remote_code=server_args.trust_remote_code,
                context_length=server_args.context_length,
                dtype=server_args.dtype,
                quantization=server_args.quantization,
                json_override_args=server_args.json_model_override_args,
                revision=server_args.revision,
                download_dir=server_args.download_dir,
            )
        if server_args.is_embedding:
            # Reference tokenizer_manager.py:176 passes --is-embedding into
            # ModelConfig so pooling mode takes effect even for generative
            # architectures served encode-only.
            model_config.is_embedding = True
        if server_args.context_length:
            # --context-length overrides the HF value on BOTH config paths
            # (reference model_config.py context_length arg); previously an
            # explicitly-passed ModelConfig silently kept the HF limit and
            # over-length prompts were aborted despite the flag.
            model_config.context_length = server_args.context_length
        self.model_config = model_config
        self.model = create_model(model_config)
        self.model.page_size = server_args.page_size

        # Attention backend: pallas on TPU, jnp reference elsewhere
        platform = jax.devices()[0].platform
        backend = server_args.attention_backend or (
            "pallas" if platform in ("tpu", "axon") else "reference")
        attention_backend.set_attention_backend(backend)
        # scan_layers stays on for TPU too: compile time is O(1) in depth and
        # the traced-layer-index DMA offsets that hung Mosaic in early v5e
        # testing compile cleanly with the current kernels (round-2 probe:
        # scan decode 8.7ms/step vs 10.5ms unrolled, 16-layer 1B-class).
        # Heterogeneous-layer models (deepseek_v2, gemma2) opt out themselves.
        # Expert parallelism: shard expert stacks over the tp axis and use
        # the shard_map EP path (ops/moe.py moe_ffn_ep)
        self.model.mesh = mesh
        self.model.use_ep = bool(mesh is not None and server_args.ep_size > 1)
        self.model.ep_capacity_factor = server_args.ep_capacity_factor
        logger.info("attention backend: %s (platform %s)", backend, platform)

        self.kv_scales = None
        if server_args.quantization_param_path:
            # Calibrated per-layer fp8-KV scales (reference --quantization-
            # param-path, model_runner.py:681-688 load_kv_cache_scales).
            # Stored on the runner and stamped into every step program's
            # ForwardArrays (not a module global: a second runner in the
            # same process must not contaminate this one's traces). Only the
            # MHA/GQA paged_attention path applies them — reject the flag
            # outright where it would be silently ignored.
            if model_config.use_mla:
                raise ValueError(
                    "--quantization-param-path is not supported for MLA "
                    "models: the latent pool holds K and V in one buffer, "
                    "so separate k_scale/v_scale calibration does not apply")
            if server_args.enable_double_sparsity:
                raise ValueError(
                    "--quantization-param-path is not supported together "
                    "with --enable-double-sparsity (the sparse-channel "
                    "attention path does not apply KV scales)")
            scales = _load_kv_cache_scales(
                server_args.quantization_param_path,
                model_config.num_hidden_layers,
            )
            self.kv_scales = jnp.asarray(scales)
            logger.info("fp8-KV scales loaded for %d layers", len(scales))

        self._load_weights()
        self._init_memory_pool()
        self._build_step_fns()
        self._read_jits: Dict[tuple, Any] = {}
        self._chain_tokens = None  # last decode step's device tokens
        self.draft_model = None
        self.draft_kv = None
        if server_args.speculative_algorithm in ("EAGLE", "NEXTN"):
            self._init_eagle()
        self.rng_key = jax.random.PRNGKey(server_args.seed)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._replicated = NamedSharding(self.mesh, P())
            self.rng_key = jax.device_put(self.rng_key, self._replicated)
        else:
            self._replicated = None

    # ------------------------------------------------------------- weights
    def _load_weights(self):
        t0 = time.monotonic()
        pq = None  # pre-quantized checkpoint descriptor (AWQ/GPTQ/ct)
        if self.server_args.random_weights or not self.server_args.model_path:
            from semi_pd_tpu.model_loader.loader import device_init_params

            # On-device init: host-side numpy RNG for a 1B-class model costs
            # ~130s + a multi-GB transfer; one jitted program generates the
            # same 0.02*normal tree in HBM in ~1s (round-2 measurement).
            self.params = device_init_params(
                self.model, self.server_args.seed, self.mesh
            )
        else:
            weights = None
            if self.model_config.quantization_config is not None:
                from semi_pd_tpu.model_loader.prequant import detect_prequant

                pq = detect_prequant(self.model_config.quantization_config)
            if pq is not None:
                from semi_pd_tpu.model_loader.loader import iterate_hf_weights
                from semi_pd_tpu.model_loader.prequant import dequantize_stream

                logger.info(
                    "pre-quantized checkpoint: %s %d-bit (group %d); "
                    "dequantizing on load", pq.method, pq.bits, pq.group_size)
                weights = dequantize_stream(
                    iterate_hf_weights(
                        self.server_args.model_path,
                        load_format=self.server_args.load_format),
                    pq,
                )
            if weights is not None:
                self.params = load_params(
                    self.model, weights=weights, mesh=self.mesh)
            else:
                self.params = load_params(
                    self.model, model_path=self.server_args.model_path,
                    mesh=self.mesh, load_format=self.server_args.load_format,
                )
            if pq is not None and self.server_args.quantization is None:
                # Serve at the checkpoint's intended bit-width: re-quantize
                # the dequantized tree into the matching TPU-native format.
                self.server_args.quantization = pq.requant
        if self.server_args.quantization == "none":
            # explicit opt-out: serve a pre-quantized checkpoint dequantized
            # at full model dtype (no re-quantization)
            self.server_args.quantization = None
        q = self.server_args.quantization
        if q in ("fp8", "int8", "blockwise_fp8", "awq_int4"):
            from semi_pd_tpu.model_loader.quantize import quantize_params

            group = pq.group_size if pq is not None else 0
            self.params = quantize_params(self.params, q, group_size=group)
        n_bytes = sum(
            x.size * x.dtype.itemsize for x in jax.tree.leaves(self.params)
        )
        logger.info(
            "weights ready: %.2f GiB in %.1fs", n_bytes / 2**30, time.monotonic() - t0
        )
        self.weight_bytes = n_bytes
        if (self.server_args.delete_ckpt_after_loading
                and self.server_args.model_path
                and not self.server_args.random_weights):
            _delete_checkpoint_files(self.server_args.model_path)

    # ------------------------------------------------------------- memory
    def _init_memory_pool(self):
        args, mc = self.server_args, self.model_config
        page_size = args.page_size
        if args.kv_cache_dtype == "auto":
            kv_dtype = KV_DTYPES.get(mc.dtype, jnp.bfloat16)
        else:
            kv_dtype = KV_DTYPES[args.kv_cache_dtype]

        if args.max_total_tokens:
            num_tokens = args.max_total_tokens
        else:
            num_tokens = self._profile_kv_tokens(kv_dtype)
        # DP-attention: one dump page per dp partition; page count must split
        # evenly so the slot axis shards over "dp" without padding.
        self.dp_attn = args.dp_size if args.enable_dp_attention else 1
        if self.dp_attn > 1:
            n = max(num_tokens // page_size, 8 * self.dp_attn) + self.dp_attn
            num_pages = -(-n // self.dp_attn) * self.dp_attn
        else:
            num_pages = max(num_tokens // page_size, 8) + 1  # +1 dump page

        max_context = min(mc.context_length, num_tokens)
        self.max_running_requests = args.max_running_requests or min(
            max(num_tokens // 512, 16), 512
        )

        self.kv_spec = KVCacheSpec(
            num_layers=mc.num_hidden_layers,
            num_pages=num_pages,
            page_size=page_size,
            num_kv_heads=mc.num_kv_heads_total,
            # MLA latent dims (e.g. 576) lane-pad to an EVEN number of
            # 128-lane chunks (576 -> 768): the kernel views the latent pool
            # as [rows, C, 128] and bf16 sublane tiling needs C % 2 == 0.
            # MHA head dims route through the merged kernel and stay exact.
            head_dim=(
                -(-mc.kv_head_dim // 256) * 256 if mc.use_mla else mc.kv_head_dim
            ),
            dtype=kv_dtype,
            use_mla=mc.use_mla,
        )
        # Chunked combined layout on TPU for sub-lane head dims: the 5D
        # [L, 2, S, H, D<128] pool both pads 2x under XLA tiling and forces
        # a full-pool relayout copy per layer inside the kernel.
        if (
            attention_backend.get_attention_backend() == "pallas"
            and not mc.use_mla
            and mc.kv_head_dim % 128 != 0
            and (2 * mc.num_kv_heads_total * mc.kv_head_dim) % (8 * 128) == 0
            and 128 % mc.kv_head_dim == 0
        ):
            self.kv_spec = dataclasses.replace(self.kv_spec, chunked=True)
        kv_sharding = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            if self.dp_attn > 1:
                # DP-attention: the SLOT axis shards over "dp" — each rank
                # owns its partition's pages (allocator guarantees locality).
                if self.kv_spec.chunked:
                    kv_sharding = NamedSharding(self.mesh, P(None, "dp", None, None))
                else:
                    kv_sharding = NamedSharding(self.mesh, P(None, None, "dp", None, None))
            else:
                axis = "tp" if (not mc.use_mla and mc.num_kv_heads_total % self.mesh.shape["tp"] == 0 and mc.num_kv_heads_total >= self.mesh.shape["tp"]) else None
                if self.kv_spec.chunked:
                    # [L, S, CT, 128]: shard the chunk axis iff K and V segments
                    # each split evenly across ranks
                    half = self.kv_spec.chunks_total // 2
                    caxis = "tp" if (axis and half % self.mesh.shape["tp"] == 0) else None
                    kv_sharding = NamedSharding(self.mesh, P(None, None, caxis, None))
                else:
                    # pool layout [L, comp, S, H, D] — shard the kv-head axis
                    kv_sharding = NamedSharding(self.mesh, P(None, None, None, axis, None))
        if args.enable_double_sparsity:
            # Double-sparsity (ops/attention/double_sparsity.py): label
            # buffer in the pool + per-layer heavy-channel indices + top-k
            # budget on the model. MHA/GQA only; 5D pool layout (the jnp
            # sparse path indexes [slot, head]).
            assert not mc.use_mla, "double-sparsity targets MHA/GQA models"
            self.kv_spec = dataclasses.replace(
                self.kv_spec, chunked=False,
                ds_channels=args.ds_heavy_channel_num,
            )
            from semi_pd_tpu.ops.attention.double_sparsity import (
                load_channel_config,
            )

            ch = load_channel_config(
                args.ds_channel_config_path, mc.num_hidden_layers,
                mc.num_kv_heads_total, mc.num_attention_heads,
                mc.kv_head_dim, args.ds_heavy_channel_num,
                args.ds_heavy_channel_type,
            )
            self.model.ds_channels = jnp.asarray(ch)
            self.model.ds_heavy_token_num = args.ds_heavy_token_num
            self.model.ds_sparse_threshold = args.ds_sparse_decode_threshold
        self.kv_cache = KVCache(self.kv_spec, sharding=kv_sharding)
        self._kv_sharding = kv_sharding  # kept for resume (memory saver)
        self.page_allocator = PageAllocator(
            num_pages, page_size, partitions=self.dp_attn
        )
        self.req_pool = ReqToPagePool(self.max_running_requests, max_context, page_size)
        self.max_context_len = max_context
        logger.info(
            "KV pool: %d pages x %d tokens (%.2f GiB, dtype %s), max_running=%d",
            num_pages, page_size, self.kv_spec.bytes_total() / 2**30,
            kv_dtype.__name__, self.max_running_requests,
        )

    def release_kv_memory(self) -> None:
        """Free the KV pool's HBM between rollout phases (reference
        torch_memory_saver pause via /release_memory_occupation,
        scheduler.py:1633-1648). The caller must have flushed all requests;
        the pool array is deleted on device and recreated by resume."""
        for buf in self.kv_cache.buffers:
            buf.delete()
        self.kv_cache.buffers = ()
        if self.draft_kv is not None:
            for buf in self.draft_kv.buffers:
                buf.delete()
            self.draft_kv.buffers = ()

    def resume_kv_memory(self) -> None:
        from semi_pd_tpu.mem.pool import KVCache

        if getattr(self.kv_cache, "buffers", ()):
            return  # not released
        self.kv_cache = KVCache(self.kv_spec, sharding=self._kv_sharding)
        if self.draft_kv is not None:
            dspec = dataclasses.replace(
                self.kv_spec, num_layers=1, chunked=False)
            self.draft_kv = KVCache(dspec)

    def _profile_kv_tokens(self, kv_dtype) -> int:
        """Size the KV pool from free HBM (reference model_runner.py:951
        profile_max_num_token)."""
        mc = self.model_config
        per_token = (
            mc.num_hidden_layers
            * mc.num_kv_heads_total
            * mc.kv_head_dim
            * np.dtype(kv_dtype).itemsize
            * (1 if mc.use_mla else 2)
        )
        dev = jax.devices()[0]
        stats = getattr(dev, "memory_stats", lambda: None)() or {}
        limit = stats.get("bytes_limit")
        in_use = stats.get("bytes_in_use", 0)
        if limit:
            frac = self.server_args.mem_fraction_static or 0.9
            free = limit * frac - in_use
            tokens = int(free // per_token)
            return max(tokens, 4096)
        # CPU / unknown platform: small default for tests
        return 32768

    # ------------------------------------------------------------- step fn
    def _stamp_kv_scales(self, fb: ForwardArrays) -> ForwardArrays:
        """Attach this runner's fp8-KV scales to the batch (inside the traced
        step fns, so the scales ride each program as this runner's own
        constant — never another runner's)."""
        if self.kv_scales is None:
            return fb
        return fb._replace(kv_scales=self.kv_scales)

    def _build_step_fns(self):
        model = self.model
        stamp = self._stamp_kv_scales

        nan_check = self.server_args.enable_nan_detection

        def _step(params, kv, fb: ForwardArrays, vocab_mask=None, penalties=None):
            logits, kv = model.forward(params, stamp(fb), kv)
            if nan_check:
                # reference model_runner.py:157 enable_nan_detection
                logits = jax.lax.cond(
                    jnp.any(jnp.isnan(logits)),
                    lambda l: jnp.full_like(l, -1e30).at[:, 0].set(0.0),
                    lambda l: l,
                    logits,
                )
            new_key, sample_key = jax.random.split(fb.rng_key)
            next_tokens = sampling_ops.sample(
                logits, fb.sampling, sample_key, vocab_mask, penalties
            )
            logprobs = sampling_ops.compute_logprobs(logits, next_tokens)
            return next_tokens, logprobs, new_key, kv

        # donate kv buffers: in-place updates on the unified storage.
        # Three compiled variants so the common unconstrained/unpenalized
        # path carries no [B,V] mask or histogram work.
        self.step_fn = _step  # unjitted (graft entry / tests)
        self._step_jit = jax.jit(_step, donate_argnums=(1,))
        self._step_masked_jit = jax.jit(_step, donate_argnums=(1,))

        from semi_pd_tpu.ops.attention.ragged_paged_attention import AttnMeta
        from semi_pd_tpu.ops.sampling import SamplingArrays

        def _unpack_fb(ints, floats, rng_key, T, B, maxP, NQB,
                       input_override=None):
            """Inverse of HostBatch.pack() — static-offset slices, free
            under jit."""
            o = [0]

            def take(n):
                a = ints[o[0] : o[0] + n]
                o[0] += n
                return a

            input_ids = take(T)
            q_req_idx = take(T)
            q_pos = take(T)
            out_slots = take(T)
            page_table = take(B * maxP).reshape(B, maxP)
            kv_lens = take(B)
            logits_idx = take(B)
            q_lens = take(B)
            q_start = take(B)
            block_seq = take(NQB)
            block_row = take(NQB)
            block_qofs = take(NQB)
            top_k = take(B)
            num_reqs = take(1)[0]
            f = [floats[i * B : (i + 1) * B] for i in range(6)]
            if input_override is not None:
                input_ids = input_override
            return ForwardArrays(
                input_ids=input_ids, q_req_idx=q_req_idx, q_pos=q_pos,
                out_slots=out_slots, page_table=page_table, kv_lens=kv_lens,
                logits_idx=logits_idx,
                sampling=SamplingArrays(
                    temperature=f[0], top_k=top_k, top_p=f[1], min_p=f[2],
                    presence_penalty=f[3], frequency_penalty=f[4],
                    repetition_penalty=f[5],
                ),
                rng_key=rng_key,
                num_reqs=num_reqs,
                attn_meta=AttnMeta(
                    q_lens=q_lens, q_start=q_start, block_seq=block_seq,
                    block_row=block_row, block_qofs=block_qofs,
                ),
            )

        def _step_packed(params, kv, ints, floats, rng_key, T, B, maxP, NQB):
            fb = _unpack_fb(ints, floats, rng_key, T, B, maxP, NQB)
            return _step(params, kv, fb)

        def _step_packed_chained(params, kv, ints, floats, rng_key,
                                 prev_tokens, T, B, maxP, NQB):
            # Overlap chaining: step N+1's inputs are step N's still-on-device
            # sampled tokens (reference future-token-ids trick,
            # tp_worker_overlap_thread.py:44-50).
            fb = _unpack_fb(ints, floats, rng_key, T, B, maxP, NQB,
                            input_override=prev_tokens)
            return _step(params, kv, fb)

        self._step_packed_jit = jax.jit(
            _step_packed, donate_argnums=(1,), static_argnums=(5, 6, 7, 8)
        )
        self._step_packed_chained_jit = jax.jit(
            _step_packed_chained, donate_argnums=(1,),
            static_argnums=(6, 7, 8, 9),
        )

        if self.dp_attn > 1:
            self._build_dp_step_fns(_step, _unpack_fb)

        def _spec_step(params, kv, fb: ForwardArrays, drafts, draft_lens, gamma):
            from semi_pd_tpu.runtime.speculative import verify_and_accept

            logits, kv = model.forward(params, stamp(fb), kv)  # logits_idx covers all rows
            new_key, sub = jax.random.split(fb.rng_key)
            accept_len, next_tok = verify_and_accept(
                logits, drafts, draft_lens, fb.sampling, sub, gamma,
                threshold_single=self.server_args.speculative_accept_threshold_single,
                threshold_acc=self.server_args.speculative_accept_threshold_acc,
            )
            return accept_len, next_tok, new_key, kv

        self._spec_step_jit = jax.jit(
            _spec_step, donate_argnums=(1,), static_argnums=(5,)
        )

    def _build_dp_step_fns(self, _step, _unpack_fb):
        """DP-attention step (reference srt/layers/dp_attention.py:31-240 +
        scheduler idle-batch sync :1339-1423, re-derived for TPU): the step is
        shard_mapped MANUALLY over the "dp" mesh axis — each dp rank holds its
        partition of the KV pool's slot axis and runs attention + MLP +
        sampling over ITS requests only — while "tp" stays an AUTO (GSPMD)
        axis, so weights keep their tensor-parallel sharding inside the
        manual region. Batches arrive as per-rank packed vectors (see
        _dp_blocked) with rank-LOCAL page/slot/request indices; sampled
        tokens are regathered to the scheduler's global request order with a
        host-computed permutation, in-program."""
        mesh = self.mesh
        n = self.dp_attn

        def _core(params, kv, ints, floats, keys, override, shapes):
            T, B, maxP, NQB = shapes
            ov = override[0] if override is not None else None
            fb = _unpack_fb(ints[0], floats[0], keys[0], T, B, maxP, NQB,
                            input_override=ov)
            tok, lp, newk, kv = _step(params, kv, fb)
            return tok[None], lp[None], newk[None], kv

        from jax.sharding import PartitionSpec as P

        def _kv_specs(kv):
            return tuple(
                P(None, "dp", None, None) if a.ndim == 4
                else P(None, None, "dp", None, None)
                for a in kv
            )

        def _dp_step(params, kv, ints, floats, keys, perm, b2g, prev_tokens,
                     T, B, maxP, NQB):
            pspecs = jax.tree.map(lambda _: P(), params)
            kvs = _kv_specs(kv)
            override = None
            ov_spec = None
            if prev_tokens is not None:
                # chained decode: previous step's GLOBAL-order device tokens
                # become this step's inputs, scattered to rank-blocked rows
                override = prev_tokens[b2g].reshape(n, B)
                ov_spec = P("dp", None)
            f = jax.shard_map(
                lambda p, k, i, fl, ke, ov: _core(p, k, i, fl, ke, ov,
                                                  (T, B, maxP, NQB)),
                mesh=mesh, axis_names={"dp"},
                in_specs=(pspecs, kvs, P("dp", None), P("dp", None),
                          P("dp"), ov_spec),
                out_specs=(P("dp", None), P("dp", None), P("dp"), kvs),
                check_vma=False,
            )
            tokb, lpb, keys2, kv = f(params, kv, ints, floats, keys, override)
            # blocked [n*B] -> global request order
            tok = tokb.reshape(-1)[perm]
            lp = lpb.reshape(-1)[perm]
            return tok, lp, keys2, kv

        self._dp_step_jit = jax.jit(
            _dp_step, donate_argnums=(1,),
            static_argnums=(8, 9, 10, 11), static_argnames=(),
        )
        # per-rank PRNG keys (each rank samples its own requests);
        # created lazily — rng_key is set after _build_step_fns in __init__
        self._dp_keys = None

    def _dp_blocked(self, hb):
        """Split a global HostBatch into per-dp-rank sub-batches with LOCAL
        indices, pack each, and stack. Returns (ints [n, Li], floats [n, Lf],
        shapes, perm [B_glob], b2g [n*B_blk])."""
        from semi_pd_tpu.runtime.batch import (
            build_decode_batch,
            build_extend_batch,
        )
        from semi_pd_tpu.runtime.forward_batch import ForwardMode

        n = self.dp_attn
        ppp = self.page_allocator.pages_per_part
        spr = ppp * self.server_args.page_size  # slots per rank
        args = self.server_args

        if hb.mode == ForwardMode.DECODE:
            groups = [[] for _ in range(n)]
            for r in hb.reqs:
                groups[r.dp_rank].append(r)
            B_blk = max(len(g) for g in groups)
            B_blk = next(b for b in args.decode_bs_buckets if b >= B_blk)
            subs = []
            for rank, g in enumerate(groups):
                sub = build_decode_batch(
                    g, self.req_pool.page_table, args.page_size,
                    [B_blk], [hb.maxP],
                )
                subs.append(sub)
        else:
            admitted = list(zip(hb.reqs, hb.extend_lens))
            groups = [[] for _ in range(n)]
            for item in admitted:
                groups[item[0].dp_rank].append(item)
            T_blk = max((sum(x for _, x in g) for g in groups if g), default=8)
            T_blk = next(
                (t for t in args.prefill_token_buckets if t >= T_blk),
                args.prefill_token_buckets[-1] if args.prefill_token_buckets
                else T_blk,
            )
            B_blk = max(len(g) for g in groups)
            B_blk = next(b for b in args.decode_bs_buckets if b >= B_blk)
            subs = []
            for rank, g in enumerate(groups):
                sub = build_extend_batch(
                    g, self.req_pool.page_table, args.page_size,
                    [T_blk], [B_blk], [hb.maxP],
                )
                subs.append(sub)

        perm = np.zeros(hb.B, np.int32)
        b2g = np.zeros(n * subs[0].B, np.int32)
        for rank, sub in enumerate(subs):
            off_p, off_s = rank * ppp, rank * spr
            sub.page_table = np.maximum(sub.page_table - off_p, 0)
            sub.out_slots = np.maximum(sub.out_slots - off_s, 0)
        pos_in_rank = [0] * n
        for i, r in enumerate(hb.reqs):
            rank = r.dp_rank
            j = pos_in_rank[rank]
            pos_in_rank[rank] += 1
            perm[i] = rank * subs[0].B + j
            b2g[rank * subs[0].B + j] = i
        packed = [sub.pack() for sub in subs]
        ints = np.stack([p[0] for p in packed])
        floats = np.stack([p[1] for p in packed])
        shapes = packed[0][2]  # (T, B, maxP, NQB)
        return ints, floats, shapes, perm, b2g

    def step_packed_dp(self, hb, prev_tokens=None):
        """DP-attention hot-loop step: per-rank packed vectors, one sharded
        dispatch; returns (tokens [B_glob], logprobs [B_glob]) in the
        scheduler's global request order."""
        from semi_pd_tpu.runtime.forward_batch import ForwardMode

        ints_np, floats_np, shapes, perm, b2g = self._dp_blocked(hb)
        return self.step_packed_dp_raw(
            ints_np, floats_np, shapes, perm, b2g,
            chained=prev_tokens is not None, prev_tokens=prev_tokens,
            is_decode=hb.mode == ForwardMode.DECODE,
        )

    def step_packed_dp_raw(self, ints_np, floats_np, shapes, perm, b2g,
                           chained=False, prev_tokens=None, is_decode=False):
        from jax.sharding import NamedSharding, PartitionSpec as P

        T, B, maxP, NQB = shapes
        dp_sh = NamedSharding(self.mesh, P("dp", None))
        if self._dp_keys is None:
            self._dp_keys = jax.random.split(self.rng_key, self.dp_attn)
        if chained and prev_tokens is None:
            prev_tokens = self._chain_tokens
        ints = jax.device_put(ints_np, dp_sh)
        floats = jax.device_put(floats_np, dp_sh)
        perm_d = jax.device_put(perm, self._replicated)
        b2g_d = jax.device_put(b2g, self._replicated)
        tok, lp, self._dp_keys, kv = self._dp_step_jit(
            self.params, self.kv_cache.arrays, ints, floats, self._dp_keys,
            perm_d, b2g_d, prev_tokens, T, B, maxP, NQB,
        )
        self.kv_cache.update(kv)
        if is_decode:
            self._chain_tokens = tok
        return tok, lp

    def step_packed(self, hb, prev_tokens=None) -> Tuple[jax.Array, jax.Array]:
        """Hot-loop step dispatch: two host->device transfers total (the
        packed int/float vectors from HostBatch.pack()). ``prev_tokens``
        chains the previous step's on-device sampled tokens as inputs
        (overlap scheduling). Returns device (next_tokens [B], logprobs [B]);
        non-blocking."""
        from semi_pd_tpu.runtime.forward_batch import ForwardMode

        return self.step_packed_raw(
            *hb.pack(),
            chained=prev_tokens is not None,
            prev_tokens=prev_tokens,
            is_decode=hb.mode == ForwardMode.DECODE,
        )

    def step_packed_raw(self, ints_np, floats_np, shapes, chained=False,
                        prev_tokens=None, is_decode=False):
        """Packed dispatch from raw host vectors — the multi-host mirror
        wire format (runtime/mirror.py): follower processes replay this
        call with the broadcast vectors; a chained call substitutes the
        process's own carried decode tokens (identical by SPMD symmetry)."""
        T, B, maxP, NQB = shapes
        if self._replicated is not None:
            ints = jax.device_put(ints_np, self._replicated)
            floats = jax.device_put(floats_np, self._replicated)
        else:
            ints = jnp.asarray(ints_np)
            floats = jnp.asarray(floats_np)
        if chained and prev_tokens is None:
            prev_tokens = self._chain_tokens
        if not chained:
            tok, lp, new_key, kv = self._step_packed_jit(
                self.params, self.kv_cache.arrays, ints, floats,
                self.rng_key, T, B, maxP, NQB,
            )
        else:
            tok, lp, new_key, kv = self._step_packed_chained_jit(
                self.params, self.kv_cache.arrays, ints, floats,
                self.rng_key, prev_tokens, T, B, maxP, NQB,
            )
        self.kv_cache.update(kv)
        self.rng_key = new_key
        if is_decode:
            self._chain_tokens = tok
        return tok, lp

    def step_host(self, hb, vocab_mask=None, penalties=None, chained=False):
        """Host-batch dispatch for the non-packable paths (grammar masks,
        penalties, multimodal leaves). All args are host values so the
        multi-host mirror can forward them verbatim; ``chained`` substitutes
        this process's carried decode tokens for the inputs."""
        from semi_pd_tpu.runtime.forward_batch import ForwardMode

        fb = hb.to_device(self.rng_key)
        if chained:
            fb = fb._replace(input_ids=self._chain_tokens)
        tok, lp = self.step(fb, vocab_mask, penalties)
        if hb.mode == ForwardMode.DECODE:
            self._chain_tokens = tok
        return tok, lp

    def step_with_hidden_host(self, hb, vocab_mask=None):
        return self.step_with_hidden(hb.to_device(self.rng_key), vocab_mask)

    # Host-batch speculative dispatches: all args are host values so the
    # multi-host mirror can forward them verbatim (like step_host).
    def eagle_step_host(self, hb, prev_hidden, gamma: int):
        return self.eagle_step(hb.to_device(self.rng_key), prev_hidden, gamma)

    def eagle_tree_step_host(self, hb, prev_hidden):
        return self.eagle_tree_step(hb.to_device(self.rng_key), prev_hidden)

    def spec_step_host(self, hb, drafts, draft_lens, gamma: int):
        return self.spec_step(
            hb.to_device(self.rng_key), drafts, draft_lens, gamma)

    def step_topk_host(self, hb, k: int, vocab_mask=None, penalties=None):
        """Step variant additionally returning the top-k logprob values+ids
        of each request's next-token distribution (reference
        logits_processor.py:194 output_top_logprobs_val/idx). Dispatched by
        the scheduler only for batches containing a request with
        top_logprobs_num > 0 — the hot path never carries the [B, k] extras.
        Returns device (tokens [B], logprobs [B], tk_vals [B, k] f32,
        tk_ids [B, k] i32)."""
        if not hasattr(self, "_step_topk_jit"):
            model = self.model
            stamp = self._stamp_kv_scales

            def _stepk(params, kv, fb, vocab_mask, penalties, k):
                logits, kv = model.forward(params, stamp(fb), kv)
                new_key, sample_key = jax.random.split(fb.rng_key)
                next_tokens = sampling_ops.sample(
                    logits, fb.sampling, sample_key, vocab_mask, penalties
                )
                logprobs = sampling_ops.compute_logprobs(logits, next_tokens)
                tv, ti = sampling_ops.top_logprobs(logits, k)
                return next_tokens, logprobs, tv, ti, new_key, kv

            self._step_topk_jit = jax.jit(
                _stepk, donate_argnums=(1,), static_argnums=(5,)
            )
        fb = hb.to_device(self.rng_key)
        extras = [vocab_mask, penalties]
        if self._replicated is not None:
            fb = jax.device_put(fb, self._replicated)
            extras = jax.device_put(extras, self._replicated)
        tok, lp, tv, ti, new_key, kv = self._step_topk_jit(
            self.params, self.kv_cache.arrays, fb, extras[0], extras[1], k
        )
        self.kv_cache.update(kv)
        self.rng_key = new_key
        from semi_pd_tpu.runtime.forward_batch import ForwardMode

        if hb.mode == ForwardMode.DECODE:
            self._chain_tokens = tok
        return tok, lp, tv, ti

    def score_topk_host(self, hb, targets, k: int):
        """Teacher-forced input logprobs WITH per-position top-k (reference
        input_top_logprobs, logits_processor.py:194): returns
        (tok_lp [T], tk_vals [T, k], tk_ids [T, k])."""
        if not hasattr(self, "_score_topk_jit"):
            model = self.model
            stamp = self._stamp_kv_scales

            def _scorek(params, kv, fb, targets, k):
                logits, kv = model.forward(params, stamp(fb), kv, all_logits=True)
                lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
                tok_lp = jnp.take_along_axis(lp, targets[:, None], axis=1)[:, 0]
                tv, ti = jax.lax.top_k(lp, k)
                return tok_lp, tv, ti.astype(jnp.int32), kv

            self._score_topk_jit = jax.jit(
                _scorek, donate_argnums=(1,), static_argnums=(4,)
            )
        fb = hb.to_device(self.rng_key)
        targets = jnp.asarray(targets, jnp.int32)
        if self._replicated is not None:
            fb = jax.device_put(fb, self._replicated)
            targets = jax.device_put(targets, self._replicated)
        tok_lp, tv, ti, kv = self._score_topk_jit(
            self.params, self.kv_cache.arrays, fb, targets, k
        )
        self.kv_cache.update(kv)
        return tok_lp, tv, ti

    def encode_step_host(self, hb):
        return self.encode_step(hb.to_device(self.rng_key))

    def score_step_host(self, hb, targets):
        return self.score_step(hb.to_device(self.rng_key), targets)

    def read_results(self, toks, lps, want_logprobs: bool = True):
        """Fused device->host readback of N steps' (tokens, logprobs): one
        concatenated transfer instead of 2N. D2H transfers carry a ~27ms
        fixed latency on tunneled TPU attachments (measured round 2) — this
        plus the scheduler's in-flight ring amortizes it across
        overlap_depth steps. When no request in the cycle asked for
        logprobs the payload drops to tokens only, packed u16 when the
        vocab fits (4x fewer bytes; reference overlap design keeps the
        copy-out minimal, tp_worker_overlap_thread.py:142-238). Returns
        (list of np token vecs, list of np logprob vecs | Nones)."""
        lens = tuple(int(t.shape[0]) for t in toks)
        if not want_logprobs:
            u16 = self.model_config.vocab_size <= 0xFFFF
            fn = self._read_jits.get((lens, "tok"))
            if fn is None:
                def _packt(ts):
                    ti = jnp.concatenate([t.astype(jnp.int32) for t in ts])
                    return ti.astype(jnp.uint16) if u16 else ti

                fn = jax.jit(_packt)
                self._read_jits[(lens, "tok")] = fn
            ti = np.asarray(jax.device_get(fn(list(toks)))).astype(np.int32)
            out_t, o = [], 0
            for L in lens:
                out_t.append(ti[o : o + L])
                o += L
            return out_t, [None] * len(lens)
        fn = self._read_jits.get((lens, "full"))
        if fn is None:
            def _pack(ts, ls):
                ti = jnp.concatenate([t.astype(jnp.int32) for t in ts])
                li = jax.lax.bitcast_convert_type(
                    jnp.concatenate([l.astype(jnp.float32) for l in ls]),
                    jnp.int32,
                )
                return jnp.concatenate([ti, li])

            fn = jax.jit(_pack)
            self._read_jits[(lens, "full")] = fn
        flat = np.asarray(jax.device_get(fn(list(toks), list(lps))))
        n = sum(lens)
        ti, li = flat[:n], flat[n:].view(np.float32)
        out_t, out_l, o = [], [], 0
        for L in lens:
            out_t.append(ti[o : o + L])
            out_l.append(li[o : o + L])
            o += L
        return out_t, out_l

    def step(
        self, fb: ForwardArrays, vocab_mask=None, penalties=None
    ) -> Tuple[jax.Array, jax.Array]:
        """Dispatch one (prefill or decode) step. Returns device arrays
        (next_tokens [B], logprobs [B]); KV buffers and RNG key are threaded
        internally. Non-blocking (JAX async dispatch). ``vocab_mask``
        [B, V] bool applies grammar constraints (separate compiled variant so
        unconstrained batches pay nothing)."""
        fb = fb._replace(rng_key=self.rng_key)
        if self._replicated is not None:
            fb = jax.device_put(fb, self._replicated)
        if vocab_mask is None and penalties is None:
            next_tokens, logprobs, new_key, kv = self._step_jit(
                self.params, self.kv_cache.arrays, fb
            )
        else:
            extras = [vocab_mask, penalties]
            if self._replicated is not None:
                extras = jax.device_put(extras, self._replicated)
            next_tokens, logprobs, new_key, kv = self._step_masked_jit(
                self.params, self.kv_cache.arrays, fb, extras[0], extras[1]
            )
        self.kv_cache.update(kv)
        self.rng_key = new_key
        return next_tokens, logprobs

    def score_step(self, fb: ForwardArrays, targets):
        """Teacher-forced input logprobs: log p(targets[t] | tokens <= t) for
        every flat row t of an extend batch (reference: return_logprob +
        logprob_start_len path, scheduler_output_processor_mixin.py
        input_token_logprobs). Rows whose target is the next request's first
        token (or padding) are discarded host-side."""
        if not hasattr(self, "_score_jit"):
            model = self.model
            stamp = self._stamp_kv_scales

            def _score(params, kv, fb, targets):
                logits, kv = model.forward(params, stamp(fb), kv, all_logits=True)
                lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
                tok_lp = jnp.take_along_axis(lp, targets[:, None], axis=1)[:, 0]
                return tok_lp, kv

            self._score_jit = jax.jit(_score, donate_argnums=(1,))
        fb = fb._replace(rng_key=self.rng_key)
        targets = jnp.asarray(targets, jnp.int32)
        if self._replicated is not None:
            fb = jax.device_put(fb, self._replicated)
            targets = jax.device_put(targets, self._replicated)
        lp, kv = self._score_jit(self.params, self.kv_cache.arrays, fb, targets)
        self.kv_cache.update(kv)
        return lp

    def encode_step(self, fb: ForwardArrays):
        """Embedding forward: returns [B, H] normalized pooled embeddings
        (reference: /encode path, Pooler LAST)."""
        if not hasattr(self, "_encode_jit"):
            model = self.model
            stamp = self._stamp_kv_scales

            def _encode(params, kv, fb):
                emb, kv = model.forward_embedding(params, stamp(fb), kv)
                return emb, kv

            self._encode_jit = jax.jit(_encode, donate_argnums=(1,))
        fb = fb._replace(rng_key=self.rng_key)
        if self._replicated is not None:
            fb = jax.device_put(fb, self._replicated)
        emb, kv = self._encode_jit(self.params, self.kv_cache.arrays, fb)
        self.kv_cache.update(kv)
        return emb

    def _init_eagle(self):
        """EAGLE draft net + draft KV pool sharing the target's slot space
        (speculative/eagle.py)."""
        from semi_pd_tpu.mem.pool import KVCache
        from semi_pd_tpu.model_loader.loader import device_put_params, load_params
        from semi_pd_tpu.models.deepseek_v2 import DeepseekV2ForCausalLM
        from semi_pd_tpu.speculative.eagle import EagleDraftModel, eagle_round

        mc = self.model_config
        if isinstance(self.model, DeepseekV2ForCausalLM):
            # DeepSeek targets draft with the NextN/MTP head (reference
            # srt/models/deepseek_nextn.py) — MLA latent draft pool.
            from semi_pd_tpu.speculative.nextn import NextNDraftModel

            self.draft_model = NextNDraftModel(self.model)
        else:
            self.draft_model = EagleDraftModel(mc)
            self.draft_model.page_size = self.server_args.page_size
        path = self.server_args.speculative_draft_model_path
        if path:
            self.draft_params = load_params(
                self.draft_model, model_path=path, mesh=self.mesh
            )
        else:
            host = self.draft_model.init_params(self.server_args.seed + 1)
            self.draft_params = device_put_params(host, self.draft_model, self.mesh)
        # Draft pool = one layer of the target pool layout (MHA or MLA
        # latent alike), sharing the unified slot space.
        dspec = dataclasses.replace(self.kv_spec, num_layers=1, chunked=False)
        self.draft_kv = KVCache(dspec)
        model = self.model
        draft = self.draft_model

        refresh = not self.server_args.speculative_disable_draft_refresh

        hot_ids = None
        if self.server_args.speculative_token_map:
            # FR-Spec: the draft head runs over the hot-vocab subset only
            # (reference eagle_worker.py:70-95 load_token_map + head slice).
            from semi_pd_tpu.speculative.eagle import load_token_map

            hot_np = load_token_map(self.server_args.speculative_token_map)
            hot_ids = jnp.asarray(hot_np, dtype=jnp.int32)
            logger.info("FR-Spec hot vocab: %d of %d tokens", hot_np.size,
                        mc.vocab_size)

        self._spec_hot_ids = hot_ids
        self._spec_refresh = refresh
        self._rebuild_eagle_jit()

        self.tree_template = None
        if self.server_args.speculative_eagle_topk > 1:
            from semi_pd_tpu.speculative.eagle import eagle_tree_round
            from semi_pd_tpu.speculative.tree import default_tree_template

            self.tree_template = default_tree_template(
                self.server_args.speculative_eagle_topk,
                self.server_args.speculative_num_draft_tokens,
            )

            hot_head = self._slice_hot_head(hot_ids)

            def _eagle_tree(params, dparams, kv, dkv, fb, prev_hidden, tree):
                return eagle_tree_round(
                    model, draft, params, dparams, kv, dkv,
                    self._stamp_kv_scales(fb), prev_hidden,
                    tree, refresh=refresh, hot_ids=hot_ids,
                    hot_head=hot_head,
                )

            self._eagle_tree_jit = jax.jit(
                _eagle_tree, donate_argnums=(2, 3), static_argnums=(6,)
            )

    def _rebuild_eagle_jit(self) -> None:
        """(Re)create the fused EAGLE round program. The acceptance
        thresholds are trace-time constants, so the runtime-update path
        (/set_internal_state, reference scheduler.py:1536-1560 — only these
        two knobs are updatable) re-jits through here."""
        from semi_pd_tpu.speculative.eagle import eagle_round

        model, draft = self.model, self.draft_model
        refresh, hot_ids = self._spec_refresh, self._spec_hot_ids
        hot_head = self._slice_hot_head(hot_ids)

        def _eagle(params, dparams, kv, dkv, fb, prev_hidden, gamma):
            return eagle_round(
                model, draft, params, dparams, kv, dkv,
                self._stamp_kv_scales(fb), prev_hidden,
                gamma, refresh=refresh,
                threshold_single=self.server_args.speculative_accept_threshold_single,
                threshold_acc=self.server_args.speculative_accept_threshold_acc,
                hot_ids=hot_ids, hot_head=hot_head,
            )

        self._eagle_jit = jax.jit(
            _eagle, donate_argnums=(2, 3), static_argnums=(6,)
        )

    def _slice_hot_head(self, hot_ids):
        """Pre-slice the lm_head to the FR-Spec hot vocab ONCE (reference
        eagle_worker.py:92-95 slices head.data at load) — gathering inside
        the jitted round would re-read the full [H, V] head every round,
        eroding the GEMM savings the map exists to provide."""
        if hot_ids is None:
            return None
        from semi_pd_tpu.speculative.eagle import _hot_head

        head = self.params.get("lm_head")
        if head is None:
            head = {"w": self.params["embed"]["w"].T}
        return _hot_head(head, hot_ids)

    def set_spec_thresholds(self, single=None, acc=None) -> None:
        if single is not None:
            self.server_args.speculative_accept_threshold_single = float(single)
        if acc is not None:
            self.server_args.speculative_accept_threshold_acc = float(acc)
        if self.draft_model is not None:
            self._rebuild_eagle_jit()

    def eagle_step(self, fb: ForwardArrays, prev_hidden, gamma: int):
        """Fused EAGLE round. Returns device (accept_len, next_tok,
        drafts [B, gamma], next_hidden [B, H])."""
        fb = fb._replace(rng_key=self.rng_key)
        ph = jnp.asarray(prev_hidden, dtype=self.model.dtype)
        if self._replicated is not None:
            fb = jax.device_put(fb, self._replicated)
            ph = jax.device_put(ph, self._replicated)
        (accept_len, next_tok, drafts, next_hidden, new_key, kv, dkv) = (
            self._eagle_jit(
                self.params, self.draft_params, self.kv_cache.arrays,
                self.draft_kv.arrays[0], fb, ph, gamma,
            )
        )
        self.kv_cache.update(kv)
        self.draft_kv.update((dkv,))
        self.rng_key = new_key
        return accept_len, next_tok, drafts, next_hidden

    def eagle_tree_step(self, fb: ForwardArrays, prev_hidden):
        """Fused EAGLE tree round (speculative/eagle.py eagle_tree_round).
        Returns device (accept_len [B], next_tok [B], path_tokens [B, depth],
        next_hidden [B, H])."""
        fb = fb._replace(rng_key=self.rng_key)
        ph = jnp.asarray(prev_hidden, dtype=self.model.dtype)
        if self._replicated is not None:
            fb = jax.device_put(fb, self._replicated)
            ph = jax.device_put(ph, self._replicated)
        (accept_len, next_tok, path_tokens, next_hidden, new_key, kv, dkv) = (
            self._eagle_tree_jit(
                self.params, self.draft_params, self.kv_cache.arrays,
                self.draft_kv.arrays[0], fb, ph, self.tree_template,
            )
        )
        self.kv_cache.update(kv)
        self.draft_kv.update((dkv,))
        self.rng_key = new_key
        return accept_len, next_tok, path_tokens, next_hidden

    def step_with_hidden(self, fb: ForwardArrays, vocab_mask=None):
        """Like step() but also returns the last-token hidden states [B, H]
        (seeds the EAGLE draft after prefill)."""
        model = self.model
        stamp = self._stamp_kv_scales
        if not hasattr(self, "_step_hidden_jit"):
            def _steph(params, kv, fb, vocab_mask=None):
                logits, kv, hidden = model.forward(
                    params, stamp(fb), kv, return_hidden=True
                )
                new_key, sample_key = jax.random.split(fb.rng_key)
                next_tokens = sampling_ops.sample(
                    logits, fb.sampling, sample_key, vocab_mask
                )
                logprobs = sampling_ops.compute_logprobs(logits, next_tokens)
                return next_tokens, logprobs, hidden, new_key, kv

            self._step_hidden_jit = jax.jit(_steph, donate_argnums=(1,))
        fb = fb._replace(rng_key=self.rng_key)
        if self._replicated is not None:
            fb = jax.device_put(fb, self._replicated)
        next_tokens, logprobs, hidden, new_key, kv = self._step_hidden_jit(
            self.params, self.kv_cache.arrays, fb, vocab_mask
        )
        self.kv_cache.update(kv)
        self.rng_key = new_key
        return next_tokens, logprobs, hidden

    def spec_step(self, fb: ForwardArrays, drafts, draft_lens, gamma: int):
        """Speculative verify step (runtime/speculative.py). Returns device
        (accept_len [B], next_token [B])."""
        fb = fb._replace(rng_key=self.rng_key)
        args = [jnp.asarray(drafts), jnp.asarray(draft_lens)]
        if self._replicated is not None:
            fb = jax.device_put(fb, self._replicated)
            args = jax.device_put(args, self._replicated)
        accept_len, next_tok, new_key, kv = self._spec_step_jit(
            self.params, self.kv_cache.arrays, fb, args[0], args[1], gamma
        )
        self.kv_cache.update(kv)
        self.rng_key = new_key
        return accept_len, next_tok

    # ------------------------------------------------------------- lora
    def install_lora(self, lora_host_tree: Dict[str, Any]) -> None:
        """Install a stacked adapter pytree (host numpy values from
        LoRAManager._stack) into the live param tree — replicated over the
        mesh so every shard computes the same deltas; a host-value entry
        point so the multi-host mirror can forward it verbatim."""
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(self.mesh, P())
            dev = {k: jax.device_put(v, rep)
                   for k, v in lora_host_tree.items()}
        else:
            dev = {k: jnp.asarray(v) for k, v in lora_host_tree.items()}
        self.params["layers"]["lora"] = dev

    # ------------------------------------------------------------- vision
    def _host_np(self, a) -> np.ndarray:
        """Device -> host for REPLICATED outputs. On a multi-process mesh a
        replicated array is not fully addressable; every process holds the
        full value in each local shard, so read shard 0."""
        if getattr(a, "is_fully_addressable", True):
            return np.asarray(a)
        return np.asarray(a.addressable_shards[0].data)

    def encode_images(self, pixel_values: np.ndarray) -> np.ndarray:
        """Multimodal: [N, 3, H, W] -> projected patch embeddings (np)."""
        if not hasattr(self, "_img_jit"):
            model = self.model

            def _enc(params, px):
                return model.encode_images(params, px)

            self._img_jit = jax.jit(_enc, out_shardings=self._replicated)
        return self._host_np(
            self._img_jit(self.params, jnp.asarray(pixel_values, jnp.float32))
        )

    def encode_images_cross(self, image) -> np.ndarray:
        """mllama cross-attention vision states for ONE image (models/
        mllama.py encode_tiles), jitted so multi-host followers can replay
        it in lockstep."""
        px, ratio_id, n_tiles = self.model.preprocess_image(image)
        if not hasattr(self, "_imgx_jits"):
            self._imgx_jits = {}
        key = (ratio_id, n_tiles, px.shape)
        fn = self._imgx_jits.get(key)
        if fn is None:
            model = self.model

            def _enc(params, px):
                return model.encode_tiles(params, px, ratio_id, n_tiles)

            fn = jax.jit(_enc, out_shardings=self._replicated)
            self._imgx_jits[key] = fn
        return self._host_np(fn(self.params, jnp.asarray(px))).astype(
            np.float32)

    def encode_images_patches(self, patches, grid) -> np.ndarray:
        """qwen2-vl variable-resolution patches -> merged embeddings; grid
        (t, h, w) is a trace-time constant."""
        if not hasattr(self, "_imgp_jits"):
            self._imgp_jits = {}
        fn = self._imgp_jits.get(tuple(grid))
        if fn is None:
            model = self.model

            def _enc(params, px):
                return model.encode_images(params, px, tuple(grid))

            fn = jax.jit(_enc, out_shardings=self._replicated)
            self._imgp_jits[tuple(grid)] = fn
        return self._host_np(fn(self.params, jnp.asarray(patches)))

    # -------------------------------------------------- hierarchical cache
    def download_pages_async(self, page_ids: np.ndarray):
        """DISPATCH a gather of whole KV pages; returns the device array
        without blocking. Dispatch order against the donated-buffer step
        programs guarantees the read sees the pages' current contents even
        if a later step (or page reuse) overwrites them — so the caller may
        free the pages immediately and hand the array to the async
        controller for the blocking device_get."""
        if not hasattr(self, "_dl_jit"):
            P = self.kv_spec.page_size

            def _dl(kv, pages):
                pool = kv[0]
                slots = (
                    pages[:, None] * P + jnp.arange(P, dtype=jnp.int32)[None, :]
                ).reshape(-1)
                if pool.ndim == 4:  # chunked [L, S, CT, 128]
                    return pool[:, slots]  # [L, n*P, CT, 128]
                return pool[:, :, slots]  # [L, nc, n*P, H, D]

            # replicated output: the hicache worker device_gets it on
            # the host; on a multi-process mesh the tp-sharded pool gather
            # must allgather in lockstep (runtime/mirror.py 'hdl')
            self._dl_jit = jax.jit(_dl, out_shardings=self._replicated)
        return self._dl_jit(
            self.kv_cache.arrays, jnp.asarray(page_ids, jnp.int32)
        )

    def split_pages(self, data: np.ndarray, n: int) -> list:
        """Split a downloaded gather into per-page host buffers
        ([L, ncomp, page_size, H, D] each)."""
        P = self.kv_spec.page_size
        if self.kv_spec.chunked:  # [L, n*P, CT, 128] -> per page [L, P, CT, 128]
            data = data.reshape(data.shape[0], n, P, *data.shape[2:])
            return [np.ascontiguousarray(data[:, i]) for i in range(n)]
        data = data.reshape(data.shape[0], data.shape[1], n, P, *data.shape[3:])
        return [np.ascontiguousarray(data[:, :, i]) for i in range(n)]

    def download_pages(self, page_ids: np.ndarray) -> list:
        """Blocking read of whole KV pages to host numpy (tests / sync
        callers). Returns one [L, ncomp, page_size, H, D] array per page."""
        data = np.asarray(self.download_pages_async(page_ids))
        return self.split_pages(data, len(page_ids))

    def upload_pages(self, page_ids: np.ndarray, bufs: list) -> None:
        """Write host page buffers into freshly allocated device pages."""
        if not hasattr(self, "_ul_jit"):
            P = self.kv_spec.page_size

            def _ul(kv, pages, data):
                pool = kv[0]
                n = pages.shape[0]
                slots = (
                    pages[:, None] * P + jnp.arange(P, dtype=jnp.int32)[None, :]
                ).reshape(-1)
                if pool.ndim == 4:  # chunked: data [n, L, P, CT, 128]
                    d = jnp.moveaxis(data, 0, 1)  # [L, n, P, CT, 128]
                    d = d.reshape(d.shape[0], n * P, *d.shape[3:])
                    return (pool.at[:, slots].set(d.astype(pool.dtype)),)
                # data: [n, L, nc, P, H, D] -> [L, nc, n*P, H, D]
                d = jnp.moveaxis(data, 0, 2)  # [L, nc, n, P, H, D]
                d = d.reshape(d.shape[0], d.shape[1], n * P, *d.shape[4:])
                return (pool.at[:, :, slots].set(d.astype(pool.dtype)),)

            self._ul_jit = jax.jit(_ul, donate_argnums=(0,))
        stacked = jnp.asarray(np.stack(bufs))  # [n, L, nc, P, H, D]
        self.kv_cache.update(
            self._ul_jit(
                self.kv_cache.arrays, jnp.asarray(page_ids, jnp.int32), stacked
            )
        )

    # ------------------------------------------------------------- misc
    def update_weights(self, weights_iter, partial: bool = False) -> None:
        """Live weight update (reference model_runner.py:733
        update_weights_from_disk / :845 from_distributed). Both phases see the
        new weights atomically because there is one params pytree. With
        ``partial`` only the named tensors are touched (RL loops send one
        tensor per call; a full reload would zero the rest)."""
        if partial:
            from semi_pd_tpu.model_loader.loader import update_params

            self.params = update_params(
                self.model, self.params, weights_iter, mesh=self.mesh
            )
        else:
            self.params = load_params(
                self.model, weights=weights_iter, mesh=self.mesh
            )
