"""Server configuration.

TPU-native counterpart of the reference's ServerArgs dataclass
(reference: python/sglang/srt/server_args.py:63-1050 — ~120 CLI flags, one
dataclass shared by CLI, HTTP server and the offline Engine). We keep that
single-source-of-truth shape but drop GPU-only knobs (MPS percentiles, NCCL
ports, cuda-graph flags) and replace them with TPU-native ones:

- ``prefill_chunk_budget_tokens`` / ``decode_slo_ms`` replace
  ``SEMI_PD_{PREFILL,DECODE}_SM_PERCENTILE`` (compute isolation on TPU is
  achieved by bounding the per-tick prefill chunk cost so the decode cadence
  stays under the TPOT SLO, not by SM partitioning).
- ``decode_bs_buckets`` / ``prefill_token_buckets`` replace CUDA-graph
  capture batch sizes (reference cuda_graph_runner.py:109) — bucketed static
  shapes for the jitted decode/prefill programs.
- mesh shape flags (``tp_size``, ``dp_size``, ``ep_size``) map onto a
  ``jax.sharding.Mesh`` instead of process-per-rank NCCL groups.
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
from typing import List, Optional

logger = logging.getLogger(__name__)

# Reference flags that are CUDA machinery with no TPU meaning: accepted by
# the CLI (so a reference launch command runs unchanged) and warned about.
_IGNORED_REFERENCE_FLAGS = (
    "--disable-cuda-graph", "--disable-cuda-graph-padding",
    "--cuda-graph-max-bs", "--cuda-graph-bs",
    "--enable-torch-compile", "--torch-compile-max-bs",
    "--disable-custom-all-reduce", "--enable-nccl-nvls",
    "--enable-p2p-check", "--base-gpu-id", "--gpu-id-step",
    "--triton-attention-num-kv-splits", "--triton-attention-reduce-in-fp32",
    "--enable-flashinfer-mla", "--flashinfer-mla-disable-ragged",
    "--disable-mla", "--cpu-offload-gb", "--torchao-config",
    "--lora-backend", "--sampling-backend-legacy",
)


@dataclasses.dataclass
class ServerArgs:
    # Model and tokenizer
    model_path: str = ""
    # HF hub cache directory for config/tokenizer/processor resolution
    # (reference --download-dir; changes WHERE checkpoints are resolved, so
    # it must not be silently ignored)
    download_dir: Optional[str] = None
    tokenizer_path: Optional[str] = None
    tokenizer_mode: str = "auto"  # auto (fast when available) | slow
    skip_tokenizer_init: bool = False  # token-id API only (trainer loops)
    # JSON dict merged over the HF config (reference server_args.py
    # json_model_override_args; e.g. '{"rope_scaling": null}')
    json_model_override_args: str = "{}"
    # auto (detect: gguf > safetensors > *.bin) | safetensors | pt | gguf
    load_format: str = "auto"
    trust_remote_code: bool = True
    context_length: Optional[int] = None
    # Truncate over-length prompts to the context window instead of
    # aborting them (reference allow_auto_truncate)
    allow_auto_truncate: bool = False
    dtype: str = "bfloat16"  # model compute/weight dtype
    kv_cache_dtype: str = "auto"  # auto | bfloat16 | fp8_e4m3 | fp8_e5m2
    # Calibrated per-layer fp8-KV scale JSON (reference
    # --quantization-param-path; vLLM kv_cache_scales schema). Stored KV is
    # divided by the scale (using the fp8 range) and reads rescale exactly
    # by linearity — see ForwardArrays.kv_scales (layers/attention.py).
    quantization_param_path: Optional[str] = None
    quantization: Optional[str] = None  # fp8 | int8 | awq_int4 | blockwise_fp8
    random_weights: bool = False  # skip checkpoint load; random-init (tests/bench)
    # HF revision forwarded to config/tokenizer loading (reference --revision;
    # only meaningful when the transformers cache already holds it — this
    # build environment has no egress to download one)
    revision: Optional[str] = None
    # Delete checkpoint weight files after a successful load to reclaim disk
    # (reference --delete-ckpt-after-loading, model_loader weight_utils)
    delete_ckpt_after_loading: bool = False
    seed: int = 0

    # Memory / KV cache
    mem_fraction_static: Optional[float] = None
    max_total_tokens: Optional[int] = None  # KV pool size in tokens (overrides profile)
    page_size: int = 16  # tokens per KV page (TPU-friendly granularity)
    max_running_requests: Optional[int] = None
    max_queued_requests: int = 4096
    max_prefill_tokens: int = 16384

    # Scheduling
    schedule_policy: str = "lpm"  # lpm | fcfs | lof | random | dfs-weight
    # Reference --enable-mixed-chunk: colocated ticks run decode alongside
    # the prefill chunk (ForwardMode.MIXED analog; see _tick_colocated)
    enable_mixed_chunk: bool = False
    # Reference --num-continuous-decode-steps: decode iterations per
    # scheduler loop; aliased onto overlap_depth (see __post_init__)
    num_continuous_decode_steps: Optional[int] = None
    # Reference --is-embedding: serve pooling/encode only; generation
    # entry points reject
    is_embedding: bool = False
    disable_overlap_schedule: bool = False  # overlap decode pipeline
    # In-flight step pipeline depth: results are read back in one fused
    # device->host transfer every `overlap_depth` steps. Device->host reads
    # carry a large fixed latency on remote/tunneled TPU attachments
    # (~27ms measured vs ~13ms decode step); amortizing them is the TPU
    # analog of the reference's one-batch-behind overlap worker
    # (tp_worker_overlap_thread.py). Raises per-token delivery delay by up
    # to depth steps; EOS overshoot wastes at most depth-1 steps.
    overlap_depth: int = 4
    # Adaptive ring depth (the default): every flush the scheduler re-sizes
    # the ring toward ceil(readback_cost / step_cost) — on tunneled TPU
    # attachments the fixed D2H latency (~45ms measured) dwarfs a ~1ms decode
    # step, so a static depth of 4 leaves the device idle most of the cycle —
    # clamped to [overlap_depth, max_overlap_depth] and to max_stall_ms.
    # Disabled automatically when --num-continuous-decode-steps pins a depth.
    adaptive_overlap_depth: bool = True
    # Backstop only — the live bounds are the stall cap and the remaining-
    # token cap (_ring_target). Round-4 capture: with packed decode at
    # ~1 ms/step against a ~134 ms readback the ring wanted depth ~140 and
    # the old cap of 64 was the binding constraint on decode throughput.
    max_overlap_depth: int = 256
    # Bound on one flush cycle (the client-visible token-burst gap: results
    # are delivered depth tokens at a time). None = 4 x decode_slo_ms.
    max_stall_ms: Optional[float] = None
    schedule_conservativeness: float = 1.0
    chunked_prefill_size: int = 2048
    disable_radix_cache: bool = False
    enable_hierarchical_cache: bool = False  # host-RAM KV tier (mem/hicache.py)
    hicache_max_bytes: int = 8 << 30
    # write_through | write_through_selective (reference server_args.py
    # hicache_write_policy; selective only writes prefixes with shown reuse)
    hicache_write_policy: str = "write_through"
    retract_decode_steps: int = 20  # new tokens to reserve headroom for on retract

    # Semi-PD (phase-disaggregated computation, unified storage)
    enable_semi_pd: bool = False
    decode_slo_ms: float = 50.0  # target TPOT; bounds prefill chunk per tick
    prefill_chunk_budget_tokens: Optional[int] = None  # override auto chunk bound
    semi_pd_prefill_share: float = 0.8  # fraction of a tick prefill may occupy
    # Interference bound RELATIVE to the pure decode flush cycle: prefill may
    # inflate the client-visible token-burst gap by at most this factor over
    # a decode-only cycle (readback + depth decode steps). This is what makes
    # semi-PD dominate — never merely trade against — the colocated baseline
    # on ITL: when decode_slo_ms leaves lots of slack, the stretch bound
    # still caps visible interference; when the SLO is unattainable, the
    # stretch bound is scale-free and degrades gracefully (reference MPS
    # SM-split analog: prefill always gets its share, engine.py:591-642).
    semi_pd_max_cycle_stretch: float = 1.35
    # Absolute per-flush-cycle grace added to the stretch allowance: on a
    # fast device a purely relative bound over-throttles (a 5 ms prompt is
    # 5x a 1 ms cycle yet invisible against any human SLO); 1 ms/cycle is
    # negligible against the tunneled attachment's ~200 ms cycles.
    semi_pd_stretch_grace_ms: float = 1.0
    # Queue-pressure relief: when the oldest waiting prompt has aged past
    # this, the interference allowance ramps (linearly over a second
    # interval) from the stretch bound toward the MPS-proportional share —
    # bounded interference is the goal only while prefill supply covers
    # demand; TTFT is part of the goodput contract too.
    semi_pd_queue_relief_ms: float = 500.0
    # Per-chunk useful compute must be at least this multiple of the fixed
    # chunk dispatch overhead before a chunk is dispatched; the per-tick
    # allowance banks in a deficit counter until a chunk of that size is
    # affordable (round-4 driver data: dispatching one small chunk EVERY
    # tick made semi-PD ITL p95 worse than colocated — the per-chunk
    # overhead exceeded the interference it prevented).
    semi_pd_min_chunk_duty: float = 3.0

    # Parallelism (mesh)
    tp_size: int = 1
    dp_size: int = 1
    # DP-attention (reference srt/layers/dp_attention.py:31-240): requests
    # (and the KV pool's slot axis) shard over the "dp" mesh axis; weights
    # replicate over dp. Lifts the reference's restriction that DP-attention
    # and semi-PD are mutually exclusive (server_args.py:290-295) — the
    # single-controller design runs both. Radix cache is disabled (a shared
    # prefix tree would pin pages across dp partitions); speculative decoding
    # and EP are not yet composed with it.
    enable_dp_attention: bool = False
    ep_size: int = 1  # expert parallel; folded onto the tp axis
    # Reference --enable-ep-moe (boolean; implies experts sharded over the
    # whole TP group). Alias: sets ep_size = tp_size when ep_size is unset.
    enable_ep_moe: bool = False
    # Per-rank EP dispatch capacity = ceil(cf * T*K / ep_size) rows; routing
    # skew beyond it drops assignments (GShard-style). Raise toward ep_size
    # for exactness at the cost of redundant compute per rank.
    ep_capacity_factor: float = 2.0
    # Grammar jump-forward: emit forced tokens without model forwards
    # (reference: outlines jump-forward). Disable to force one-step decoding.
    disable_jump_forward: bool = False
    # Skip the post-launch warmup generation (reference srt/warmup.py)
    skip_server_warmup: bool = False
    # Comma-separated named warmups from the registry to run after launch
    # (reference --warmups + srt/warmup.py execute_warmups)
    warmups: Optional[str] = None
    nnodes: int = 1
    node_rank: int = 0
    # jax.distributed coordinator host:port (required when nnodes > 1); the
    # multi-host mirror channel listens on port + 1 (utils/multihost.py)
    dist_init_addr: Optional[str] = None
    # Seconds a follower waits for the coordinator / mirror channel
    # (reference dist_timeout; None = jax.distributed default + 300s accept)
    dist_timeout: Optional[float] = None

    # Compiled program buckets (static shapes for jit; role of CUDA-graph
    # capture sizes in the reference)
    decode_bs_buckets: Optional[List[int]] = None
    prefill_token_buckets: Optional[List[int]] = None

    # Double-sparsity attention (reference double_sparsity_backend.py +
    # DoubleSparseTokenToKVPool): decode reads only the top
    # ds_heavy_token_num tokens per head, scored from a ds_heavy_channel_num
    # label cache. Channel config from offline profiling
    # (--ds-channel-config-path, reference model_runner.py:1174).
    enable_double_sparsity: bool = False
    ds_heavy_channel_num: int = 16
    ds_heavy_token_num: int = 256
    ds_channel_config_path: Optional[str] = None
    ds_heavy_channel_type: str = "k"  # q | k | qk (profiling key)
    # Below this kv length dense decode is cheaper (and exact); the sparse
    # top-k path kicks in only for longer contexts (reference :143)
    ds_sparse_decode_threshold: int = 4096

    # Sampling / constrained decoding
    sampling_backend: str = "jax"
    # Allow requests to name a registered custom logit processor (reference
    # --enable-custom-logit-processor, io_struct.py:80-82; TPU-native
    # registry form — sampling/logit_processor.py)
    enable_custom_logit_processor: bool = False
    grammar_backend: Optional[str] = "outlines_like"
    # Disable the on-disk compiled-DFA cache (~/.cache/semi_pd_tpu/grammar).
    # Role of the reference's --disable-outlines-disk-cache: regex/schema ->
    # DFA compilation for deep schemas costs seconds; caching spans restarts.
    disable_outlines_disk_cache: bool = False
    # Override the bounded-whitespace regex inside JSON-schema grammars
    # (reference constrained_json_whitespace_pattern; default [ \n\t]{0,4})
    constrained_json_whitespace_pattern: Optional[str] = None

    # Speculative decoding
    speculative_algorithm: Optional[str] = None  # EAGLE | NEXTN | NGRAM
    speculative_num_steps: int = 3
    speculative_num_draft_tokens: int = 4
    # EAGLE tree drafting: >1 enables top-k tree speculation (greedy
    # requests; sampled requests fall back to chain drafts). The tree shape
    # is static: see speculative/tree.py default_tree_template.
    speculative_eagle_topk: int = 1
    # Skip the post-verify draft-extend refresh (reference eagle_worker.py
    # forward_draft_extend_after_decode); outputs stay exact either way,
    # acceptance drops. Exposed for A/B tests.
    speculative_disable_draft_refresh: bool = False
    speculative_draft_model_path: Optional[str] = None
    # FR-Spec hot-token map (.pt/.json/.npy list of token ids): the EAGLE
    # draft head is sliced to this subset, shrinking the per-step draft
    # GEMM (reference --speculative-token-map, eagle_worker.py:70-95)
    speculative_token_map: Optional[str] = None
    # Relaxed acceptance for sampled requests (reference server_args.py:133):
    # a draft is also accepted outright when its target probability exceeds
    # threshold_single, and the rejection-sampling accept probability is
    # raised from p to min(1, p / threshold_acc). Defaults (1.0) keep exact
    # Leviathan rejection sampling; < 1.0 trades unbiasedness for speed.
    speculative_accept_threshold_single: float = 1.0
    speculative_accept_threshold_acc: float = 1.0

    # LoRA
    lora_paths: Optional[List[str]] = None
    max_loras_per_batch: int = 4

    # Server
    host: str = "127.0.0.1"
    port: int = 30000
    api_key: Optional[str] = None
    served_model_name: Optional[str] = None
    chat_template: Optional[str] = None
    # Tool-call markup format for /v1/chat/completions (reference
    # server_args.py --tool-call-parser: qwen25/mistral/llama3; None =
    # auto-detect across all known formats).
    tool_call_parser: Optional[str] = None
    # Split chain-of-thought into message.reasoning_content (reference
    # server_args.py --reasoning-parser: deepseek-r1/qwen3).
    reasoning_parser: Optional[str] = None
    # OpenAI files/batches storage (reference adapter.py:169 storage_dir)
    file_storage_path: str = "/tmp/semi_pd_tpu_file_storage"

    # Observability / debug
    log_level: str = "info"
    # Log request input/output summaries (reference log_requests +
    # log_requests_level: 0 = rid + lengths, 1 = + sampling params,
    # 2 = + full prompt/output text)
    log_requests: bool = False
    log_requests_level: int = 0
    # Append finished requests (ids + text + finish reason) as JSONL into
    # this folder, flushing every `threshold` requests (reference
    # tokenizer_manager.py:1104 dump_requests; also settable at runtime via
    # /configure_logging)
    dump_requests_folder: str = ""
    dump_requests_threshold: int = 1000
    decode_log_interval: float = 10.0  # seconds between decode-stats lines
    # Include cached_tokens (radix prefix hits) in OpenAI usage objects
    enable_cache_report: bool = False
    enable_metrics: bool = False
    show_time_cost: bool = False
    # Allow /release_memory_occupation + /resume_memory_occupation to free
    # and reallocate the KV pool's HBM between RL rollout phases (reference
    # --enable-memory-saver + torch_memory_saver_adapter.py)
    enable_memory_saver: bool = False
    # Streamed /generate chunks carry only NEW output token ids instead of
    # the cumulative list (reference --stream-output,
    # tokenizer_manager.py:952)
    stream_output: bool = False
    # Log level for HTTP access logs (reference --log-level-http; defaults
    # to --log-level)
    log_level_http: Optional[str] = None
    watchdog_timeout: float = 300.0
    enable_nan_detection: bool = False
    profiler_dir: Optional[str] = None
    stream_interval: int = 1
    # Dump every step's host batch + sampled tokens (and logits on the
    # sync paths) as .npz files for offline diffing (reference
    # --debug-tensor-dump-output-folder, model_runner.py); None = off.
    debug_tensor_dump_output_folder: Optional[str] = None

    # Attention backend override (reference --attention-backend): None =
    # auto (Pallas on TPU, jnp reference elsewhere); "reference" forces the
    # jnp backend on TPU too (kernel-debugging escape hatch).
    attention_backend: Optional[str] = None  # pallas | reference

    # Test / emulation
    device_platform: Optional[str] = None  # force "cpu" for tests
    num_virtual_devices: Optional[int] = None  # host-platform device count

    def __post_init__(self):
        if self.tokenizer_path is None:
            self.tokenizer_path = self.model_path
        if self.served_model_name is None:
            self.served_model_name = self.model_path
        if self.tool_call_parser is not None:
            # Reference FunctionCallParser raises on an unregistered parser
            # name; a typo must not silently widen to auto-detection.
            from semi_pd_tpu.utils.function_call import _FORMAT_INDEX

            if self.tool_call_parser not in _FORMAT_INDEX:
                raise ValueError(
                    f"unknown --tool-call-parser {self.tool_call_parser!r}; "
                    f"known: {sorted(_FORMAT_INDEX)}"
                )
        if self.num_continuous_decode_steps is not None:
            # Reference --num-continuous-decode-steps = N decode iterations
            # per scheduler loop; TPU-native equivalent is the in-flight
            # ring depth (N async steps per blocking readback).
            self.overlap_depth = max(1, int(self.num_continuous_decode_steps))
            self.adaptive_overlap_depth = False  # user pinned the depth

        if self.enable_ep_moe and self.ep_size == 1:
            self.ep_size = self.tp_size

        if self.dp_size > 1 and self.enable_semi_pd:
            # Unlike the reference (server_args.py:1163-1164 forbids multi-node
            # semi-PD and engine.py:107 forbids offline), a single controller
            # over a mesh supports semi-PD uniformly; DP replicas each run it.
            pass

        if self.quantization == "awq_int4" and self.kv_cache_dtype == "auto":
            self.kv_cache_dtype = "bfloat16"

        if self.enable_double_sparsity and self.speculative_algorithm:
            raise ValueError(
                "double-sparsity is not composed with speculative decoding"
            )

        if self.enable_dp_attention:
            if self.dp_size <= 1:
                raise ValueError("--enable-dp-attention requires dp_size > 1")
            if self.speculative_algorithm:
                raise ValueError(
                    "DP-attention is not composed with speculative decoding yet"
                )
            if self.ep_size > 1:
                raise ValueError(
                    "DP-attention is not composed with expert parallelism yet"
                )
            self.disable_radix_cache = True

        if self.nnodes > 1:
            if not self.dist_init_addr:
                raise ValueError("--nnodes > 1 requires --dist-init-addr")

        if self.decode_bs_buckets is None:
            self.decode_bs_buckets = [1, 2, 4, 8, 16, 32, 64, 128, 256]
        if self.prefill_token_buckets is None:
            buckets, b = [], 256
            while b < self.chunked_prefill_size:
                buckets.append(b)
                b *= 2
            buckets.append(self.chunked_prefill_size)
            self.prefill_token_buckets = buckets

        if self.tokenizer_mode not in ("auto", "slow"):
            raise ValueError(f"unknown tokenizer_mode {self.tokenizer_mode!r}")
        if self.load_format not in ("auto", "safetensors", "pt", "gguf"):
            raise ValueError(f"unknown load_format {self.load_format!r}")
        if not (0.0 < self.speculative_accept_threshold_single <= 1.0):
            raise ValueError("speculative_accept_threshold_single in (0, 1]")
        if not (0.0 < self.speculative_accept_threshold_acc <= 1.0):
            raise ValueError("speculative_accept_threshold_acc in (0, 1]")

        if isinstance(self.page_size, str):
            # --page-size auto: page 64 measures ~10% more decode bandwidth
            # than 16 with the stacked-heads packed kernel (BENCH_KERNELS
            # *_p64 rows: 52.1 vs 47.2% at b16/kv8k), but radix prefix
            # sharing is quantized to page granularity — so auto picks 64
            # exactly when prefix reuse is impossible (radix disabled).
            if self.page_size != "auto":
                raise ValueError("page_size must be an int or 'auto'")
            self.page_size = 64 if self.disable_radix_cache else 16
        if self.page_size < 1:
            raise ValueError("page_size must be >= 1")
        if self.chunked_prefill_size % self.page_size != 0:
            self.chunked_prefill_size = (
                (self.chunked_prefill_size + self.page_size - 1)
                // self.page_size * self.page_size
            )

    # ------------------------------------------------------------------ CLI
    @staticmethod
    def add_cli_args(parser: argparse.ArgumentParser) -> None:
        for f in dataclasses.fields(ServerArgs):
            name = "--" + f.name.replace("_", "-")
            if f.type == "bool" or f.type is bool:
                if f.default:  # default-True bools need --no-<flag> to unset
                    parser.add_argument(
                        name, action=argparse.BooleanOptionalAction,
                        default=f.default)
                else:
                    parser.add_argument(name, action="store_true",
                                        default=f.default)
            elif f.name in ("decode_bs_buckets", "prefill_token_buckets", "lora_paths"):
                parser.add_argument(name, type=str, default=None)
            elif f.name == "page_size":  # int or the literal "auto"
                parser.add_argument(
                    name, type=lambda s: s if s == "auto" else int(s),
                    default=f.default)
            else:
                base = {int: int, float: float}.get(_base_type(f.type), str)
                parser.add_argument(name, type=base, default=_default_of(f))
        # Reference-name aliases for drop-in launch commands
        # (srt/server_args.py spells these out long-form).
        for flag, dest, typ in (
            ("--tensor-parallel-size", "tp_size", int),
            ("--data-parallel-size", "dp_size", int),
            ("--expert-parallel-size", "ep_size", int),
            ("--random-seed", "seed", int),
            ("--device", "device_platform", str),
        ):
            parser.add_argument(
                flag, dest=dest, type=typ, default=argparse.SUPPRESS)
        # CUDA-machinery flags from the reference accepted-but-inert so a
        # reference launch command is drop-in: each has no TPU meaning (CUDA
        # graphs -> bucketed jit, NCCL/custom-AR -> XLA ICI collectives,
        # triton/flashinfer/marlin -> Pallas/XLA, torch.compile -> jit).
        # A warning is logged when one is passed.
        for flag in _IGNORED_REFERENCE_FLAGS:
            # nargs="*": bools and list-valued reference flags
            # (--cuda-graph-bs 1 2 4 8) both parse without aborting
            parser.add_argument(
                flag, nargs="*", default=None,
                dest="_ignored__" + flag.strip("-").replace("-", "_"),
                help=argparse.SUPPRESS)

    @classmethod
    def from_cli_args(cls, args: argparse.Namespace) -> "ServerArgs":
        kwargs = {}
        for f in dataclasses.fields(cls):
            v = getattr(args, f.name, _default_of(f))
            if f.name in ("decode_bs_buckets", "prefill_token_buckets") and isinstance(v, str):
                v = [int(x) for x in v.split(",")]
            if f.name == "lora_paths" and isinstance(v, str):
                v = v.split(",")
            kwargs[f.name] = v
        for k, v in vars(args).items():
            if k.startswith("_ignored__") and v is not None:
                logger.warning(
                    "--%s is CUDA-only machinery with no TPU equivalent; "
                    "ignored (see ServerArgs docstring)",
                    k[len("_ignored__"):].replace("_", "-"))
        return cls(**kwargs)


def _default_of(f: dataclasses.Field):
    if f.default is not dataclasses.MISSING:
        return f.default
    if f.default_factory is not dataclasses.MISSING:  # type: ignore
        return f.default_factory()  # type: ignore
    return None


def _base_type(t):
    # Annotations are strings (PEP 563); list-typed fields are special-cased
    # by the caller, so "Optional[int]" etc. map to their scalar parser.
    s = str(t)
    if "int" in s:
        return int
    if "float" in s:
        return float
    return str


def prepare_server_args(argv: List[str]) -> ServerArgs:
    parser = argparse.ArgumentParser(description="semi_pd_tpu server")
    ServerArgs.add_cli_args(parser)
    return ServerArgs.from_cli_args(parser.parse_args(argv))
