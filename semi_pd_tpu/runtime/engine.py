"""Offline/in-process Engine API.

Reference: python/sglang/srt/entrypoints/engine.py:79 Engine (generate /
async_generate / encode / update_weights_*). Notable capability lift: the
reference's Engine cannot run semi-PD (engine.py:107-108 raises); here the
phase-disaggregated scheduler is the same in-process object, so
``enable_semi_pd`` works identically offline and behind the HTTP server.
"""

from __future__ import annotations

import asyncio
import logging
import threading
import time
import uuid
from typing import Any, Dict, List, Optional, Union

import numpy as np

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.config.server_args import ServerArgs
from semi_pd_tpu.runtime.detokenizer import incremental_detokenize, trim_stop_str
from semi_pd_tpu.runtime.model_runner import ModelRunner
from semi_pd_tpu.runtime.req import FinishReason, Req
from semi_pd_tpu.runtime.scheduler import Scheduler
from semi_pd_tpu.sampling.sampling_params import SamplingParams

logger = logging.getLogger(__name__)


class Engine:
    def __init__(
        self,
        server_args: Optional[ServerArgs] = None,
        model_config: Optional[ModelConfig] = None,
        tokenizer=None,
        mesh=None,
        **kwargs,
    ):
        if server_args is None:
            server_args = ServerArgs(**kwargs)
        self.server_args = server_args

        self.tokenizer = tokenizer
        if (self.tokenizer is None and server_args.tokenizer_path
                and not server_args.skip_tokenizer_init):
            from transformers import AutoTokenizer

            try:
                self.tokenizer = AutoTokenizer.from_pretrained(
                    server_args.tokenizer_path,
                    trust_remote_code=server_args.trust_remote_code,
                    use_fast=server_args.tokenizer_mode != "slow",
                    revision=server_args.revision,
                    cache_dir=server_args.download_dir,
                )
            except Exception as e:  # random-weights bench without a tokenizer
                # Single-file GGUF checkpoints carry a ggml vocab, not an HF
                # tokenizer dir; point --tokenizer-path at one for text APIs.
                if not (server_args.random_weights
                        or server_args.tokenizer_path.endswith(".gguf")):
                    raise RuntimeError(
                        f"failed to load tokenizer from "
                        f"{server_args.tokenizer_path!r}: {e}"
                    ) from e
                logger.warning("no tokenizer (%s); token-id API only", e)

        self.runner = ModelRunner(server_args, model_config=model_config, mesh=mesh)
        if server_args.nnodes > 1 and server_args.node_rank == 0:
            # multi-host: mirror every device transaction to follower
            # processes BEFORE the scheduler binds runner methods
            from semi_pd_tpu.runtime.mirror import MirroredRunner
            from semi_pd_tpu.utils.multihost import TickChannel

            self.runner = MirroredRunner(self.runner, TickChannel(server_args))
        self.scheduler = Scheduler(server_args, self.runner)
        self._eos_ids = self._resolve_eos()
        self._lock = threading.Lock()
        self._grammar_compiler = None  # lazy: vocab string table is costly
        self.lora_manager = None
        if server_args.lora_paths:
            for spec in server_args.lora_paths:
                name, path = spec.split("=", 1) if "=" in spec else (spec, spec)
                self.register_lora_adapter(name, path=path)

    def register_lora_adapter(self, name: str, path: Optional[str] = None,
                              state_dict=None, rank=None, alpha=None) -> int:
        """Load/register a LoRA adapter (reference LoRAManager load/swap).
        Recompiles the step on next use (params tree changes)."""
        from semi_pd_tpu.lora.manager import LoRAManager

        if self.lora_manager is None:
            self.lora_manager = LoRAManager(
                self.runner.model, self.server_args.max_loras_per_batch
            )
        idx = self.lora_manager.load_adapter(
            name, path=path, state_dict=state_dict, rank=rank, alpha=alpha
        )
        self.runner.install_lora(self.lora_manager.lora_params)
        return idx

    def unload_lora_adapter(self, name: str) -> bool:
        """Dynamic unload (reference LoRAManager lifecycle). Refused while
        any queued/running request still targets the adapter — its slot
        would read zeros mid-generation."""
        if self.lora_manager is None:
            raise ValueError(f"unknown LoRA adapter {name!r}")
        idx = self.lora_manager.adapter_index(name)
        in_use = [
            r.rid
            for r in list(self.scheduler.running) + list(self.scheduler.waiting)
            if getattr(r, "lora_id", 0) == idx
        ]
        if in_use:
            raise ValueError(
                f"LoRA adapter {name!r} is in use by {len(in_use)} "
                f"request(s); retry when they finish")
        self.lora_manager.unload_adapter(name)
        self.runner.install_lora(self.lora_manager.lora_params)
        return True

    def _get_grammar_compiler(self):
        if self._grammar_compiler is None:
            if self.tokenizer is None:
                raise ValueError("grammar-constrained decoding needs a tokenizer")
            from semi_pd_tpu.constrained.grammar import GrammarCompiler

            cache_dir = None
            if not self.server_args.disable_outlines_disk_cache:
                import os

                cache_dir = os.path.join(
                    os.path.expanduser("~"), ".cache", "semi_pd_tpu",
                    "grammar")
            self._grammar_compiler = GrammarCompiler(
                self.tokenizer, self._eos_ids,
                json_whitespace_pattern=(
                    self.server_args.constrained_json_whitespace_pattern),
                disk_cache_dir=cache_dir,
            )
        return self._grammar_compiler

    def _resolve_eos(self) -> List[int]:
        eos = []
        tok = self.tokenizer
        if tok is not None and tok.eos_token_id is not None:
            eos.append(int(tok.eos_token_id))
        hf = self.runner.model_config.hf_config
        if hf is not None:
            e = getattr(hf, "eos_token_id", None)
            if isinstance(e, int):
                eos.append(e)
            elif isinstance(e, (list, tuple)):
                eos.extend(int(x) for x in e)
        return sorted(set(eos))

    # ---------------------------------------------------------------- API
    def make_request(
        self,
        prompt: Optional[str] = None,
        input_ids: Optional[List[int]] = None,
        sampling_params: Optional[Union[SamplingParams, Dict]] = None,
        rid: Optional[str] = None,
        stream: bool = False,
        return_logprob: bool = False,
        top_logprobs_num: int = 0,
        lora_path: Optional[str] = None,
        image_data=None,
        input_embeds=None,
    ) -> Req:
        if isinstance(sampling_params, dict):
            sampling_params = SamplingParams.from_dict(sampling_params)
        sampling_params = sampling_params or SamplingParams()
        if self.server_args.is_embedding and sampling_params.max_new_tokens:
            # Shared gate for sync Engine.generate AND AsyncEngine/HTTP
            # generation handlers (reference tokenizer_manager rejects
            # generation on an --is-embedding server); encode()/score()
            # requests carry max_new_tokens=0 and pass.
            raise ValueError(
                "engine is in embedding mode (--is-embedding); use encode()"
            )
        if input_embeds is not None:
            # Precomputed-embedding prompt (reference io_struct.py:46-47,281
            # GenerateReqInput.input_embeds; used by RL / embedding-injection
            # clients). Rides the multimodal embed-override splice: the step
            # program skips the embedding gather for every prompt row. The
            # placeholder ids are arbitrary, so these requests are excluded
            # from radix prefix caching (scheduler._attach_prefix /
            # _release_finished).
            if image_data is not None:
                raise ValueError("input_embeds and image_data are exclusive")
            if input_ids is not None or prompt is not None:
                raise ValueError(
                    "input_embeds replaces the prompt; do not pass "
                    "prompt/input_ids alongside it")
            import numpy as _np

            embeds = _np.asarray(input_embeds, dtype=_np.float32)
            if embeds.ndim != 2 or embeds.shape[0] == 0:
                raise ValueError(
                    f"input_embeds must be [num_tokens, hidden], got "
                    f"{embeds.shape}")
            hidden = self.runner.model_config.hidden_size
            if embeds.shape[1] != hidden:
                raise ValueError(
                    f"input_embeds hidden dim {embeds.shape[1]} != model "
                    f"hidden size {hidden}")
            input_ids = [0] * embeds.shape[0]
        if input_ids is None:
            assert prompt is not None and self.tokenizer is not None
            input_ids = self.tokenizer.encode(prompt)
        if image_data is not None:
            input_ids = self._expand_image_tokens(list(input_ids), image_data)
        if not input_ids:
            # An empty request would sit in the waiting queue forever (no
            # prefill tokens to admit). Start from BOS when the tokenizer has
            # one (empty-prompt generation, e.g. the lang DSL); otherwise
            # fail up front like the reference's input validation.
            bos = getattr(self.tokenizer, "bos_token_id", None)
            if bos is None:
                raise ValueError("input is empty (no prompt tokens)")
            input_ids = [int(bos)]
        req = Req(
            rid=rid or uuid.uuid4().hex,
            input_ids=list(input_ids),
            sampling_params=sampling_params,
            eos_token_ids=self._eos_ids,
            stream=stream,
            # top-k logprobs imply per-token logprobs (reference io_struct:
            # top_logprobs_num requires return_logprob); capped like the
            # OpenAI API caps top_logprobs.
            return_logprob=return_logprob or top_logprobs_num > 0,
            top_logprobs_num=min(max(int(top_logprobs_num or 0), 0), 32),
        )
        if input_embeds is not None:
            req.input_embeds = True
            req.mm_embeds = embeds
            req.mm_positions = {i: i for i in range(embeds.shape[0])}
        if image_data is not None:
            self._attach_images(req, image_data)
        if lora_path:
            if self.lora_manager is None:
                raise ValueError("no LoRA adapters loaded")
            req.lora_id = self.lora_manager.adapter_index(lora_path)
        sp = sampling_params
        if sp.json_schema or sp.regex or sp.ebnf or sp.structural_tag:
            gc = self._get_grammar_compiler()
            if sp.regex:
                req.grammar = gc.matcher("regex", sp.regex)
            elif sp.json_schema:
                req.grammar = gc.matcher("json_schema", sp.json_schema)
            elif sp.structural_tag:
                req.grammar = gc.matcher("structural_tag", sp.structural_tag)
            else:
                req.grammar = gc.matcher("ebnf", sp.ebnf)
        if sp.custom_logit_processor is not None:
            if (not self.server_args.enable_custom_logit_processor
                    and sp.custom_logit_processor != "logit_bias"):
                # logit_bias is exempt: it is a standard OpenAI request field
                # that merely rides the same bias path.
                raise ValueError(
                    "custom_logit_processor requires "
                    "--enable-custom-logit-processor "
                    "(reference io_struct.py:80-82 gating)")
            from semi_pd_tpu.sampling.logit_processor import resolve_processor

            resolve_processor(sp.custom_logit_processor)  # fail fast on typo
        if self.server_args.log_requests:
            lvl = self.server_args.log_requests_level
            msg = f"recv rid={req.rid} prompt_len={len(req.input_ids)}"
            if lvl >= 1:
                msg += f" sampling={sp}"
            if lvl >= 2:
                msg += f" prompt={prompt!r}" if prompt else f" ids={input_ids}"
            logger.info(msg)
        return req

    def _expand_image_tokens(self, ids, image_data=None):
        """Replace each <image> placeholder with n_patches copies so the
        prompt length matches the spliced embeddings (reference
        multi_modality_padding.py pad_input_ids). Variable-resolution models
        (qwen2-vl) size each expansion from its image's patch grid."""
        model = self.runner.model
        tok_id = model.image_token_index
        if getattr(model, "uses_cross_attention", False):
            # mllama: the <|image|> token embeds normally; vision feeds the
            # cross-attention layers instead — no token expansion
            return ids
        if hasattr(model, "patchify") and image_data is not None:
            imgs = image_data if isinstance(image_data, list) else [image_data]
            grids = [self._qwen_vl_patches(i)[1] for i in imgs]
            out, k = [], 0
            for t in ids:
                if t == tok_id and k < len(grids):
                    out.extend([tok_id] * model.n_image_tokens_for(grids[k]))
                    k += 1
                else:
                    out.append(t)
            return out
        n = model.n_image_tokens
        out = []
        for t in ids:
            out.extend([tok_id] * n if t == tok_id else [t])
        return out

    def _qwen_vl_patches(self, item):
        """Image -> (flattened patches, grid) for grid-based VLMs. Dicts from
        the HF processor pass through; raw arrays are patchified."""
        if isinstance(item, dict):
            grid = tuple(int(x) for x in np.asarray(item["image_grid_thw"]).reshape(-1)[:3])
            return np.asarray(item["pixel_values"], np.float32), grid
        arr = self._load_image(item)
        return self.runner.model.patchify(np.asarray(arr, np.float32))

    def _load_image(self, item):
        """base64 string / bytes / PIL image / raw [3, H, W] array ->
        normalized pixel array via the HF image processor when needed."""
        if isinstance(item, np.ndarray):
            return item.astype(np.float32)
        import base64, io

        from PIL import Image

        if isinstance(item, str):
            item = base64.b64decode(item)
        if isinstance(item, (bytes, bytearray)):
            item = Image.open(io.BytesIO(item)).convert("RGB")
        if not hasattr(self, "_image_processor"):
            from transformers import AutoImageProcessor

            self._image_processor = AutoImageProcessor.from_pretrained(
                self.server_args.model_path,
                trust_remote_code=self.server_args.trust_remote_code,
                cache_dir=self.server_args.download_dir,
            )
        out = self._image_processor(images=item, return_tensors="np")
        return out["pixel_values"][0].astype(np.float32)

    def _attach_images(self, req: Req, image_data) -> None:
        """image_data: np [3, H, W], base64/bytes/PIL, or a list thereof."""
        model = self.runner.model
        if not getattr(model, "is_multimodal", False):
            raise ValueError("model is not multimodal")
        imgs = image_data if isinstance(image_data, list) else [image_data]
        if getattr(model, "uses_cross_attention", False):
            # mllama: one image per request; projected vision states carried
            # on the request and batched into ForwardArrays.cross_states
            if len(imgs) != 1:
                raise ValueError("mllama serving supports one image per request")
            req.cross_states = self.runner.encode_images_cross(imgs[0])
            tok_id = model.image_token_index
            req.cross_from = next(
                (i for i, t in enumerate(req.input_ids) if t == tok_id), 0
            )
            return
        if hasattr(model, "patchify"):
            feats = []
            grids = []
            for i in imgs:
                patches, grid = self._qwen_vl_patches(i)
                grids.append(grid)
                feats.append(np.asarray(
                    self.runner.encode_images_patches(patches, grid)))
            flat = np.concatenate(feats, axis=0)
            req.mrope_pos, req.mrope_delta = model.get_mrope_positions(
                req.input_ids, grids
            )
        else:
            px = np.stack([self._load_image(i) for i in imgs])
            embeds = self.runner.encode_images(px)  # [N, n_patches, H]
            flat = embeds.reshape(-1, embeds.shape[-1])
        tok_id = model.image_token_index
        positions = {}
        k = 0
        for pos, t in enumerate(req.input_ids):
            if t == tok_id and k < len(flat):
                positions[pos] = k
                k += 1
        req.mm_embeds = flat
        req.mm_positions = positions

    def generate(
        self,
        prompt: Optional[Union[str, List[str]]] = None,
        input_ids: Optional[Union[List[int], List[List[int]]]] = None,
        sampling_params: Optional[Union[SamplingParams, Dict]] = None,
        return_logprob: bool = False,
        top_logprobs_num: int = 0,
        lora_path: Optional[Union[str, List[str]]] = None,
        image_data=None,
        input_embeds=None,
    ) -> Union[Dict, List[Dict]]:
        """Synchronous batch generation (reference engine.py:122 generate)."""
        if self.server_args.is_embedding:
            raise ValueError(
                "engine is in embedding mode (--is-embedding); use encode()"
            )
        sp = sampling_params
        mnt = sp.get("max_new_tokens") if isinstance(sp, dict) else getattr(sp, "max_new_tokens", None)
        if return_logprob and mnt == 0:
            lps = self.score(prompt=prompt, input_ids=input_ids)
            mk = lambda l: {"text": "", "output_ids": [],
                            "meta_info": {"input_token_logprobs": l}}
            return mk(lps) if (isinstance(prompt, str) or (
                input_ids and isinstance(input_ids[0], int))) else [mk(l) for l in lps]
        single = False
        if prompt is not None and isinstance(prompt, str):
            prompt, single = [prompt], True
        if input_ids is not None and input_ids and isinstance(input_ids[0], int):
            input_ids, single = [input_ids], True
        if input_embeds is not None:
            import numpy as _np

            first = input_embeds[0]
            if _np.ndim(first) == 1 or (
                    not isinstance(first, (list, _np.ndarray))):
                # single request [N, H] (rows are 1-D vectors)
                input_embeds, single = [
                    _np.asarray(input_embeds, dtype=_np.float32)], True
            else:  # batch: list of [N_i, H] (possibly ragged N_i)
                input_embeds = [
                    _np.asarray(e, dtype=_np.float32) for e in input_embeds
                ]

        reqs = []
        n = (len(prompt) if prompt is not None
             else len(input_ids) if input_ids is not None
             else len(input_embeds))
        for i in range(n):
            lp = lora_path[i] if isinstance(lora_path, list) else lora_path
            img = image_data[i] if isinstance(image_data, list) and not single else image_data
            reqs.append(
                self.make_request(
                    prompt=prompt[i] if prompt else None,
                    input_ids=input_ids[i] if input_ids else None,
                    sampling_params=sampling_params,
                    return_logprob=return_logprob,
                    top_logprobs_num=top_logprobs_num,
                    lora_path=lp,
                    image_data=img,
                    input_embeds=(
                        input_embeds[i] if input_embeds is not None else None),
                )
            )
        with self._lock:
            for r in reqs:
                self.scheduler.add_request(r)
            self._run_until_done(reqs)
        outs = [self._to_output(r) for r in reqs]
        return outs[0] if single else outs

    def _run_until_done(self, reqs: List[Req]) -> None:
        pending = {r.rid for r in reqs if not r.finished}
        guard = 0
        while pending:
            produced = self.scheduler.tick()
            for req, tok in produced:
                if tok < 0:
                    continue
                self._post_token(req)
                if req.finished and req.rid in pending:
                    pending.discard(req.rid)
            if not produced:
                guard += 1
                if guard > 10000 or not self.scheduler.has_work():
                    break
            else:
                guard = 0
        for r in reqs:
            if not r.finished:
                r.finish_reason = FinishReason.ABORT

    def _post_token(self, req: Req) -> None:
        """Per-token host work: detokenize, stop-string check."""
        if self.tokenizer is not None:
            incremental_detokenize(self.tokenizer, req)
            if not req.finished and req.sampling_params.stop:
                req.check_finished()
                if req.finish_reason is FinishReason.STOP_STR:
                    self.scheduler.finish_stream_req(req)
        if req.finished and self.tokenizer is not None:
            incremental_detokenize(self.tokenizer, req, final=True)
            trim_stop_str(req)

    def _to_output(self, req: Req) -> Dict[str, Any]:
        if req.finished and getattr(self.server_args, "dump_requests_folder", ""):
            self._dump_request(req)
        if self.server_args.log_requests and req.finished:
            msg = (f"done rid={req.rid} out={len(req.output_ids)} "
                   f"reason={req.finish_reason.value} "
                   f"cached={req.cached_tokens}")
            if self.server_args.log_requests_level >= 2:
                msg += f" text={req.decoded_text!r}"
            logger.info(msg)
        return {
            "rid": req.rid,
            "text": req.decoded_text,
            "output_ids": req.full_output_ids(),
            "meta_info": {
                "prompt_tokens": req.origin_prompt_len,
                "completion_tokens": len(req.output_ids) + req.n_retracted_output,
                "finish_reason": req.finish_reason.value,
                "cached_tokens": req.cached_tokens,
                "output_logprobs": req.output_logprobs if req.return_logprob else None,
                # per position: ([top-k logprobs], [top-k token ids])
                # (reference meta_info output_top_logprobs,
                # scheduler_output_processor_mixin.py stream_output)
                "output_top_logprobs": (
                    req.output_top_logprobs if req.top_logprobs_num else None
                ),
            },
        }

    def _dump_request(self, req: Req) -> None:
        """Append finished requests as JSONL (reference
        tokenizer_manager.py:1104 dump_requests + ConfigureLoggingReq
        dump_requests_folder/threshold: records buffer and flush to a
        pickle-per-batch; here one JSONL file per engine, flushed per
        threshold batch)."""
        if "_dump_buf" not in self.__dict__:
            import atexit

            # losing up to threshold-1 tail requests on shutdown would make
            # the audit log silently incomplete
            atexit.register(self.flush_request_dump)
        buf = self.__dict__.setdefault("_dump_buf", [])
        buf.append({
            "rid": req.rid,
            "input_ids": list(req.input_ids[:req.origin_prompt_len]),
            "output_ids": req.full_output_ids(),
            "text": req.decoded_text,
            "finish_reason": req.finish_reason.value,
            "ts": time.time(),
        })
        threshold = int(getattr(self.server_args, "dump_requests_threshold",
                                1) or 1)
        if len(buf) >= threshold:
            self.flush_request_dump()

    def flush_request_dump(self) -> None:
        """Write any buffered request-dump rows (called at threshold and at
        interpreter exit so the tail of the audit log is never lost)."""
        import json as _json
        import os

        buf = self.__dict__.get("_dump_buf")
        folder = self.server_args.dump_requests_folder
        if not buf or not folder:
            return
        try:
            os.makedirs(folder, exist_ok=True)
            path = os.path.join(folder, f"requests_{os.getpid()}.jsonl")
            with open(path, "a") as f:
                for row in buf:
                    f.write(_json.dumps(row) + "\n")
            buf.clear()
        except OSError as e:
            logger.warning("request dump failed: %s", e)

    def encode(self, prompt=None, input_ids=None):
        """Embedding extraction (reference engine.py encode / Pooler LAST +
        /encode endpoint). Returns list of normalized [hidden] vectors."""
        import jax.numpy as jnp

        from semi_pd_tpu.runtime.batch import build_extend_batch

        if prompt is None and input_ids is None:
            raise ValueError("provide text or input_ids")
        single = False
        if prompt is not None and isinstance(prompt, str):
            prompt, single = [prompt], True
        if input_ids is not None and input_ids and isinstance(input_ids[0], int):
            input_ids, single = [input_ids], True
        if input_ids is None:
            input_ids = [self.tokenizer.encode(p) for p in prompt]

        sched = self.scheduler
        reqs = []
        with self._lock:
            for ids in input_ids:
                r = self.make_request(input_ids=ids, sampling_params=SamplingParams(max_new_tokens=0))
                slot = self.runner.req_pool.alloc()
                n_pages = -(-len(ids) // sched.page_size)
                pages = sched._alloc_pages(n_pages)
                assert slot is not None and pages is not None, "OOM for encode"
                r.req_slot = slot
                r.pages = pages.tolist()
                self.runner.req_pool.write(slot, 0, pages)
                reqs.append(r)
            admitted = [(r, r.prompt_len) for r in reqs]
            hb = build_extend_batch(
                admitted, self.runner.req_pool.page_table, sched.page_size,
                sched.t_buckets, sched.b_buckets, sched.p_buckets,
            )
            emb = self.runner.encode_step_host(hb)
            import numpy as _np

            out = [_np.asarray(emb[i]).tolist() for i in range(len(reqs))]
            for r in reqs:
                sched._free_req_memory(r)
        return out[0] if single else out

    def score(self, prompt=None, input_ids=None, logprob_start_len: int = 0,
              top_logprobs_num: int = 0):
        """Teacher-forced input-token logprobs (reference: /generate with
        return_logprob + logprob_start_len + max_new_tokens=0, io_struct.py).
        Returns per request a list of (logprob, token_id) for input positions
        >= logprob_start_len (position 0 has no logprob; start is clamped to
        1). With top_logprobs_num > 0, entries are
        (logprob, token_id, ([top-k logprobs], [top-k ids])) — the
        reference's input_top_logprobs (logits_processor.py:194). Powers
        lang.select and the OpenAI echo+logprobs path."""
        import numpy as _np

        from semi_pd_tpu.runtime.batch import build_extend_batch

        if prompt is None and input_ids is None:
            raise ValueError("provide text or input_ids")
        single = False
        if prompt is not None and isinstance(prompt, str):
            prompt, single = [prompt], True
        if input_ids is not None and input_ids and isinstance(input_ids[0], int):
            input_ids, single = [input_ids], True
        if input_ids is None:
            input_ids = [self.tokenizer.encode(p) for p in prompt]

        sched = self.scheduler
        reqs = []
        with self._lock:
            for ids in input_ids:
                r = self.make_request(
                    input_ids=ids, sampling_params=SamplingParams(max_new_tokens=0)
                )
                slot = self.runner.req_pool.alloc()
                n_pages = -(-len(ids) // sched.page_size)
                pages = sched._alloc_pages(n_pages)
                assert slot is not None and pages is not None, "OOM for score"
                r.req_slot = slot
                r.pages = pages.tolist()
                self.runner.req_pool.write(slot, 0, pages)
                reqs.append(r)
            admitted = [(r, r.prompt_len) for r in reqs]
            hb = build_extend_batch(
                admitted, self.runner.req_pool.page_table, sched.page_size,
                sched.t_buckets, sched.b_buckets, sched.p_buckets,
            )
            # targets[t] = next input token in the same request (row layout is
            # the concatenation of requests in admitted order)
            T = len(hb.input_ids)
            targets = _np.zeros(T, _np.int32)
            off = 0
            for r in reqs:
                n = r.prompt_len
                targets[off : off + n - 1] = r.input_ids[1:]
                off += n
            tv = ti = None
            k = min(max(int(top_logprobs_num or 0), 0), 32)
            if k > 0:
                lp, tv, ti = self.runner.score_topk_host(hb, targets, k)
                lp, tv, ti = _np.asarray(lp), _np.asarray(tv), _np.asarray(ti)
            else:
                lp = _np.asarray(
                    self.runner.score_step_host(hb, targets)
                )
            out = []
            off = 0
            for r in reqs:
                n = r.prompt_len
                start = max(1, logprob_start_len)
                # logprob of token at position i sits at row off+i-1
                if k > 0:
                    out.append(
                        [
                            (
                                float(lp[off + i - 1]),
                                int(r.input_ids[i]),
                                (tv[off + i - 1].tolist(),
                                 ti[off + i - 1].tolist()),
                            )
                            for i in range(start, n)
                        ]
                    )
                else:
                    out.append(
                        [
                            (float(lp[off + i - 1]), int(r.input_ids[i]))
                            for i in range(start, n)
                        ]
                    )
                off += n
                sched._free_req_memory(r)
        return out[0] if single else out

    # ---------------------------------------------------------- sessions
    def open_session(self, capacity_of_str_len: int = -1,
                     session_id: Optional[str] = None) -> str:
        """Multi-turn sessions (reference: srt/managers/session_controller.py
        + /open_session). Turns form a TREE — any turn can be branched from
        (session_params.rid), optionally truncated (offset) or replaced
        (replace aborts the turn's descendants). Session KV reuse falls out
        of the radix cache — divergent branches share the common prefix
        pages automatically."""
        sid = session_id or uuid.uuid4().hex
        if not hasattr(self, "_sessions"):
            self._sessions = {}
        if sid in self._sessions:
            raise ValueError(f"session {sid} already exists")
        self._sessions[sid] = {"turns": {}, "last": None}
        return sid

    def close_session(self, sid: str) -> bool:
        return hasattr(self, "_sessions") and self._sessions.pop(sid, None) is not None

    def _session_drop_descendants(self, sess: dict, rid: str) -> None:
        """replace=True semantics (reference SessionReqNode.clear_childs):
        abort and forget every turn below ``rid``."""
        doomed = [c for c, t in sess["turns"].items() if t["parent"] == rid]
        while doomed:
            c = doomed.pop()
            doomed.extend(
                g for g, t in sess["turns"].items() if t["parent"] == c)
            node = sess["turns"].pop(c)
            if not node["req"].finished:
                self.scheduler.abort_request(c)
            if sess["last"] == c:
                sess["last"] = rid

    def make_session_request(self, session_params: dict, prompt=None,
                             input_ids=None, **req_kwargs):
        """Create (but don't submit) a request whose prompt continues a
        session turn (reference Session.create_req). session_params:
        ``{"id": sid, "rid": parent turn (default: last), "offset": truncate
        the inherited history there, "replace": drop the parent's existing
        descendants}``. Returns the Req; its turn node is registered so
        later requests can branch from it by rid."""
        sid = session_params.get("id") or session_params.get("session_id")
        sess = getattr(self, "_sessions", {}).get(sid)
        if sess is None:
            raise ValueError(f"unknown session {sid}")
        parent_rid = session_params.get("rid") or sess["last"]
        base: List[int] = []
        if parent_rid is not None:
            node = sess["turns"].get(parent_rid)
            if node is None:
                raise ValueError(
                    f"session {sid} has no turn {parent_rid!r} to branch from")
            if not node["req"].finished:
                raise ValueError(
                    f"turn {parent_rid!r} has not finished; cannot branch")
            base = node["prefix"] + list(node["req"].output_ids)
            offset = session_params.get("offset")
            if offset:
                base = base[:offset]
            if session_params.get("replace"):
                self._session_drop_descendants(sess, parent_rid)
        if input_ids is None:
            if prompt is None:
                raise ValueError("session generate needs prompt or input_ids")
            input_ids = self.tokenizer.encode(prompt)
            bos = getattr(self.tokenizer, "bos_token_id", None)
            # trim bos on appends (reference Session.create_req)
            if base and bos is not None and input_ids[:1] == [bos]:
                input_ids = input_ids[1:]
        full = base + list(input_ids)
        req = self.make_request(input_ids=full, **req_kwargs)
        sess["turns"][req.rid] = {
            "parent": parent_rid, "prefix": full, "req": req}
        sess["last"] = req.rid
        return req

    def session_generate(self, sid: str, prompt=None, input_ids=None,
                         sampling_params=None, rid: Optional[str] = None,
                         offset: Optional[int] = None, replace: bool = False):
        req = self.make_session_request(
            {"id": sid, "rid": rid, "offset": offset, "replace": replace},
            prompt=prompt, input_ids=input_ids,
            sampling_params=sampling_params,
        )
        with self._lock:
            self.scheduler.add_request(req)
            self._run_until_done([req])
        return self._to_output(req)

    # ---------------------------------------------------------- maintenance
    def flush_cache(self) -> bool:
        """Reference scheduler.py flush_cache_wrapped: only when idle."""
        self.scheduler.drain()
        if self.scheduler.has_work():
            return False
        if self.scheduler.hicache_ctl is not None:
            # in-flight write-through gathers reference pages about to be
            # evicted; settle them first (dispatch order makes them safe,
            # but drain keeps the host tier deterministic for callers)
            self.scheduler.hicache_ctl.drain()
        self.scheduler.tree_cache.evict(10**9)
        self.scheduler.check_memory()
        return True

    def release_memory_occupation(self) -> bool:
        """Free the KV pool's device memory between rollout phases
        (reference /release_memory_occupation + torch_memory_saver,
        scheduler.py:1633-1648). Only when idle (like flush_cache)."""
        if not self.flush_cache():
            return False
        self.runner.release_kv_memory()
        return True

    def resume_memory_occupation(self) -> bool:
        self.runner.resume_kv_memory()
        return True

    def update_weights_from_disk(self, model_path: str) -> bool:
        from semi_pd_tpu.model_loader.loader import iterate_hf_weights

        self.runner.update_weights(iterate_hf_weights(model_path))
        return True

    def update_weights_from_tensor(self, named_tensors) -> bool:
        """Live weight update from in-memory tensors (reference
        model_runner.py:878 update_weights_from_tensor — RL loops). Both
        phases see the new weights atomically (single params pytree). Partial:
        only the named tensors change."""
        self.runner.update_weights(named_tensors, partial=True)
        return True

    def init_weights_update_group(
        self, master_address: str, master_port: int,
        group_name: str = "weight_update_group",
    ) -> bool:
        """Join a trainer's weight-update group (reference
        model_runner.py init_weights_update_group — NCCL group join; here a
        TCP tensor stream, utils/weight_sync.py)."""
        from semi_pd_tpu.utils.weight_sync import WeightSyncGroup

        if getattr(self, "_weight_sync", None) is not None:
            self._weight_sync.close()
        self._weight_sync = WeightSyncGroup(master_address, master_port, group_name)
        return True

    def update_weights_from_distributed(self, names, dtypes, shapes) -> bool:
        """Receive the announced tensors from the trainer group and update
        params in place (reference model_runner.py:845
        update_weights_from_distributed: one broadcast per tensor)."""
        ws = getattr(self, "_weight_sync", None)
        if ws is None:
            raise ValueError("init_weights_update_group has not been called")
        if isinstance(names, str):
            names, dtypes, shapes = [names], [dtypes], [shapes]
        self.runner.update_weights(
            ws.recv_tensors(names, dtypes, shapes), partial=True
        )
        return True

    def get_server_info(self) -> Dict[str, Any]:
        s = self.scheduler
        return {
            "model_path": self.server_args.model_path,
            "is_semi_pd": self.server_args.enable_semi_pd,
            "num_running": len(s.running),
            "num_waiting": len(s.waiting),
            "finished": s.n_finished,
            "retracted": s.n_retracted,
            "prefill_tokens": s.n_prefill_tokens,
            "decode_tokens": s.n_decode_tokens,
            "cached_prefix_tokens": s.n_cached_prefix_tokens,
            "kv_pages_free": self.runner.page_allocator.available_pages(),
            "kv_pages_total": self.runner.page_allocator.usable_pages,
            # reference get_internal_state: avg accepted tokens per
            # speculative round (scheduler.py:1522 internal_states)
            "avg_spec_accept_length": (
                round(1.0 + s.n_spec_accepted / s.n_spec_steps, 3)
                if s.n_spec_steps else None),
        }
