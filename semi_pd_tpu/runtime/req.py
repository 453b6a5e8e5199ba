"""Request lifecycle state machine.

Reference: python/sglang/srt/managers/schedule_batch.py:233 Req (+
check_finished :446). Host-side only: tokens and page lists are python/numpy;
device state lives in the shared KV pool addressed through ``pages``.
"""

from __future__ import annotations

import dataclasses
import enum
import time
from typing import Any, List, Optional

import numpy as np

from semi_pd_tpu.sampling.sampling_params import SamplingParams


class FinishReason(enum.Enum):
    NONE = None
    LENGTH = "length"
    EOS = "stop"  # eos token
    STOP_TOKEN = "stop_token"
    STOP_STR = "stop_str"
    ABORT = "abort"


@dataclasses.dataclass(eq=False)  # identity semantics: scheduler compares
class Req:  # batch membership by object, and dicts key on rid
    rid: str
    input_ids: List[int]
    sampling_params: SamplingParams
    eos_token_ids: List[int] = dataclasses.field(default_factory=list)

    # Output state
    output_ids: List[int] = dataclasses.field(default_factory=list)
    output_logprobs: List[float] = dataclasses.field(default_factory=list)
    return_logprob: bool = False
    top_logprobs_num: int = 0
    output_top_logprobs: List[Any] = dataclasses.field(default_factory=list)

    # Memory state (single-owner: assigned by the scheduler)
    req_slot: Optional[int] = None  # row in ReqToPagePool
    pages: List[int] = dataclasses.field(default_factory=list)  # page ids, in order
    n_prefix_pages: int = 0  # leading pages borrowed from the radix cache
    last_node: Any = None  # radix tree node holding our prefix lock

    # Prefill progress (chunked prefill; reference: extend_input_len etc.)
    prefilled_len: int = 0  # prompt tokens whose KV is already in the pool
    # Output tokens emitted WITHOUT a model forward (grammar jump-forward);
    # their KV is owed and back-filled by an extend before the next decode.
    kv_debt: int = 0
    # Qwen2-VL m-rope: [prompt_len, 3] positions for the prompt and the
    # scalar offset for positions past it (HF rope_deltas convention)
    mrope_pos: Any = None
    mrope_delta: int = 0
    cached_tokens: int = 0  # prefix tokens reused from the radix cache
    # DP-attention: the dp partition owning this request's KV pages (assigned
    # at first page allocation; None outside dp-attention mode)
    dp_rank: Optional[int] = None
    # Mllama cross-attention: per-request projected vision states
    # [Nv, text_hidden] + first prompt position allowed to attend them
    cross_states: Any = None
    cross_from: int = 0

    # Lifecycle
    finish_reason: FinishReason = FinishReason.NONE
    is_retracted: bool = False
    # Bumped whenever host state diverges from in-flight device steps
    # (retraction, jump-forward re-queue): ring entries capture the epoch at
    # dispatch and discard rows whose request has since moved on.
    epoch: int = 0
    n_retracted_output: int = 0  # generated tokens folded into input by retraction
    queue_time: float = dataclasses.field(default_factory=time.monotonic)
    first_token_time: Optional[float] = None
    finish_time: Optional[float] = None

    # Streaming / detokenization cursor
    stream: bool = False
    sent_output_len: int = 0
    decoded_text: str = ""
    surr_offset: int = 0  # detokenizer surrogate window start
    read_offset: int = 0

    # Grammar-constrained decoding state (set when sampling_params has a
    # json_schema/regex/ebnf; reference srt/constrained/)
    grammar: Any = None

    # LoRA adapter slot (0 = base model; reference GenerateReqInput.lora_path)
    lora_id: int = 0

    # EAGLE: target hidden state of the latest accepted token (np [H]) — the
    # draft net's recurrent input (reference eagle_worker hidden_states)
    spec_hidden: Any = None

    # Multimodal (reference ImageInputs schedule_batch.py:142): precomputed
    # image-patch embeddings [n_mm, H] + prompt position -> row map
    mm_embeds: Any = None
    mm_positions: Any = None
    # Prompt supplied as precomputed embeddings (reference io_struct.py:46
    # input_embeds): placeholder input_ids, rows overridden via mm_embeds;
    # excluded from radix prefix caching (ids are not the identity).
    input_embeds: bool = False

    # Original prompt length (input_ids grows when retraction folds generated
    # tokens back into the prefill input; reference keeps origin_input_ids
    # separate from fill_ids the same way).
    origin_prompt_len: int = -1

    def __post_init__(self):
        if self.origin_prompt_len < 0:
            self.origin_prompt_len = len(self.input_ids)

    @property
    def prompt_len(self) -> int:
        return len(self.input_ids)

    def full_output_ids(self) -> List[int]:
        """All generated tokens, including any folded into input_ids by
        retraction."""
        return (self.input_ids + self.output_ids)[self.origin_prompt_len :]

    @property
    def seq_len(self) -> int:
        """Total sequence length (prompt + generated)."""
        return len(self.input_ids) + len(self.output_ids)

    @property
    def kv_len(self) -> int:
        """Tokens whose KV currently sits in the pool. The most recently
        sampled token's KV is written by the *next* decode step (its embedding
        is that step's input), hence the -1."""
        return self.prefilled_len + max(0, len(self.output_ids) - 1) - self.kv_debt

    @property
    def prefill_remaining(self) -> int:
        return self.prompt_len - self.prefilled_len

    @property
    def finished(self) -> bool:
        return self.finish_reason is not FinishReason.NONE

    def all_token_ids(self) -> List[int]:
        return self.input_ids + self.output_ids

    # ------------------------------------------------------------------
    def check_finished(self) -> None:
        """Reference: schedule_batch.py:446 check_finished."""
        if self.finished:
            return
        sp = self.sampling_params
        n_out = len(self.output_ids) + self.n_retracted_output
        if n_out >= sp.max_new_tokens:
            self.finish_reason = FinishReason.LENGTH
            return
        if n_out < sp.min_new_tokens:
            return
        if self.grammar is not None and self.grammar.finished:
            # Matcher terminated: no further token is grammatical. The
            # reference stops via the matcher's is_terminated() — without
            # this, decoding continues UNMASKED (_vocab_mask skips finished
            # grammars) and appends free-running garbage to a valid match.
            self.finish_reason = FinishReason.STOP_TOKEN
            return
        last = self.output_ids[-1] if self.output_ids else None
        if last is not None:
            if not sp.ignore_eos and last in self.eos_token_ids:
                self.finish_reason = FinishReason.EOS
                return
            if last in sp.stop_token_ids:
                self.finish_reason = FinishReason.STOP_TOKEN
                return
        if sp.stop and self.decoded_text:
            for s in sp.stop:
                if s and s in self.decoded_text:
                    self.finish_reason = FinishReason.STOP_STR
                    return

    def reset_for_retract(self) -> None:
        """Return to the waiting queue after decode-OOM retraction
        (reference: retract_decode schedule_batch.py:1034 + semi-PD re-queue
        semi_pd_scheduler.py:52-56). Generated tokens become part of the
        input for re-prefill."""
        self.input_ids = self.all_token_ids()
        self.n_retracted_output += len(self.output_ids)
        self.output_ids = []
        # Detokenizer offsets index into output_ids; restart them (decoded
        # text so far is kept).
        self.surr_offset = 0
        self.read_offset = 0
        self.prefilled_len = 0
        self.kv_debt = 0
        self.spec_hidden = None
        self.pages = []
        self.n_prefix_pages = 0
        self.dp_rank = None  # re-balance onto the least-loaded dp partition
        self.req_slot = None
        self.last_node = None
        self.is_retracted = True
        self.epoch += 1
