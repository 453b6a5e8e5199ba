"""Incremental detokenization.

Reference: python/sglang/srt/managers/detokenizer_manager.py:57-239
(DecodeStatus with surr/read offsets, stop-string trimming). In-process here:
the controller is single-process, so this is a function library rather than a
ZMQ-fed subprocess.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from semi_pd_tpu.runtime.req import FinishReason, Req

# Tokens of context kept behind the read pointer so multi-token glyphs and
# leading-space merges detokenize correctly (reference uses 5).
_SURR_CONTEXT = 5


def incremental_detokenize(tokenizer, req: Req, final: bool = False) -> str:
    """Advance req.decoded_text with newly generated tokens; returns the new
    text delta (may be ""). Holds back trailing bytes that form an incomplete
    UTF-8 sequence (the � check, reference detokenizer_manager.py:163)."""
    ids = req.output_ids
    sp = req.sampling_params
    if (
        req.finish_reason in (FinishReason.EOS, FinishReason.STOP_TOKEN)
        and not sp.no_stop_trim
        and ids
    ):
        # The matched EOS/stop token stays in output_ids but is excluded
        # from the text (reference detokenizer_manager.py trim_eos — the
        # model's eos may detokenize to visible text on some vocabularies).
        ids = ids[:-1]
    surr_ids = ids[req.surr_offset : req.read_offset]
    new_ids = ids[req.surr_offset :]
    surr_text = tokenizer.decode(
        surr_ids, skip_special_tokens=sp.skip_special_tokens
    )
    new_text = tokenizer.decode(
        new_ids, skip_special_tokens=sp.skip_special_tokens
    )
    if new_text.endswith("�") and not final:
        return ""
    delta = new_text[len(surr_text) :]
    if delta:
        req.decoded_text += delta
        req.read_offset = len(ids)
        req.surr_offset = max(len(ids) - _SURR_CONTEXT, 0)
    return delta


def trim_stop_str(req: Req) -> None:
    """After a stop-string finish, cut the text at the earliest stop match
    (reference detokenizer_manager.py:111 trim logic)."""
    if req.finish_reason is not FinishReason.STOP_STR:
        return
    cut = len(req.decoded_text)
    for s in req.sampling_params.stop:
        pos = req.decoded_text.find(s)
        if pos != -1:
            cut = min(cut, pos)
    req.decoded_text = req.decoded_text[:cut]
