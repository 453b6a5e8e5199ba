"""Reasoning-content splitter for R1-style models.

Reference: srt/reasoning_parser.py:121 ReasoningParser — splits
``<think>...</think>`` (deepseek-r1) from the final answer, streaming-aware.
"""

from __future__ import annotations

from typing import Optional, Tuple


class ReasoningParser:
    """Separates reasoning (chain-of-thought) from content. Streaming use:
    feed deltas via parse_stream; one-shot via parse."""

    # model type -> (start tag, end tag, force_reasoning): r1 chat templates
    # open <think> themselves so ALL text before </think> is reasoning even
    # without an opener (reference DeepSeekR1Detector force_reasoning=True);
    # qwen3 emits the opener explicitly and only then is in reasoning mode.
    TAGS = {
        "deepseek-r1": ("<think>", "</think>", True),
        "qwen3": ("<think>", "</think>", False),
    }

    def __init__(self, model_type: str = "deepseek-r1",
                 think_start_optional: Optional[bool] = None):
        if model_type not in self.TAGS:
            raise ValueError(f"unknown reasoning model type {model_type!r}")
        self.start_tag, self.end_tag, force = self.TAGS[model_type]
        if think_start_optional is not None:
            force = think_start_optional
        self.think_start_optional = force
        self._in_reasoning = force
        self._buf = ""

    def parse(self, text: str) -> Tuple[str, str]:
        """-> (reasoning_content, content)."""
        start, end = self.start_tag, self.end_tag
        if start in text:
            pre, rest = text.split(start, 1)
            if end in rest:
                reasoning, content = rest.split(end, 1)
                return reasoning.strip(), (pre + content).strip()
            return rest.strip(), ""
        if self.think_start_optional:
            # Forced-reasoning models: no opener ever appears; everything up
            # to </think> (or the whole text, mid-thought) is reasoning.
            if end in text:
                reasoning, content = text.split(end, 1)
                return reasoning.strip(), content.strip()
            return text.strip(), ""
        return "", text

    def flush(self) -> Tuple[str, str]:
        """Drain the partial-tag holdback at end of stream. The holdback in
        parse_stream withholds up to ``len(tag)-1`` trailing characters while
        they could still be a tag prefix; once the stream is over they are
        ordinary text and must be emitted (as reasoning if still inside the
        think span, content otherwise)."""
        out, self._buf = self._buf, ""
        if not out:
            return "", ""
        if self._in_reasoning:
            return out.replace(self.start_tag, ""), ""
        return "", out

    def parse_stream(self, delta: str) -> Tuple[str, str]:
        """Feed a streamed delta; returns (reasoning_delta, content_delta)."""
        self._buf += delta
        if not self._in_reasoning and self.start_tag in self._buf:
            # explicit opener (qwen3): switch into reasoning mode, emitting
            # any text before the tag as content
            pre, rest = self._buf.split(self.start_tag, 1)
            self._buf = rest
            self._in_reasoning = True
            r2, c2 = self.parse_stream("")
            return r2, pre + c2
        if self._in_reasoning:
            if self.end_tag in self._buf:
                reasoning, rest = self._buf.split(self.end_tag, 1)
                self._buf = ""
                self._in_reasoning = False
                reasoning = reasoning.replace(self.start_tag, "")
                return reasoning, rest
            # hold back a potential partial end tag
            for i in range(len(self.end_tag) - 1, 0, -1):
                if self._buf.endswith(self.end_tag[:i]):
                    out = self._buf[: -i]
                    self._buf = self._buf[-i:]
                    return out.replace(self.start_tag, ""), ""
            out = self._buf.replace(self.start_tag, "")
            self._buf = ""
            return out, ""
        # hold back a potential partial start tag (explicit-opener models)
        for i in range(len(self.start_tag) - 1, 0, -1):
            if self._buf.endswith(self.start_tag[:i]):
                out = self._buf[: -i]
                self._buf = self._buf[-i:]
                return "", out
        out = self._buf
        self._buf = ""
        return "", out
