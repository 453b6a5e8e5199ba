"""Reasoning-content splitter for R1-style models.

Reference: srt/reasoning_parser.py:121 ReasoningParser — splits
``<think>...</think>`` (deepseek-r1) from the final answer, streaming-aware.
"""

from __future__ import annotations

from typing import Optional, Tuple


class ReasoningParser:
    """Separates reasoning (chain-of-thought) from content. Streaming use:
    feed deltas via parse_stream; one-shot via parse."""

    TAGS = {
        "deepseek-r1": ("<think>", "</think>"),
        "qwen3": ("<think>", "</think>"),
    }

    def __init__(self, model_type: str = "deepseek-r1",
                 think_start_optional: bool = True):
        if model_type not in self.TAGS:
            raise ValueError(f"unknown reasoning model type {model_type!r}")
        self.start_tag, self.end_tag = self.TAGS[model_type]
        # r1 chat templates often open <think> themselves; treat text before
        # </think> as reasoning even without an explicit opener.
        self.think_start_optional = think_start_optional
        self._in_reasoning = think_start_optional
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
        if self.think_start_optional and end in text:
            reasoning, content = text.split(end, 1)
            return reasoning.strip(), content.strip()
        return "", text

    def parse_stream(self, delta: str) -> Tuple[str, str]:
        """Feed a streamed delta; returns (reasoning_delta, content_delta)."""
        self._buf += delta
        if self._in_reasoning:
            if self.start_tag in self._buf and not self.think_start_optional:
                pass
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
        out = self._buf
        self._buf = ""
        return "", out
