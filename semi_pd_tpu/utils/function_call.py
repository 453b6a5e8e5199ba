"""Tool/function-call output parsing.

Reference: srt/function_call_parser.py:495 FunctionCallParser (qwen25,
mistral, llama32 formats). Parses common tool-call markup out of generated
text into OpenAI tool_calls structures."""

from __future__ import annotations

import json
import re
import uuid
from typing import Dict, List, Optional, Tuple

_PATTERNS = [
    # <tool_call>{...}</tool_call>  (qwen2.5 / hermes)
    re.compile(r"<tool_call>\s*(\{.*?\})\s*</tool_call>", re.DOTALL),
    # [TOOL_CALLS] [{...}]  (mistral)
    re.compile(r"\[TOOL_CALLS\]\s*(\[.*\])", re.DOTALL),
    # <|python_tag|>{...}  (llama 3.x)
    re.compile(r"<\|python_tag\|>(\{.*\})", re.DOTALL),
]

# --tool-call-parser name -> pattern index (reference FunctionCallParser
# ToolCallParser registry: qwen25, mistral, llama32).
_FORMAT_INDEX = {
    "qwen25": 0, "hermes": 0,
    "mistral": 1,
    "llama3": 2, "llama32": 2,
}


def _mk_call(obj: Dict) -> Dict:
    return {
        "id": f"call_{uuid.uuid4().hex[:24]}",
        "type": "function",
        "function": {
            "name": obj.get("name", ""),
            "arguments": json.dumps(
                obj.get("arguments", obj.get("parameters", {})), ensure_ascii=False
            ),
        },
    }


class StreamingToolCallDetector:
    """Streaming tool-call holdback (reference FunctionCallParser
    parse_stream_chunk): text streams through until a tool-call opener is
    seen (a partial-opener tail is withheld like the reasoning parser's tag
    holdback); from the opener on, everything buffers and is parsed into
    tool_calls at end of stream."""

    _OPENERS = ["<tool_call>", "[TOOL_CALLS]", "<|python_tag|>"]

    def __init__(self, parser: Optional[str] = None):
        self.parser = parser
        if parser in _FORMAT_INDEX:
            self._openers = [self._OPENERS[_FORMAT_INDEX[parser]]]
        else:
            self._openers = list(self._OPENERS)
        self._buf = ""
        self._captured = ""  # markup + everything after it
        self.in_call = False

    def feed(self, delta: str) -> str:
        """Returns the text safe to stream now ('' once capturing)."""
        if self.in_call:
            self._captured += delta
            return ""
        self._buf += delta
        for op in self._openers:
            i = self._buf.find(op)
            if i >= 0:
                out, self._captured = self._buf[:i], self._buf[i:]
                self._buf = ""
                self.in_call = True
                return out
        # hold back the longest suffix that is a prefix of some opener
        hold = 0
        for op in self._openers:
            for n in range(min(len(op) - 1, len(self._buf)), 0, -1):
                if self._buf.endswith(op[:n]):
                    hold = max(hold, n)
                    break
        out = self._buf[: len(self._buf) - hold] if hold else self._buf
        self._buf = self._buf[len(self._buf) - hold:] if hold else ""
        return out

    def finish(self):
        """-> (residual_text, tool_calls). Call once, after the stream."""
        if self.in_call:
            content, calls = parse_tool_calls(self._captured, self.parser)
            if calls:
                return content, calls
            # markup never parsed: release it as plain text
            return self._captured, []
        return self._buf, []


def parse_tool_calls(
    text: str, parser: Optional[str] = None
) -> Tuple[str, List[Dict]]:
    """Returns (content_without_calls, tool_calls). ``parser`` restricts
    detection to one markup format (server --tool-call-parser); unknown or
    unset names auto-detect across all formats."""
    calls: List[Dict] = []
    content = text
    if parser in _FORMAT_INDEX:
        patterns = [_PATTERNS[_FORMAT_INDEX[parser]]]
    else:
        patterns = _PATTERNS
    for pat in patterns:
        for m in pat.finditer(text):
            try:
                obj = json.loads(m.group(1))
            except json.JSONDecodeError:
                continue
            if isinstance(obj, list):
                calls.extend(_mk_call(o) for o in obj if isinstance(o, dict))
            elif isinstance(obj, dict):
                calls.append(_mk_call(obj))
        if calls:
            content = pat.sub("", content).strip()
            break
    # Bare JSON object with name/arguments
    if not calls:
        stripped = text.strip()
        if stripped.startswith("{") and '"name"' in stripped:
            try:
                obj = json.loads(stripped)
                if isinstance(obj, dict) and "name" in obj:
                    calls.append(_mk_call(obj))
                    content = ""
            except json.JSONDecodeError:
                pass
    return content, calls
