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
