"""OpenAI API protocol models (reference: srt/openai_api/protocol.py,
trimmed to the served surface)."""

from __future__ import annotations

import time
import uuid
from typing import Any, Dict, List, Optional, Union

from pydantic import BaseModel, Field


class CompletionRequest(BaseModel):
    model: str = ""
    prompt: Union[str, List[str], List[int], List[List[int]]] = ""
    max_tokens: int = 16
    temperature: float = 1.0
    top_p: float = 1.0
    n: int = 1
    stream: bool = False
    logprobs: Optional[int] = None
    echo: bool = False
    stop: Optional[Union[str, List[str]]] = None
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    repetition_penalty: float = 1.0
    top_k: int = -1
    min_p: float = 0.0
    ignore_eos: bool = False
    json_schema: Optional[str] = None
    regex: Optional[str] = None
    logit_bias: Optional[Dict[str, float]] = None
    user: Optional[str] = None

    def to_sampling_dict(self) -> Dict[str, Any]:
        d = dict(
            max_new_tokens=self.max_tokens,
            temperature=self.temperature,
            top_p=self.top_p,
            top_k=self.top_k,
            min_p=self.min_p,
            stop=self.stop,
            presence_penalty=self.presence_penalty,
            frequency_penalty=self.frequency_penalty,
            repetition_penalty=self.repetition_penalty,
            ignore_eos=self.ignore_eos,
            json_schema=self.json_schema,
            regex=self.regex,
        )
        if self.logit_bias:
            # rides the custom-logit-processor bias path (the reference
            # declares logit_bias in protocol.py:156 but never applies it)
            d["custom_logit_processor"] = "logit_bias"
            d["custom_params"] = {"logit_bias": self.logit_bias}
        return d


class ChatMessage(BaseModel):
    role: str
    content: Union[str, List[Dict[str, Any]], None] = None
    name: Optional[str] = None
    tool_calls: Optional[List[Dict[str, Any]]] = None
    tool_call_id: Optional[str] = None


class ChatCompletionRequest(BaseModel):
    model: str = ""
    messages: List[ChatMessage]
    max_tokens: Optional[int] = None
    max_completion_tokens: Optional[int] = None
    temperature: float = 1.0
    top_p: float = 1.0
    n: int = 1
    stream: bool = False
    stop: Optional[Union[str, List[str]]] = None
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    repetition_penalty: float = 1.0
    top_k: int = -1
    min_p: float = 0.0
    ignore_eos: bool = False
    response_format: Optional[Dict[str, Any]] = None
    tools: Optional[List[Dict[str, Any]]] = None
    tool_choice: Union[str, Dict[str, Any], None] = "auto"
    logprobs: bool = False
    top_logprobs: Optional[int] = None
    logit_bias: Optional[Dict[str, float]] = None
    user: Optional[str] = None

    def to_sampling_dict(self) -> Dict[str, Any]:
        max_new = self.max_completion_tokens or self.max_tokens or 512
        json_schema = None
        structural_tag = None
        if self.response_format:
            t = self.response_format.get("type")
            if t == "json_schema":
                import json as _json

                js = self.response_format.get("json_schema", {}).get("schema")
                json_schema = _json.dumps(js) if js is not None else None
            elif t == "json_object":
                json_schema = '{"type": "object"}'
            elif t == "structural_tag":
                # reference adapter.py:993-996: the whole response_format
                # object (minus "type") is the tag spec
                import json as _json

                spec = {k: v for k, v in self.response_format.items()
                        if k != "type"}
                structural_tag = _json.dumps(spec)
        d = dict(
            max_new_tokens=max_new,
            temperature=self.temperature,
            top_p=self.top_p,
            top_k=self.top_k,
            min_p=self.min_p,
            stop=self.stop,
            presence_penalty=self.presence_penalty,
            frequency_penalty=self.frequency_penalty,
            repetition_penalty=self.repetition_penalty,
            ignore_eos=self.ignore_eos,
            json_schema=json_schema,
            structural_tag=structural_tag,
        )
        if self.logit_bias:
            d["custom_logit_processor"] = "logit_bias"
            d["custom_params"] = {"logit_bias": self.logit_bias}
        return d


def completion_id() -> str:
    return f"cmpl-{uuid.uuid4().hex}"


def chat_id() -> str:
    return f"chatcmpl-{uuid.uuid4().hex}"


def now() -> int:
    return int(time.time())
