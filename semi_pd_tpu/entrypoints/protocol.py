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
    user: Optional[str] = None

    def to_sampling_dict(self) -> Dict[str, Any]:
        return dict(
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
    user: Optional[str] = None

    def to_sampling_dict(self) -> Dict[str, Any]:
        max_new = self.max_completion_tokens or self.max_tokens or 512
        json_schema = None
        if self.response_format:
            t = self.response_format.get("type")
            if t == "json_schema":
                import json as _json

                js = self.response_format.get("json_schema", {}).get("schema")
                json_schema = _json.dumps(js) if js is not None else None
            elif t == "json_object":
                json_schema = '{"type": "object"}'
        return dict(
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
        )


def completion_id() -> str:
    return f"cmpl-{uuid.uuid4().hex}"


def chat_id() -> str:
    return f"chatcmpl-{uuid.uuid4().hex}"


def now() -> int:
    return int(time.time())
