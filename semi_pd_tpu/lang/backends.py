"""DSL backends: in-process Engine, HTTP RuntimeEndpoint, OpenAI protocol.

Reference: python/sglang/lang/backend/runtime_endpoint.py (RuntimeEndpoint
hitting /generate, select via normalized prompt logprobs), the in-process
Engine path, and lang/backend/openai.py (OpenAI-protocol client — here one
generic OpenAI-compatible backend covers the reference's openai/litellm
family; it works against this framework's own /v1 surface or any other
OpenAI-compatible server). `select` scores each choice continuation with the
teacher-forced input-logprob mode (Engine.score / /generate with
max_new_tokens=0 / /v1/completions echo+logprobs) — one prefill per choice,
and the shared prompt prefix is a radix-cache hit."""

from __future__ import annotations

import json
from typing import Dict, List, Sequence
from urllib import request as _urlreq


def _rank_scores(token_logprobs: List[List[float]], method: str) -> List[float]:
    if method == "joint":
        return [sum(lp) for lp in token_logprobs]
    # default: token_length_normalized (reference runtime_endpoint.py:244)
    return [sum(lp) / max(1, len(lp)) for lp in token_logprobs]


class EngineBackend:
    def __init__(self, engine):
        self.engine = engine
        if engine.tokenizer is None:
            raise ValueError("DSL backend needs a tokenizer")

    def generate(self, text: str, params: Dict) -> str:
        out = self.engine.generate(prompt=text, sampling_params=params)
        return out["text"]

    def select(self, text: str, choices: Sequence[str], method: str) -> List[float]:
        tok = self.engine.tokenizer
        prefix = tok.encode(text)
        per_choice = []
        for c in choices:
            full = tok.encode(text + c)
            # robust to tokenizers that merge across the boundary: score from
            # the longest common prefix with the bare prompt
            n = 0
            while n < len(prefix) and n < len(full) and prefix[n] == full[n]:
                n += 1
            lps = self.engine.score(input_ids=full, logprob_start_len=n)
            per_choice.append([lp for lp, _ in lps])
        return _rank_scores(per_choice, method)


class RuntimeEndpoint:
    """Client for a running semi_pd_tpu HTTP server."""

    def __init__(self, base_url: str, timeout: float = 120.0):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout

    def _post(self, path: str, payload: Dict) -> Dict:
        req = _urlreq.Request(
            self.base_url + path, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with _urlreq.urlopen(req, timeout=self.timeout) as r:
            return json.loads(r.read())

    def generate(self, text: str, params: Dict) -> str:
        out = self._post("/generate", {"text": text, "sampling_params": params})
        return out["text"]

    def select(self, text: str, choices: Sequence[str], method: str) -> List[float]:
        # one probe for the prompt's own token count (the client can't
        # tokenize), then one scoring request per choice
        probe = self._post("/generate", {
            "text": text, "return_logprob": True,
            "sampling_params": {"max_new_tokens": 0},
        })
        n_prompt = probe["meta_info"]["prompt_tokens"]
        per_choice = []
        for c in choices:
            out = self._post("/generate", {
                "text": text + c,
                "return_logprob": True,
                "logprob_start_len": n_prompt + 1,
                "sampling_params": {"max_new_tokens": 0},
            })
            lps = out["meta_info"]["input_token_logprobs"]
            per_choice.append([lp for lp, _ in lps])
        return _rank_scores(per_choice, method)


class OpenAIBackend:
    """OpenAI-protocol DSL backend (reference lang/backend/openai.py).

    Speaks /v1/completions against any OpenAI-compatible base_url —
    including this framework's own server, which implements the
    echo+logprobs prompt-scoring mode `select` needs (adapter.py
    v1_completions parity). In this zero-egress environment it is tested
    against the in-repo server; pointed at api.openai.com it is the
    reference's OpenAI backend."""

    def __init__(self, base_url: str, model: str = "default",
                 api_key: str | None = None, timeout: float = 120.0):
        self.base_url = base_url.rstrip("/")
        self.model = model
        self.api_key = api_key
        self.timeout = timeout

    def _post(self, path: str, payload: Dict) -> Dict:
        headers = {"Content-Type": "application/json"}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"
        req = _urlreq.Request(
            self.base_url + path, data=json.dumps(payload).encode(),
            headers=headers,
        )
        with _urlreq.urlopen(req, timeout=self.timeout) as r:
            return json.loads(r.read())

    @staticmethod
    def _oai_params(params: Dict) -> Dict:
        out = {}
        if "max_new_tokens" in params:
            out["max_tokens"] = params["max_new_tokens"]
        for k in ("temperature", "top_p", "stop"):
            if k in params:
                out[k] = params[k]
        return out

    def generate(self, text: str, params: Dict) -> str:
        out = self._post("/v1/completions", {
            "model": self.model, "prompt": text, **self._oai_params(params),
        })
        return out["choices"][0]["text"]

    def select(self, text: str, choices: Sequence[str], method: str) -> List[float]:
        def score(t: str):
            return self._post("/v1/completions", {
                "model": self.model, "prompt": t, "echo": True,
                "logprobs": 1, "max_tokens": 0,
            })

        # token count of the bare prompt fixes the choice boundary
        n_prompt = score(text)["usage"]["prompt_tokens"]
        per_choice = []
        for c in choices:
            out = score(text + c)
            lps = out["choices"][0]["logprobs"]["token_logprobs"]
            # token_logprobs[i] is position i+1; choice tokens are
            # positions >= n_prompt -> list indices >= n_prompt - 1
            per_choice.append(lps[n_prompt - 1:])
        return _rank_scores(per_choice, method)


class _HttpJsonBackend:
    """Shared raw-HTTP plumbing for the third-party chat backends below.
    ``transport(url, payload, headers) -> dict`` is injectable so the
    protocol logic is testable without egress (this build environment has
    none; the reference backends import the vendor SDKs instead)."""

    def __init__(self, transport=None, timeout: float = 120.0):
        self.timeout = timeout
        self._transport = transport or self._default_transport

    def _default_transport(self, url: str, payload: Dict, headers: Dict) -> Dict:
        req = _urlreq.Request(
            url, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json", **headers},
        )
        with _urlreq.urlopen(req, timeout=self.timeout) as r:
            return json.loads(r.read())

    @staticmethod
    def _select_unsupported(*_a, **_k):
        raise NotImplementedError(
            "select() needs prompt logprobs, which chat-completion vendor "
            "APIs do not expose (the reference Anthropic/LiteLLM/VertexAI "
            "backends have the same limitation)")

    select = _select_unsupported


class AnthropicBackend(_HttpJsonBackend):
    """Anthropic Messages API backend (reference lang/backend/anthropic.py,
    which wraps the SDK; this speaks the REST protocol directly). DSL text
    is sent as a single user message — the reference's fallback when no
    structured messages exist (anthropic.py:36-37)."""

    API_URL = "https://api.anthropic.com/v1/messages"

    def __init__(self, model: str, api_key: str = "", max_tokens: int = 1024,
                 transport=None, timeout: float = 120.0):
        super().__init__(transport, timeout)
        self.model = model
        self.api_key = api_key
        self.max_tokens = max_tokens

    def generate(self, text: str, params: Dict) -> str:
        payload = {
            "model": self.model,
            "max_tokens": params.get("max_new_tokens", self.max_tokens),
            "messages": [{"role": "user", "content": text}],
        }
        for src, dst in (("temperature", "temperature"), ("top_p", "top_p"),
                         ("stop", "stop_sequences")):
            if src in params and params[src] is not None:
                payload[dst] = params[src]
        out = self._transport(self.API_URL, payload, {
            "x-api-key": self.api_key, "anthropic-version": "2023-06-01",
        })
        return "".join(
            b.get("text", "") for b in out.get("content", [])
            if b.get("type") == "text"
        )


class LiteLLMBackend(_HttpJsonBackend):
    """LiteLLM-proxy backend (reference lang/backend/litellm.py): any model
    behind a LiteLLM gateway speaks OpenAI chat completions."""

    def __init__(self, model: str, base_url: str, api_key: str = "",
                 transport=None, timeout: float = 120.0):
        super().__init__(transport, timeout)
        self.model = model
        self.base_url = base_url.rstrip("/")
        self.api_key = api_key

    def generate(self, text: str, params: Dict) -> str:
        payload = {
            "model": self.model,
            "messages": [{"role": "user", "content": text}],
        }
        if "max_new_tokens" in params:
            payload["max_tokens"] = params["max_new_tokens"]
        for k in ("temperature", "top_p", "stop"):
            if k in params and params[k] is not None:
                payload[k] = params[k]
        headers = {}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"
        out = self._transport(
            self.base_url + "/v1/chat/completions", payload, headers)
        return out["choices"][0]["message"]["content"]


class VertexAIBackend(_HttpJsonBackend):
    """Vertex AI generateContent backend (reference
    lang/backend/vertexai.py, which wraps the google-cloud SDK)."""

    def __init__(self, model: str, project: str, location: str = "us-central1",
                 access_token: str = "", transport=None, timeout: float = 120.0):
        super().__init__(transport, timeout)
        self.model = model
        self.url = (
            f"https://{location}-aiplatform.googleapis.com/v1/projects/"
            f"{project}/locations/{location}/publishers/google/models/"
            f"{model}:generateContent"
        )
        self.access_token = access_token

    def generate(self, text: str, params: Dict) -> str:
        gen_cfg = {}
        if "max_new_tokens" in params:
            gen_cfg["maxOutputTokens"] = params["max_new_tokens"]
        for src, dst in (("temperature", "temperature"), ("top_p", "topP"),
                         ("stop", "stopSequences")):
            if src in params and params[src] is not None:
                gen_cfg[dst] = params[src]
        payload = {
            "contents": [{"role": "user", "parts": [{"text": text}]}],
            "generationConfig": gen_cfg,
        }
        headers = {}
        if self.access_token:
            headers["Authorization"] = f"Bearer {self.access_token}"
        out = self._transport(self.url, payload, headers)
        parts = out["candidates"][0]["content"]["parts"]
        return "".join(p.get("text", "") for p in parts)
