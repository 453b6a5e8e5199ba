"""DSL backends: in-process Engine and HTTP RuntimeEndpoint.

Reference: python/sglang/lang/backend/runtime_endpoint.py (RuntimeEndpoint
hitting /generate, select via normalized prompt logprobs) and the in-process
Engine path. `select` scores each choice continuation with the teacher-forced
input-logprob mode (Engine.score / /generate with max_new_tokens=0) — one
prefill per choice, and the shared prompt prefix is a radix-cache hit."""

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
