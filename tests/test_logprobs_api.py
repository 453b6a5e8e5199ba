"""Top-k logprobs through the HTTP API surface (reference
openai_api/adapter.py:702 completions logprobs=N, chat logprobs=true +
top_logprobs=N, and /generate meta_info output_top_logprobs)."""

import asyncio

import pytest
from aiohttp.test_utils import TestClient, TestServer

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.config.server_args import ServerArgs
from semi_pd_tpu.entrypoints.async_engine import AsyncEngine
from semi_pd_tpu.entrypoints.http_server import build_app
from semi_pd_tpu.runtime.engine import Engine


class _CharTok:
    eos_token_id = 97
    vocab_size = 128

    def encode(self, s):
        return [ord(c) - 32 for c in s if 32 <= ord(c) < 127]

    def decode(self, ids, **kw):
        return "".join(chr(i + 32) for i in ids if 0 <= i < 95)

    def convert_ids_to_tokens(self, ids):
        return [chr(i + 32) if 0 <= i < 95 else "<s>" for i in ids]

    def apply_chat_template(self, messages, tokenize=True,
                            add_generation_prompt=True, **kw):
        text = " ".join(m["content"] for m in messages)
        return self.encode(text)


@pytest.fixture(scope="module")
def engine():
    from transformers import LlamaConfig

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, tie_word_embeddings=False,
    )
    cfg.architectures = ["LlamaForCausalLM"]
    mc = ModelConfig.from_hf_config(cfg, dtype="float32")
    return Engine(
        server_args=ServerArgs(
            model_path="", random_weights=True, page_size=4,
            max_total_tokens=2048, dtype="float32",
        ),
        model_config=mc, tokenizer=_CharTok(),
    )


def _drive(engine, coro_fn):
    async def runner():
        ae = AsyncEngine(engine)
        ae.start(asyncio.get_running_loop())
        app = build_app(ae)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            await coro_fn(client)
        finally:
            await client.close()
            ae.shutdown()

    asyncio.run(runner())


def test_generate_top_logprobs(engine):
    async def body(client):
        r = await client.post("/generate", json={
            "text": "hello world",
            "return_logprob": True,
            "top_logprobs_num": 3,
            "sampling_params": {"max_new_tokens": 4, "temperature": 0.0,
                                "ignore_eos": True},
        })
        assert r.status == 200
        d = await r.json()
        mi = d["meta_info"]
        assert len(mi["output_logprobs"]) == 4
        tops = mi["output_top_logprobs"]
        assert len(tops) == 4
        for (vals, ids), tok, lp in zip(
                tops, d["output_ids"], mi["output_logprobs"]):
            assert len(vals) == 3 and len(ids) == 3
            assert ids[0] == tok  # greedy: sampled token is the argmax
            assert abs(vals[0] - lp) < 1e-4

    _drive(engine, body)


def test_completions_logprobs(engine):
    async def body(client):
        r = await client.post("/v1/completions", json={
            "prompt": "abc", "max_tokens": 3, "temperature": 0.0,
            "logprobs": 2,
        })
        assert r.status == 200
        d = await r.json()
        lp = d["choices"][0]["logprobs"]
        assert lp is not None
        assert len(lp["tokens"]) == 3
        assert len(lp["token_logprobs"]) == 3
        assert len(lp["top_logprobs"]) == 3
        for tl in lp["top_logprobs"]:
            assert len(tl) == 2
            assert all(isinstance(v, float) for v in tl.values())
        assert lp["text_offset"][0] == 0

    _drive(engine, body)


def test_completions_echo_logprobs_scoring(engine):
    async def body(client):
        r = await client.post("/v1/completions", json={
            "prompt": "abcd", "max_tokens": 0, "temperature": 0.0,
            "logprobs": 2, "echo": True,
        })
        assert r.status == 200
        d = await r.json()
        lp = d["choices"][0]["logprobs"]
        # input scoring: one entry per prompt position past the first
        assert len(lp["tokens"]) == 3
        assert lp["top_logprobs"] is not None and len(lp["top_logprobs"]) == 3
        assert all(len(t) == 2 for t in lp["top_logprobs"])

    _drive(engine, body)


def test_chat_logprobs(engine):
    async def body(client):
        r = await client.post("/v1/chat/completions", json={
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 3, "temperature": 0.0,
            "logprobs": True, "top_logprobs": 2,
        })
        assert r.status == 200
        d = await r.json()
        lp = d["choices"][0]["logprobs"]
        assert lp is not None
        content = lp["content"]
        assert len(content) == 3
        for e in content:
            assert isinstance(e["token"], str)
            assert isinstance(e["logprob"], float)
            assert isinstance(e["bytes"], list)
            assert len(e["top_logprobs"]) == 2
            assert e["top_logprobs"][0]["logprob"] >= e["top_logprobs"][1]["logprob"]

    _drive(engine, body)


def test_generate_input_top_logprobs(engine):
    async def body(client):
        r = await client.post("/generate", json={
            "text": "abcde",
            "return_logprob": True,
            "top_logprobs_num": 2,
            "logprob_start_len": 1,
            "sampling_params": {"max_new_tokens": 0},
        })
        assert r.status == 200
        d = await r.json()
        mi = d["meta_info"]
        assert len(mi["input_token_logprobs"]) == 4
        assert len(mi["input_top_logprobs"]) == 4
        for pos in mi["input_top_logprobs"]:
            assert len(pos) == 2  # [(logprob, token_id), ...]
            assert pos[0][0] >= pos[1][0]

    _drive(engine, body)
