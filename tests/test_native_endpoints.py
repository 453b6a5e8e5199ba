"""Deployment-platform + debug endpoints (reference http_server.py:
/ping, /invocations, /vertex_generate, /parse_function_call,
/separate_reasoning, /configure_logging, /get_weights_by_name,
/set_internal_state)."""

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


def test_ping_and_invocations(engine):
    async def body(client):
        r = await client.get("/ping")
        assert r.status == 200 and (await r.text()) == "ok"
        r = await client.post("/invocations", json={
            "messages": [{"role": "user", "content": "x"}],
            "max_tokens": 3, "temperature": 0.0})
        assert r.status == 200
        j = await r.json()
        assert j["choices"][0]["message"]["role"] == "assistant"

    _drive(engine, body)


def test_vertex_generate(engine):
    async def body(client):
        r = await client.post("/vertex_generate", json={
            "instances": [{"text": "ab"}, {"text": "cd"}],
            "parameters": {
                "sampling_params": {"max_new_tokens": 2, "temperature": 0.0},
            },
        })
        assert r.status == 200
        j = await r.json()
        assert len(j["predictions"]) == 2
        assert all(len(p["output_ids"]) == 2 for p in j["predictions"])
        r = await client.post("/vertex_generate", json={"instances": []})
        assert (await r.json()) == {"predictions": []}

    _drive(engine, body)


def test_parser_utility_endpoints(engine):
    async def body(client):
        text = ('I will call <tool_call>{"name": "add", "arguments": '
                '{"a": 1}}</tool_call>')
        r = await client.post("/parse_function_call", json={"text": text})
        j = await r.json()
        assert j["calls"][0]["function"]["name"] == "add"
        assert "tool_call" not in j["normal_text"]

        r = await client.post("/separate_reasoning", json={
            "text": "<think>hmm</think>the answer",
            "reasoning_parser": "deepseek-r1"})
        j = await r.json()
        assert j["reasoning_text"] == "hmm" and j["text"] == "the answer"
        r = await client.post("/separate_reasoning", json={
            "text": "x", "reasoning_parser": "nope"})
        assert r.status == 400

    _drive(engine, body)


def test_configure_logging_and_weights_by_name(engine):
    async def body(client):
        r = await client.post("/configure_logging", json={
            "log_requests": True, "log_requests_level": 2})
        assert (await r.json())["success"]
        assert engine.server_args.log_requests
        assert engine.server_args.log_requests_level == 2
        engine.server_args.log_requests = False

        r = await client.post("/get_weights_by_name", json={
            "name": "embed.w", "truncate_size": 4})
        j = await r.json()
        assert r.status == 200, j
        assert len(j["values"]) == 4 and j["shape"][0] == 128
        r = await client.post("/get_weights_by_name", json={"name": "zzz"})
        assert r.status == 400

    _drive(engine, body)


def test_set_internal_state(engine):
    async def body(client):
        r = await client.post("/set_internal_state", json={
            "server_args": {"speculative_accept_threshold_acc": 0.5}})
        j = await r.json()
        assert j["updated"] and \
            j["server_args"]["speculative_accept_threshold_acc"] == 0.5
        r = await client.post("/set_internal_state", json={
            "server_args": {"tp_size": 4}})
        assert r.status == 400

    _drive(engine, body)
