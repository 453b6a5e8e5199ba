"""OpenAI files + batches API (reference srt/openai_api/adapter.py:175-476).

Drives the real aiohttp app (build_app) with aiohttp's TestClient over a tiny
random-weight engine, matching the reference's server-integration tier
(test/srt/openai_server tests) on the CPU backend."""

import asyncio
import json

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
def engine(tmp_path_factory):
    from transformers import LlamaConfig

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, tie_word_embeddings=False,
    )
    cfg.architectures = ["LlamaForCausalLM"]
    mc = ModelConfig.from_hf_config(cfg, dtype="float32")
    storage = str(tmp_path_factory.mktemp("oai_files"))
    eng = Engine(
        server_args=ServerArgs(
            model_path="", random_weights=True, page_size=4,
            max_total_tokens=2048, dtype="float32",
            file_storage_path=storage,
        ),
        model_config=mc, tokenizer=_CharTok(),
    )
    return eng


def _drive(engine, coro_fn):
    """Run an async test body against a live TestClient of the app."""

    async def runner():
        ae = AsyncEngine(engine)
        loop = asyncio.get_running_loop()
        ae.start(loop)
        app = build_app(ae)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            await coro_fn(client)
        finally:
            await client.close()
            ae.shutdown()

    asyncio.run(runner())


JSONL = b"\n".join(
    json.dumps({
        "custom_id": f"req-{i}",
        "method": "POST",
        "url": "/v1/completions",
        "body": {"prompt": "ab", "max_tokens": 3, "temperature": 0.0},
    }).encode()
    for i in range(3)
)


def test_files_roundtrip(engine):
    async def body(client):
        import aiohttp

        form = aiohttp.FormData()
        form.add_field("file", JSONL, filename="reqs.jsonl")
        form.add_field("purpose", "batch")
        r = await client.post("/v1/files", data=form)
        assert r.status == 200, await r.text()
        meta = await r.json()
        fid = meta["id"]
        assert meta["bytes"] == len(JSONL) and meta["purpose"] == "batch"

        r = await client.get(f"/v1/files/{fid}")
        assert (await r.json())["filename"] == "reqs.jsonl"

        r = await client.get(f"/v1/files/{fid}/content")
        assert await r.read() == JSONL

        r = await client.delete(f"/v1/files/{fid}")
        assert (await r.json())["deleted"] is True
        r = await client.get(f"/v1/files/{fid}")
        assert r.status == 404

    _drive(engine, body)


def test_batch_completes(engine):
    async def body(client):
        import aiohttp

        form = aiohttp.FormData()
        form.add_field("file", JSONL, filename="reqs.jsonl")
        form.add_field("purpose", "batch")
        fid = (await (await client.post("/v1/files", data=form)).json())["id"]

        r = await client.post("/v1/batches", json={
            "input_file_id": fid, "endpoint": "/v1/completions",
            "completion_window": "24h", "metadata": {"k": "v"},
        })
        assert r.status == 200, await r.text()
        batch = await r.json()
        bid = batch["id"]
        assert batch["status"] in ("validating", "in_progress")

        for _ in range(300):
            batch = await (await client.get(f"/v1/batches/{bid}")).json()
            if batch["status"] in ("completed", "failed"):
                break
            await asyncio.sleep(0.1)
        assert batch["status"] == "completed", batch
        assert batch["request_counts"] == {"total": 3, "completed": 3, "failed": 0}

        out = await (await client.get(
            f"/v1/files/{batch['output_file_id']}/content")).read()
        lines = [json.loads(l) for l in out.splitlines() if l.strip()]
        assert len(lines) == 3
        assert {l["custom_id"] for l in lines} == {"req-0", "req-1", "req-2"}
        for l in lines:
            assert l["error"] is None
            resp = l["response"]["body"]
            assert resp["object"] == "text_completion"
            assert resp["usage"]["completion_tokens"] == 3

    _drive(engine, body)


def test_batch_with_bad_line_still_completes(engine):
    """A line whose body can't make a request (e.g. chat body posted to a
    completions batch -> empty prompt) must fail THAT line, not wedge the
    whole batch (bug found driving the live server)."""
    mixed = JSONL + b"\n" + json.dumps({
        "custom_id": "bad",
        "body": {"messages": [{"role": "user", "content": "hi"}], "max_tokens": 2},
    }).encode()

    async def body(client):
        import aiohttp

        form = aiohttp.FormData()
        form.add_field("file", mixed, filename="mixed.jsonl")
        form.add_field("purpose", "batch")
        fid = (await (await client.post("/v1/files", data=form)).json())["id"]
        r = await client.post("/v1/batches", json={
            "input_file_id": fid, "endpoint": "/v1/completions"})
        bid = (await r.json())["id"]
        for _ in range(300):
            batch = await (await client.get(f"/v1/batches/{bid}")).json()
            if batch["status"] in ("completed", "failed"):
                break
            await asyncio.sleep(0.1)
        assert batch["status"] == "completed", batch
        assert batch["request_counts"] == {"total": 4, "completed": 3, "failed": 1}

        # direct empty input -> 400, not a wedged request
        r = await client.post("/generate", json={
            "text": "", "sampling_params": {"max_new_tokens": 2}})
        assert r.status == 400

    _drive(engine, body)


def test_batch_error_paths(engine):
    async def body(client):
        r = await client.post("/v1/batches", json={
            "input_file_id": "nope", "endpoint": "/v1/completions"})
        assert r.status == 404
        r = await client.post("/v1/batches", json={
            "input_file_id": "nope", "endpoint": "/v1/embeddings"})
        assert r.status == 400
        r = await client.get("/v1/batches/batch_missing")
        assert r.status == 404
        r = await client.post("/v1/batches/batch_missing/cancel")
        assert r.status == 404

    _drive(engine, body)
