"""Frontend DSL (reference: python/sglang/lang/ — test/lang/test_srt_backend.py
rows: gen, select, fork, roles, run_batch)."""

import numpy as np
import pytest

from semi_pd_tpu import lang as sgl
from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.config.server_args import ServerArgs
from semi_pd_tpu.runtime.engine import Engine


class _CharTok:
    """Char-level tokenizer over ASCII (ids = ord - 32)."""

    bos_token_id = 96
    eos_token_id = 97
    vocab_size = 128

    def encode(self, s):
        return [ord(c) - 32 for c in s if 32 <= ord(c) < 127]

    def decode(self, ids, **kw):
        return "".join(chr(i + 32) for i in ids if 0 <= i < 95)

    def convert_ids_to_tokens(self, ids):
        return [chr(i + 32) if 0 <= i < 95 else "<s>" for i in ids]


@pytest.fixture(scope="module")
def backend():
    from transformers import LlamaConfig

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, tie_word_embeddings=False,
    )
    cfg.architectures = ["LlamaForCausalLM"]
    mc = ModelConfig.from_hf_config(cfg, dtype="float32")
    eng = Engine(
        server_args=ServerArgs(model_path="", random_weights=True, page_size=4,
                               max_total_tokens=2048, dtype="float32"),
        model_config=mc, tokenizer=_CharTok(),
    )
    return sgl.EngineBackend(eng)


def test_gen_and_roles(backend):
    @sgl.function
    def f(s, q):
        s += sgl.system("be terse")
        s += sgl.user(q)
        with s.assistant():
            s += "A: " + sgl.gen("ans", max_tokens=5, temperature=0.0)

    st = f.run(q="hi", backend=backend)
    assert len(st["ans"]) > 0
    assert "<|system|>" in st.text() and "<|user|>" in st.text()
    assert st.text().endswith(st["ans"] + "\n")


def test_select_picks_argmax_and_is_deterministic(backend):
    @sgl.function
    def f(s):
        s += "pick: " + sgl.select("c", ["alpha", "beta", "gamma"])

    st1 = f.run(backend=backend)
    st2 = f.run(backend=backend)
    assert st1["c"] in ("alpha", "beta", "gamma")
    assert st1["c"] == st2["c"]
    scores = st1.meta["c__scores"]
    assert len(scores) == 3
    assert st1["c"] == ["alpha", "beta", "gamma"][int(np.argmax(scores))]


def test_fork_shares_prefix(backend):
    @sgl.function
    def f(s):
        s += "story: "

    st = f.run(backend=backend)
    forks = st.fork(3)
    for i, fk in enumerate(forks):
        fk += f"v{i}: " + sgl.gen("out", max_tokens=4, temperature=0.0)
    assert all("out" in fk for fk in forks)
    # parent untouched
    assert "out" not in st
    assert forks[0].text().startswith("story: v0: ")


def test_run_batch(backend):
    @sgl.function
    def f(s, x):
        s += x + sgl.gen("y", max_tokens=3, temperature=0.0)

    sts = f.run_batch([{"x": "a"}, {"x": "b"}], backend=backend)
    assert len(sts) == 2 and all("y" in s for s in sts)


def test_default_backend_and_errors(backend):
    @sgl.function
    def f(s):
        s += sgl.gen("z", max_tokens=2)

    sgl.set_default_backend(None)
    with pytest.raises(ValueError):
        f.run()
    sgl.set_default_backend(backend)
    try:
        assert "z" in f.run()
    finally:
        sgl.set_default_backend(None)
    with pytest.raises(ValueError):
        sgl.select("n", [])


@pytest.fixture(scope="module")
def live_server(backend):
    """Real aiohttp server on localhost so the sync OpenAI-protocol client
    can hit it (reference tier-3 pattern: popen_launch_server + HTTP)."""
    import asyncio
    import socket
    import threading

    from aiohttp import web as _web

    from semi_pd_tpu.entrypoints.async_engine import AsyncEngine
    from semi_pd_tpu.entrypoints.http_server import build_app

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    loop = asyncio.new_event_loop()
    started = threading.Event()
    runner_box = {}

    def run():
        asyncio.set_event_loop(loop)
        ae = AsyncEngine(backend.engine)
        ae.start(loop)
        app = build_app(ae)
        runner = _web.AppRunner(app)
        loop.run_until_complete(runner.setup())
        site = _web.TCPSite(runner, "127.0.0.1", port)
        loop.run_until_complete(site.start())
        runner_box["runner"] = runner
        started.set()
        loop.run_forever()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert started.wait(30)
    yield f"http://127.0.0.1:{port}"
    loop.call_soon_threadsafe(loop.stop)
    t.join(timeout=10)


def test_openai_backend_gen_and_select(backend, live_server):
    """The OpenAI-protocol backend (reference lang/backend/openai.py) against
    our own /v1 surface: gen via /v1/completions, select via echo+logprobs
    prompt scoring — must agree with the in-process EngineBackend."""
    oai = sgl.OpenAIBackend(live_server, model="default")

    @sgl.function
    def f(s):
        s += "pick: " + sgl.select("c", ["alpha", "beta", "gamma"])
        s += " then " + sgl.gen("out", max_tokens=3, temperature=0.0)

    st_o = f.run(backend=oai)
    st_e = f.run(backend=backend)
    assert st_o["c"] == st_e["c"]
    assert st_o["out"] == st_e["out"]
    np.testing.assert_allclose(
        st_o.meta["c__scores"], st_e.meta["c__scores"], rtol=1e-4, atol=1e-5)


def test_chat_stream_with_tools_emits_single_finish_chunk(live_server):
    """tools + stream=True drives the streaming tool-call holdback path:
    exactly one finish chunk (reference parse_stream_chunk behavior); with
    no markup in the output the text still streams through."""
    import json as _json
    from urllib import request as _rq

    body = _json.dumps({
        "messages": [{"role": "user", "content": "hi"}],
        "max_tokens": 6, "stream": True, "temperature": 0,
        "tools": [{"type": "function",
                   "function": {"name": "f", "parameters": {}}}],
    }).encode()
    r = _rq.urlopen(_rq.Request(
        live_server + "/v1/chat/completions", data=body,
        headers={"Content-Type": "application/json"}), timeout=60)
    finishes, content = [], ""
    for line in r.read().decode().splitlines():
        if not line.startswith("data: ") or line == "data: [DONE]":
            continue
        c = _json.loads(line[6:])["choices"][0]
        if c["finish_reason"]:
            finishes.append(c["finish_reason"])
        content += c["delta"].get("content", "")
    assert finishes == ["length"]
    assert len(content) > 0  # text still streamed (no markup in output)


def test_third_party_chat_backends_protocols():
    """Anthropic/LiteLLM/VertexAI DSL backends (reference lang/backend/
    {anthropic,litellm,vertexai}.py): protocol shape via injected transport
    (no egress in this environment)."""
    import pytest as _pytest

    from semi_pd_tpu.lang.backends import (
        AnthropicBackend,
        LiteLLMBackend,
        VertexAIBackend,
    )

    calls = []

    def fake_anthropic(url, payload, headers):
        calls.append((url, payload, headers))
        return {"content": [{"type": "text", "text": "claude says hi"}]}

    be = AnthropicBackend("claude-3-5-sonnet", api_key="k",
                          transport=fake_anthropic)
    out = be.generate("hello", {"max_new_tokens": 7, "temperature": 0.5,
                                "stop": ["\n"]})
    assert out == "claude says hi"
    url, payload, headers = calls[-1]
    assert url.endswith("/v1/messages")
    assert payload["max_tokens"] == 7 and payload["stop_sequences"] == ["\n"]
    assert payload["messages"] == [{"role": "user", "content": "hello"}]
    assert headers["x-api-key"] == "k"
    with _pytest.raises(NotImplementedError):
        be.select("x", ["a", "b"], "token_length_normalized")

    def fake_oai(url, payload, headers):
        calls.append((url, payload, headers))
        return {"choices": [{"message": {"content": "lite"}}]}

    be2 = LiteLLMBackend("gpt-x", base_url="http://proxy:4000", api_key="t",
                         transport=fake_oai)
    assert be2.generate("q", {"max_new_tokens": 3}) == "lite"
    url, payload, headers = calls[-1]
    assert url == "http://proxy:4000/v1/chat/completions"
    assert headers["Authorization"] == "Bearer t"

    def fake_vertex(url, payload, headers):
        calls.append((url, payload, headers))
        return {"candidates": [{"content": {"parts": [{"text": "vx"}]}}]}

    be3 = VertexAIBackend("gemini-pro", project="p1", access_token="tok",
                          transport=fake_vertex)
    assert be3.generate("q", {"max_new_tokens": 3, "top_p": 0.9}) == "vx"
    url, payload, _ = calls[-1]
    assert "projects/p1/locations/us-central1" in url
    assert payload["generationConfig"]["topP"] == 0.9


def test_dsl_runs_on_chat_backend():
    """The eager interpreter drives a messages-style backend end-to-end."""
    from semi_pd_tpu.lang.backends import AnthropicBackend
    from semi_pd_tpu.lang.interpreter import function, gen

    be = AnthropicBackend(
        "claude-3-5-sonnet",
        transport=lambda u, p, h: {
            "content": [{"type": "text",
                         "text": f"echo:{p['messages'][0]['content'][-6:]}"}]},
    )

    @function
    def prog(s, topic):
        s += "Tell me about " + topic + gen("answer", max_tokens=16)

    st = prog.run("TPUs", backend=be)
    assert st["answer"].startswith("echo:")
