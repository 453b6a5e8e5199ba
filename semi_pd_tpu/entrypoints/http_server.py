"""HTTP API server (aiohttp).

Reference: python/sglang/srt/entrypoints/http_server.py (FastAPI; native
endpoints :145-491) + srt/openai_api/adapter.py (OpenAI translation). Same
endpoint surface, aiohttp transport; one process, no subprocess tree
(reference engine.py:80-90) because the scheduler is in-process.

Endpoints: /generate, /health, /health_generate, /get_model_info,
/get_server_info, /flush_cache, /abort_request, /update_weights_from_disk,
/start_profile, /stop_profile, /metrics, /v1/completions,
/v1/chat/completions, /v1/models.
"""

from __future__ import annotations

import asyncio
import json
import logging
import time
from typing import Any, Dict, Optional

from aiohttp import web

from semi_pd_tpu.entrypoints.async_engine import AsyncEngine
from semi_pd_tpu.entrypoints.protocol import (
    ChatCompletionRequest,
    CompletionRequest,
    chat_id,
    completion_id,
    now,
)

logger = logging.getLogger(__name__)


def build_app(async_engine: AsyncEngine) -> web.Application:
    app = web.Application()
    app["engine"] = async_engine
    app.add_routes([
        web.get("/health", health),
        web.get("/health_generate", health_generate),
        web.get("/get_model_info", get_model_info),
        web.get("/get_server_info", get_server_info),
        web.get("/metrics", metrics),
        web.post("/generate", generate),
        web.post("/encode", encode),
        web.post("/classify", classify),
        web.post("/load_lora_adapter", load_lora_adapter),
        web.post("/unload_lora_adapter", unload_lora_adapter),
        web.post("/open_session", open_session),
        web.post("/close_session", close_session),
        web.post("/v1/embeddings", v1_embeddings),
        web.post("/flush_cache", flush_cache),
        web.post("/release_memory_occupation", release_memory_occupation),
        web.post("/resume_memory_occupation", resume_memory_occupation),
        web.post("/abort_request", abort_request),
        web.post("/update_weights_from_disk", update_weights_from_disk),
        web.post("/init_weights_update_group", init_weights_update_group),
        web.post("/update_weights_from_distributed", update_weights_from_distributed),
        web.post("/start_profile", start_profile),
        web.post("/stop_profile", stop_profile),
        web.post("/v1/completions", v1_completions),
        web.post("/v1/chat/completions", v1_chat_completions),
        web.get("/v1/models", v1_models),
        # deployment-platform + debug surface (reference http_server.py)
        web.get("/ping", health),  # SageMaker liveness alias
        web.post("/invocations", v1_chat_completions),  # SageMaker entry
        web.post("/vertex_generate", vertex_generate),
        web.post("/parse_function_call", parse_function_call),
        web.post("/separate_reasoning", separate_reasoning),
        web.post("/configure_logging", configure_logging),
        web.post("/get_weights_by_name", get_weights_by_name),
        web.post("/set_internal_state", set_internal_state),
    ])
    from semi_pd_tpu.entrypoints.openai_files import add_routes as add_file_routes

    add_file_routes(app, async_engine.engine.server_args.file_storage_path)
    return app


# ---------------------------------------------------------------- native
async def health(request: web.Request) -> web.Response:
    return web.Response(text="ok")


async def health_generate(request: web.Request) -> web.Response:
    """Tiny generation probe (reference http_server.py /health_generate)."""
    ae: AsyncEngine = request.app["engine"]
    try:
        out = await asyncio.wait_for(
            ae.generate_full(
                input_ids=[1, 2, 3],
                sampling_params={"max_new_tokens": 1, "temperature": 0.0, "ignore_eos": True},
            ),
            timeout=60,
        )
        ok = out is not None and "error" not in out
    except asyncio.TimeoutError:
        ok = False
    return web.Response(text="ok" if ok else "error", status=200 if ok else 503)


async def get_model_info(request: web.Request) -> web.Response:
    ae: AsyncEngine = request.app["engine"]
    sa = ae.engine.server_args
    return web.json_response({
        "model_path": sa.model_path,
        "served_model_name": sa.served_model_name,
        "is_generation": not ae.engine.runner.model_config.is_embedding,
    })


async def get_server_info(request: web.Request) -> web.Response:
    ae: AsyncEngine = request.app["engine"]
    info = ae.engine.get_server_info()
    info["version"] = __import__("semi_pd_tpu").__version__
    return web.json_response(info)


async def _json_body(request: web.Request) -> Dict[str, Any]:
    try:
        return await request.json()
    except Exception:
        raise web.HTTPBadRequest(
            text=json.dumps({"error": {"message": "invalid JSON body"}}),
            content_type="application/json",
        )


async def generate(request: web.Request) -> web.StreamResponse:
    ae: AsyncEngine = request.app["engine"]
    body = await _json_body(request)
    sp = body.get("sampling_params") or {}
    if body.get("return_logprob") and sp.get("max_new_tokens") == 0:
        # prompt-scoring mode (reference io_struct.py: return_logprob +
        # logprob_start_len with no generation -> input_token_logprobs)
        try:
            lps = await ae.run_job(lambda: ae.engine.score(
                prompt=body.get("text"), input_ids=body.get("input_ids"),
                logprob_start_len=int(body.get("logprob_start_len", 0)),
                top_logprobs_num=int(body.get("top_logprobs_num", 0)),
            ))
        except (ValueError, AssertionError) as e:
            return web.json_response({"error": {"message": str(e)}}, status=400)
        single = isinstance(body.get("text"), str) or (
            body.get("input_ids") and isinstance(body["input_ids"][0], int)
        )

        def mk(l):
            mi = {"input_token_logprobs": [(e[0], e[1]) for e in l],
                  "prompt_tokens": len(l)}
            if l and len(l[0]) == 3:
                # (reference meta_info input_top_logprobs: per position, a
                # list of (logprob, token_id))
                mi["input_top_logprobs"] = [
                    list(zip(e[2][0], e[2][1])) for e in l
                ]
            return {"text": "", "output_ids": [], "meta_info": mi}

        return web.json_response(mk(lps) if single else [mk(l) for l in lps])
    kwargs = dict(
        prompt=body.get("text"),
        input_ids=body.get("input_ids"),
        sampling_params=body.get("sampling_params") or {},
        rid=body.get("rid"),
        return_logprob=bool(body.get("return_logprob", False)),
        top_logprobs_num=int(body.get("top_logprobs_num", 0)),
        image_data=body.get("image_data"),
        lora_path=body.get("lora_path"),
        session_params=body.get("session_params"),
        # reference io_struct.py:46-47 GenerateReqInput.input_embeds —
        # [num_tokens, hidden] floats (or a batch of them)
        input_embeds=body.get("input_embeds"),
    )
    try:
        if body.get("stream"):
            resp = web.StreamResponse(
                headers={"Content-Type": "text/event-stream", "Cache-Control": "no-cache"}
            )
            await resp.prepare(request)
            async for item in ae.generate(stream=True, **kwargs):
                await resp.write(f"data: {json.dumps(item)}\n\n".encode())
            await resp.write(b"data: [DONE]\n\n")
            await resp.write_eof()
            return resp
        out = await ae.generate_full(**kwargs)
    except (ValueError, AssertionError) as e:
        return web.json_response({"error": {"message": str(e)}}, status=400)
    if out is None or "error" in (out or {}):
        return web.json_response({"error": (out or {}).get("error", "unknown")}, status=500)
    return web.json_response(out)


async def classify(request: web.Request) -> web.Response:
    """Classification / reward scores (reference http_server.py /classify —
    same pooling path as /encode; reward models return raw scores)."""
    ae: AsyncEngine = request.app["engine"]
    body = await _json_body(request)
    try:
        scores = await ae.run_job(lambda: ae.engine.encode(
            prompt=body.get("text"), input_ids=body.get("input_ids")
        ))
        return web.json_response({"scores": scores})
    except (ValueError, AssertionError) as e:
        return web.json_response({"error": {"message": str(e)}}, status=400)


async def encode(request: web.Request) -> web.Response:
    """Embedding extraction (reference http_server.py /encode)."""
    ae: AsyncEngine = request.app["engine"]
    body = await _json_body(request)
    try:
        emb = ae.engine.encode(
            prompt=body.get("text"), input_ids=body.get("input_ids")
        )
        return web.json_response({"embedding": emb})
    except (ValueError, AssertionError) as e:
        return web.json_response({"error": {"message": str(e)}}, status=400)


async def load_lora_adapter(request: web.Request) -> web.Response:
    """Dynamic adapter load (reference /load_lora_adapter). Runs on the
    tick thread: the stacked adapter pytree swap must not race a step."""
    ae: AsyncEngine = request.app["engine"]
    body = await _json_body(request)
    name = body.get("lora_name") or body.get("name")
    path = body.get("lora_path") or body.get("path")
    if not name or not path:
        return web.json_response(
            {"error": {"message": "lora_name and lora_path are required"}},
            status=400)
    try:
        idx = await ae.run_job(
            lambda: ae.engine.register_lora_adapter(name, path=path))
    except (ValueError, OSError) as e:
        return web.json_response({"error": {"message": str(e)}}, status=400)
    return web.json_response({"success": True, "adapter_index": idx})


async def unload_lora_adapter(request: web.Request) -> web.Response:
    ae: AsyncEngine = request.app["engine"]
    body = await _json_body(request)
    name = body.get("lora_name") or body.get("name")
    if not name:
        return web.json_response(
            {"error": {"message": "lora_name is required"}}, status=400)
    try:
        await ae.run_job(lambda: ae.engine.unload_lora_adapter(name))
    except ValueError as e:
        return web.json_response({"error": {"message": str(e)}}, status=400)
    return web.json_response({"success": True})


async def open_session(request: web.Request) -> web.Response:
    ae: AsyncEngine = request.app["engine"]
    body = await _json_body(request)
    try:
        sid = ae.engine.open_session(
            body.get("capacity_of_str_len", -1),
            session_id=body.get("session_id"))
    except ValueError as e:
        return web.json_response({"error": {"message": str(e)}}, status=400)
    return web.json_response({"session_id": sid})


async def close_session(request: web.Request) -> web.Response:
    ae: AsyncEngine = request.app["engine"]
    body = await _json_body(request)
    ok = ae.engine.close_session(body.get("session_id", ""))
    return web.json_response({"success": ok})


async def v1_embeddings(request: web.Request) -> web.Response:
    """OpenAI embeddings API (reference openai_api/adapter.py:1622)."""
    ae: AsyncEngine = request.app["engine"]
    body = await _json_body(request)
    inp = body.get("input", "")
    if isinstance(inp, str):
        inputs = [inp]
    elif inp and isinstance(inp[0], int):
        inputs = None
        token_inputs = [inp]
    else:
        inputs = list(inp)
    try:
        if inputs is not None:
            embs = ae.engine.encode(prompt=inputs)
        else:
            embs = ae.engine.encode(input_ids=token_inputs)
    except (ValueError, AssertionError) as e:
        return web.json_response({"error": {"message": str(e)}}, status=400)
    data = [
        {"object": "embedding", "index": i, "embedding": e}
        for i, e in enumerate(embs)
    ]
    return web.json_response({
        "object": "list", "data": data, "model": body.get("model", ""),
        "usage": {"prompt_tokens": 0, "total_tokens": 0},
    })


def _usage(mi: Dict[str, Any], ae: "AsyncEngine") -> Dict[str, Any]:
    """OpenAI usage object; --enable-cache-report adds cached_tokens
    (reference adapter.py to_openai_style_logprobs cache report path)."""
    u = {
        "prompt_tokens": mi["prompt_tokens"],
        "completion_tokens": mi["completion_tokens"],
        "total_tokens": mi["prompt_tokens"] + mi["completion_tokens"],
    }
    if ae.engine.server_args.enable_cache_report:
        u["prompt_tokens_details"] = {"cached_tokens": mi.get("cached_tokens", 0)}
    return u


async def flush_cache(request: web.Request) -> web.Response:
    """Reference /flush_cache: only possible when no requests are running.
    A refusal is reported as 409 with a message — a 200 {"success": false}
    is too easy to misread as a successful flush."""
    ae: AsyncEngine = request.app["engine"]
    ok = ae.engine.flush_cache()
    if not ok:
        return web.json_response(
            {"success": False,
             "message": "cache not flushed: requests are still running "
                        "or queued; retry when the server is idle"},
            status=409)
    return web.json_response({"success": True})


async def abort_request(request: web.Request) -> web.Response:
    ae: AsyncEngine = request.app["engine"]
    body = await _json_body(request)
    ae.abort(body.get("rid", ""))
    return web.json_response({"success": True})


async def vertex_generate(request: web.Request) -> web.Response:
    """Vertex AI prediction-route adapter (reference http_server.py:571-593
    — AIP_PREDICT_ROUTE): {"instances": [...], "parameters": {...}} ->
    /generate semantics, wrapped as {"predictions": ...}."""
    ae: AsyncEngine = request.app["engine"]
    body = await _json_body(request)
    instances = body.get("instances") or []
    if not instances:
        return web.json_response({"predictions": []})
    params = body.get("parameters") or {}
    # Reference spreads `parameters` as GenerateReqInput kwargs; only the
    # explicit sampling_params member is sampling config — treating the
    # whole object as sampling params would silently drop unknown keys.
    sp = params.get("sampling_params") or {}
    outs = await asyncio.gather(*(
        ae.generate_full(
            prompt=inst.get("text"),
            input_ids=inst.get("input_ids"),
            sampling_params=sp,
            image_data=inst.get("image_data"),
        )
        for inst in instances))
    return web.json_response({"predictions": list(outs)})


async def parse_function_call(request: web.Request) -> web.Response:
    """Run the tool-call parser on raw text (reference
    http_server.py:446-466 /parse_function_call)."""
    from semi_pd_tpu.utils.function_call import parse_tool_calls

    body = await _json_body(request)
    try:
        content, calls = parse_tool_calls(
            body.get("text", ""), body.get("tool_call_parser"))
    except ValueError as e:
        return web.json_response({"error": {"message": str(e)}}, status=400)
    return web.json_response({"normal_text": content, "calls": calls})


async def separate_reasoning(request: web.Request) -> web.Response:
    """Split reasoning from content in raw text (reference
    http_server.py:469-486 /separate_reasoning)."""
    from semi_pd_tpu.utils.reasoning_parser import ReasoningParser

    body = await _json_body(request)
    try:
        parser = ReasoningParser(body.get("reasoning_parser", "deepseek-r1"))
    except ValueError as e:
        return web.json_response({"error": {"message": str(e)}}, status=400)
    reasoning, content = parser.parse(body.get("text", ""))
    return web.json_response(
        {"reasoning_text": reasoning, "text": content})


async def configure_logging(request: web.Request) -> web.Response:
    """Adjust request-logging options at runtime (reference
    tokenizer_manager.py:830-840 ConfigureLoggingReq)."""
    ae: AsyncEngine = request.app["engine"]
    body = await _json_body(request)
    sa = ae.engine.server_args
    if body.get("log_requests") is not None:
        sa.log_requests = bool(body["log_requests"])
    if body.get("log_requests_level") is not None:
        sa.log_requests_level = int(body["log_requests_level"])
    if body.get("dump_requests_folder") is not None:
        sa.dump_requests_folder = str(body["dump_requests_folder"])
    if body.get("dump_requests_threshold") is not None:
        sa.dump_requests_threshold = int(body["dump_requests_threshold"])
    logger.info("configure_logging: %s", body)
    return web.json_response({"success": True})


async def get_weights_by_name(request: web.Request) -> web.Response:
    """Return a parameter's (truncated) values by pytree path (reference
    model_runner.py:895 get_weights_by_name — a unit-test endpoint)."""
    import jax

    ae: AsyncEngine = request.app["engine"]
    body = await _json_body(request)
    name = body.get("name", "")
    if not name:
        return web.json_response(
            {"error": {"message": "name is required"}}, status=400)
    truncate = int(body.get("truncate_size", 100))

    def key_str(path):
        return ".".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path)

    def walk():
        # On the tick thread (run_job): the parameter pytree may be swapped
        # by update_weights_from_disk / release-resume running there.
        import numpy as np

        flat = jax.tree_util.tree_flatten_with_path(
            ae.engine.runner.params)[0]
        for path, leaf in flat:
            ks = key_str(path)
            # exact path, or a suffix on a component boundary ("embed.w"
            # matches "layers.embed.w" but "w" alone never matches
            # arbitrary tensors)
            if ks == name or ks.endswith("." + name):
                vals = np.asarray(leaf).reshape(-1)[:truncate].tolist()
                return {"name": ks, "shape": list(leaf.shape),
                        "dtype": str(leaf.dtype), "values": vals}
        return None

    found = await ae.run_job(walk)
    if found is not None:
        return web.json_response(found)
    return web.json_response(
        {"error": {"message": f"no parameter path matches {name!r}"}},
        status=400)


async def set_internal_state(request: web.Request) -> web.Response:
    """Update the runtime-updatable server args (reference
    scheduler.py:1536-1560: only the speculative acceptance thresholds)."""
    ae: AsyncEngine = request.app["engine"]
    body = await _json_body(request)
    args = body.get("server_args") or {}
    allowed = {"speculative_accept_threshold_single",
               "speculative_accept_threshold_acc"}
    bad = set(args) - allowed
    if bad:
        return web.json_response(
            {"updated": False,
             "message": f"updating {sorted(bad)} is not supported"},
            status=400)

    def apply():
        ae.engine.runner.set_spec_thresholds(
            single=args.get("speculative_accept_threshold_single"),
            acc=args.get("speculative_accept_threshold_acc"))
        sa = ae.engine.server_args
        return {"speculative_accept_threshold_single":
                sa.speculative_accept_threshold_single,
                "speculative_accept_threshold_acc":
                sa.speculative_accept_threshold_acc}

    out = await ae.run_job(apply)
    return web.json_response({"updated": True, "server_args": out})


async def release_memory_occupation(request: web.Request) -> web.Response:
    """Free the KV pool's HBM between RL rollout phases (reference
    /release_memory_occupation, scheduler.py:1633-1648; gated on
    --enable-memory-saver like the reference's torch_memory_saver)."""
    ae: AsyncEngine = request.app["engine"]
    if not ae.engine.server_args.enable_memory_saver:
        return web.json_response(
            {"success": False, "message": "requires --enable-memory-saver"},
            status=400)
    ok = await ae.run_job(ae.engine.release_memory_occupation)
    if not ok:
        return web.json_response(
            {"success": False,
             "message": "memory not released: requests are still running or queued"},
            status=409)
    return web.json_response({"success": True})


async def resume_memory_occupation(request: web.Request) -> web.Response:
    ae: AsyncEngine = request.app["engine"]
    if not ae.engine.server_args.enable_memory_saver:
        return web.json_response(
            {"success": False, "message": "requires --enable-memory-saver"},
            status=400)
    ok = await ae.run_job(ae.engine.resume_memory_occupation)
    if not ok:
        return web.json_response(
            {"success": False,
             "message": "memory not resumed: requests are still running or queued"},
            status=409)
    return web.json_response({"success": True})


async def update_weights_from_disk(request: web.Request) -> web.Response:
    ae: AsyncEngine = request.app["engine"]
    body = await _json_body(request)
    try:
        ok = ae.engine.update_weights_from_disk(body["model_path"])
        return web.json_response({"success": ok})
    except Exception as e:
        return web.json_response({"success": False, "message": str(e)}, status=400)


async def init_weights_update_group(request: web.Request) -> web.Response:
    """Join a trainer's weight-update group (reference http_server.py
    /init_weights_update_group -> NCCL group; here utils/weight_sync.py TCP)."""
    ae: AsyncEngine = request.app["engine"]
    body = await _json_body(request)
    try:
        ok = await ae.run_job(lambda: ae.engine.init_weights_update_group(
            master_address=body["master_address"],
            master_port=int(body["master_port"]),
            group_name=body.get("group_name", "weight_update_group"),
        ))
        return web.json_response({"success": ok})
    except Exception as e:  # noqa: BLE001
        return web.json_response({"success": False, "message": str(e)}, status=400)


async def update_weights_from_distributed(request: web.Request) -> web.Response:
    """Receive announced tensors from the trainer group and swap them in
    (reference adapter /update_weights_from_distributed: name/dtype/shape per
    call, bytes over the group transport)."""
    ae: AsyncEngine = request.app["engine"]
    body = await _json_body(request)
    try:
        ok = await ae.run_job(lambda: ae.engine.update_weights_from_distributed(
            body["name"], body["dtype"], body["shape"],
        ))
        return web.json_response({"success": ok})
    except Exception as e:  # noqa: BLE001
        return web.json_response({"success": False, "message": str(e)}, status=400)


async def start_profile(request: web.Request) -> web.Response:
    """jax.profiler trace (reference scheduler.py:1649 start_profile via
    torch.profiler; TPU equivalent is XPlane/perfetto traces)."""
    import jax

    ae: AsyncEngine = request.app["engine"]
    out_dir = ae.engine.server_args.profiler_dir or "/tmp/semi_pd_tpu_profile"
    try:
        jax.profiler.start_trace(out_dir)
        return web.json_response({"success": True, "dir": out_dir})
    except Exception as e:
        return web.json_response({"success": False, "message": str(e)}, status=400)


async def stop_profile(request: web.Request) -> web.Response:
    import jax

    try:
        jax.profiler.stop_trace()
        return web.json_response({"success": True})
    except Exception as e:
        return web.json_response({"success": False, "message": str(e)}, status=400)


async def metrics(request: web.Request) -> web.Response:
    try:
        from prometheus_client import generate_latest, CONTENT_TYPE_LATEST

        from semi_pd_tpu.metrics.collector import update_gauges

        ae: AsyncEngine = request.app["engine"]
        update_gauges(ae.engine)
        return web.Response(
            body=generate_latest(), content_type=CONTENT_TYPE_LATEST.split(";")[0]
        )
    except ImportError:
        return web.Response(text="prometheus_client unavailable", status=501)


# ---------------------------------------------------------------- OpenAI
def _piece(tok, tid: int) -> str:
    """Single-token text for logprob displays (reference adapter.py
    to_openai_style_logprobs decodes via convert_ids_to_tokens)."""
    if hasattr(tok, "convert_ids_to_tokens"):
        p = tok.convert_ids_to_tokens([int(tid)])[0]
        if isinstance(p, str):
            return p
    return tok.decode([int(tid)]) if tok is not None else str(tid)


def _completion_logprobs(tok, ids, lps, tops, text_offset0: int = 0):
    """OpenAI completions `logprobs` object (reference adapter.py:702
    v1_completions logprobs): tokens / token_logprobs / top_logprobs /
    text_offset for the generated ids."""
    pieces = [_piece(tok, t) for t in ids]
    top_list = None
    if tops:
        top_list = [
            {_piece(tok, tid): lp for lp, tid in zip(t[0], t[1])}
            for t in tops
        ]
    offs, o = [], text_offset0
    for p in pieces:
        offs.append(o)
        o += len(p)
    return {
        "tokens": pieces,
        "token_logprobs": lps,
        "top_logprobs": top_list,
        "text_offset": offs,
    }


def _chat_logprobs(tok, ids, lps, tops):
    """OpenAI chat `logprobs.content` array (reference adapter.py
    v1_chat_completions logprobs=true + top_logprobs=N)."""
    content = []
    for i, tid in enumerate(ids):
        piece = _piece(tok, tid)
        entry = {
            "token": piece,
            "logprob": lps[i] if i < len(lps) else None,
            "bytes": list(piece.encode("utf-8")),
        }
        if tops and i < len(tops):
            entry["top_logprobs"] = [
                {"token": _piece(tok, t), "logprob": lp,
                 "bytes": list(_piece(tok, t).encode("utf-8"))}
                for lp, t in zip(tops[i][0], tops[i][1])
            ]
        else:
            entry["top_logprobs"] = []
        content.append(entry)
    return {"content": content}


async def v1_models(request: web.Request) -> web.Response:
    ae: AsyncEngine = request.app["engine"]
    sa = ae.engine.server_args
    return web.json_response({
        "object": "list",
        "data": [{
            "id": sa.served_model_name, "object": "model",
            "created": now(), "owned_by": "semi_pd_tpu",
        }],
    })


async def v1_completions(request: web.Request) -> web.StreamResponse:
    ae: AsyncEngine = request.app["engine"]
    try:
        req = CompletionRequest(**(await _json_body(request)))
    except Exception as e:
        return web.json_response({"error": {"message": str(e)}}, status=400)

    prompt, input_ids = None, None
    if isinstance(req.prompt, str):
        prompt = req.prompt
    elif req.prompt and isinstance(req.prompt[0], int):
        input_ids = req.prompt
    elif req.prompt:
        prompt = req.prompt[0]  # batch-of-1 only for now

    cid = completion_id()
    sp = req.to_sampling_dict()

    if req.echo and req.logprobs and not sp.get("max_new_tokens"):
        # Prompt-scoring mode (reference adapter.py v1_completions echo +
        # logprobs: teacher-forced input logprobs, no generation). Powers
        # the OpenAI-protocol lang backend's `select`.
        try:
            lps = await ae.run_job(lambda: ae.engine.score(
                prompt=prompt, input_ids=input_ids,
                top_logprobs_num=int(req.logprobs or 0)))
        except (ValueError, AssertionError) as e:
            return web.json_response({"error": {"message": str(e)}}, status=400)
        tok = ae.engine.tokenizer
        ids = [e[1] for e in lps]
        pieces = (tok.convert_ids_to_tokens(ids)
                  if hasattr(tok, "convert_ids_to_tokens") else
                  [str(t) for t in ids])
        top_list = None
        if lps and len(lps[0]) == 3 and (req.logprobs or 0) > 0:
            top_list = [
                {_piece(tok, tid): lp for lp, tid in zip(e[2][0], e[2][1])}
                for e in lps
            ]
        n_prompt = len(lps) + 1  # position 0 has no logprob
        return web.json_response({
            "id": cid, "object": "text_completion", "created": now(),
            "model": req.model,
            "choices": [{
                "index": 0,
                "text": prompt if prompt is not None else "",
                "finish_reason": "stop",
                "logprobs": {
                    "tokens": pieces,
                    "token_logprobs": [e[0] for e in lps],
                    "top_logprobs": top_list,
                    "text_offset": None,
                },
            }],
            "usage": {"prompt_tokens": n_prompt, "completion_tokens": 0,
                      "total_tokens": n_prompt},
        })

    if req.stream:
        resp = web.StreamResponse(
            headers={"Content-Type": "text/event-stream", "Cache-Control": "no-cache"}
        )
        await resp.prepare(request)
        sent = 0
        async for item in ae.generate(
            prompt=prompt, input_ids=input_ids, sampling_params=sp, stream=True
        ):
            if "error" in item:
                break
            text = item["text"][sent:]
            sent = len(item["text"])
            chunk = {
                "id": cid, "object": "text_completion", "created": now(),
                "model": req.model,
                "choices": [{
                    "index": 0, "text": text,
                    "finish_reason": item["meta_info"].get("finish_reason") if item["finished"] else None,
                }],
            }
            await resp.write(f"data: {json.dumps(chunk)}\n\n".encode())
        await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp

    try:
        out = await ae.generate_full(
            prompt=prompt, input_ids=input_ids, sampling_params=sp,
            return_logprob=req.logprobs is not None,
            top_logprobs_num=int(req.logprobs or 0),
        )
    except (ValueError, AssertionError) as e:
        return web.json_response({"error": {"message": str(e)}}, status=400)
    if out is None or "error" in out:
        return web.json_response({"error": {"message": (out or {}).get("error", "unknown")}}, status=500)
    mi = out["meta_info"]
    text = out["text"]
    if req.echo and prompt is not None:
        text = prompt + text  # reference adapter echo: prepend the prompt
    lp_obj = None
    if req.logprobs is not None:
        lp_obj = _completion_logprobs(
            ae.engine.tokenizer, out["output_ids"],
            mi.get("output_logprobs") or [],
            mi.get("output_top_logprobs") or [],
            text_offset0=len(prompt) if (req.echo and prompt) else 0,
        )
    return web.json_response({
        "id": cid, "object": "text_completion", "created": now(), "model": req.model,
        "choices": [{
            "index": 0,
            "text": text,
            "finish_reason": mi.get("finish_reason"),
            "logprobs": lp_obj,
        }],
        "usage": _usage(mi, ae),
    })


async def v1_chat_completions(request: web.Request) -> web.StreamResponse:
    ae: AsyncEngine = request.app["engine"]
    try:
        req = ChatCompletionRequest(**(await _json_body(request)))
    except Exception as e:
        return web.json_response({"error": {"message": str(e)}}, status=400)

    from semi_pd_tpu.utils.chat_template import apply_chat_template

    try:
        input_ids = apply_chat_template(
            ae.engine.tokenizer, [m.model_dump() for m in req.messages],
            chat_template=ae.engine.server_args.chat_template,
        )
    except Exception as e:
        return web.json_response({"error": {"message": f"chat template: {e}"}}, status=400)

    cid = chat_id()
    sp = req.to_sampling_dict()

    # Reference adapter: --reasoning-parser splits <think> chain-of-thought
    # into message.reasoning_content (srt/reasoning_parser.py:121).
    reasoning_kind = ae.engine.server_args.reasoning_parser

    if req.stream:
        resp = web.StreamResponse(
            headers={"Content-Type": "text/event-stream", "Cache-Control": "no-cache"}
        )
        await resp.prepare(request)
        first = True
        sent = 0
        rparser = None
        if reasoning_kind:
            from semi_pd_tpu.utils.reasoning_parser import ReasoningParser

            rparser = ReasoningParser(reasoning_kind)
        tdet = None
        if req.tools:
            # Streaming tool-call holdback (reference FunctionCallParser
            # parse_stream_chunk): markup must not leak into content deltas;
            # finish_reason becomes "tool_calls" in a final chunk.
            from semi_pd_tpu.utils.function_call import (
                StreamingToolCallDetector,
            )

            tdet = StreamingToolCallDetector(
                ae.engine.server_args.tool_call_parser)
        fin_reason = None
        async for item in ae.generate(
            input_ids=input_ids, sampling_params=sp, stream=True
        ):
            if "error" in item:
                break
            if item["finished"]:
                fin_reason = item["meta_info"].get("finish_reason")
            delta: Dict[str, Any] = {}
            if first:
                delta["role"] = "assistant"
                first = False
            text = item["text"][sent:]
            sent = len(item["text"])
            if text and rparser is not None:
                r_delta, c_delta = rparser.parse_stream(text)
                if r_delta:
                    delta["reasoning_content"] = r_delta
                if c_delta:
                    delta["content"] = c_delta
            elif text:
                delta["content"] = text
            if tdet is not None and "content" in delta:
                c = tdet.feed(delta.pop("content"))
                if c:
                    delta["content"] = c
            chunk = {
                "id": cid, "object": "chat.completion.chunk", "created": now(),
                "model": req.model,
                "choices": [{
                    "index": 0, "delta": delta,
                    "finish_reason": (fin_reason if item["finished"]
                                      and tdet is None else None),
                }],
            }
            await resp.write(f"data: {json.dumps(chunk)}\n\n".encode())
        if rparser is not None:
            # Drain the partial-tag holdback: text ending in "<", "<t", ...
            # was withheld as a possible tag prefix and must still stream.
            r_tail, c_tail = rparser.flush()
            if tdet is not None and c_tail:
                c_tail = tdet.feed(c_tail)
            if r_tail or c_tail:
                tail_delta: Dict[str, Any] = {}
                if r_tail:
                    tail_delta["reasoning_content"] = r_tail
                if c_tail:
                    tail_delta["content"] = c_tail
                chunk = {
                    "id": cid, "object": "chat.completion.chunk",
                    "created": now(), "model": req.model,
                    "choices": [{"index": 0, "delta": tail_delta,
                                 "finish_reason": None}],
                }
                await resp.write(f"data: {json.dumps(chunk)}\n\n".encode())
        if tdet is not None:
            residual, calls = tdet.finish()
            tail_delta = {}
            if calls:
                tail_delta["tool_calls"] = [
                    {**c, "index": i} for i, c in enumerate(calls)
                ]
                if residual:
                    tail_delta["content"] = residual
                fin_reason = "tool_calls"
            elif residual:
                tail_delta["content"] = residual
            chunk = {
                "id": cid, "object": "chat.completion.chunk",
                "created": now(), "model": req.model,
                "choices": [{"index": 0, "delta": tail_delta,
                             "finish_reason": fin_reason}],
            }
            await resp.write(f"data: {json.dumps(chunk)}\n\n".encode())
        await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp

    try:
        out = await ae.generate_full(
            input_ids=input_ids, sampling_params=sp,
            return_logprob=bool(req.logprobs),
            top_logprobs_num=int(req.top_logprobs or 0) if req.logprobs else 0,
        )
    except (ValueError, AssertionError) as e:
        return web.json_response({"error": {"message": str(e)}}, status=400)
    if out is None or "error" in out:
        return web.json_response({"error": {"message": (out or {}).get("error", "unknown")}}, status=500)
    mi = out["meta_info"]

    text = out["text"]
    message: Dict[str, Any] = {"role": "assistant", "content": text}
    if reasoning_kind:
        from semi_pd_tpu.utils.reasoning_parser import ReasoningParser

        reasoning, text = ReasoningParser(reasoning_kind).parse(text)
        message = {"role": "assistant", "content": text}
        if reasoning:
            message["reasoning_content"] = reasoning
    finish_reason = mi.get("finish_reason")
    if req.tools:
        from semi_pd_tpu.utils.function_call import parse_tool_calls

        content, calls = parse_tool_calls(
            text, ae.engine.server_args.tool_call_parser
        )
        if calls:
            message["content"] = content or None
            message["tool_calls"] = calls
            finish_reason = "tool_calls"

    choice: Dict[str, Any] = {
        "index": 0,
        "message": message,
        "finish_reason": finish_reason,
    }
    if req.logprobs:
        choice["logprobs"] = _chat_logprobs(
            ae.engine.tokenizer, out["output_ids"],
            mi.get("output_logprobs") or [],
            mi.get("output_top_logprobs") or [],
        )
    return web.json_response({
        "id": cid, "object": "chat.completion", "created": now(), "model": req.model,
        "choices": [choice],
        "usage": _usage(mi, ae),
    })
