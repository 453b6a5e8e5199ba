"""OpenAI files + batches API (reference srt/openai_api/adapter.py:175-476:
v1_files_create/v1_delete_file/v1_retrieve_file/v1_retrieve_file_content,
v1_batches/process_batch/v1_retrieve_batch/v1_cancel_batch).

Files are stored as JSONL on disk under ``--file-storage-path``; batches run
each line's /v1/completions or /v1/chat/completions body through the
AsyncEngine concurrently (the in-process scheduler gives continuous batching
for free — the reference instead builds one adapted mega-request), then write
an output JSONL and flip the batch record to ``completed``.
"""

from __future__ import annotations

import asyncio
import json
import logging
import os
import time
import uuid
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

from aiohttp import web

logger = logging.getLogger(__name__)


@dataclass
class FileRecord:
    id: str
    path: str
    filename: str
    purpose: str
    bytes: int
    created_at: int

    def to_json(self) -> Dict[str, Any]:
        return {
            "id": self.id, "object": "file", "bytes": self.bytes,
            "created_at": self.created_at, "filename": self.filename,
            "purpose": self.purpose,
        }


@dataclass
class BatchRecord:
    id: str
    endpoint: str
    input_file_id: str
    completion_window: str
    created_at: int
    metadata: Optional[Dict[str, Any]] = None
    status: str = "validating"
    output_file_id: Optional[str] = None
    error_file_id: Optional[str] = None
    in_progress_at: Optional[int] = None
    completed_at: Optional[int] = None
    failed_at: Optional[int] = None
    cancelled_at: Optional[int] = None
    errors: Optional[Dict[str, Any]] = None
    request_counts: Dict[str, int] = field(
        default_factory=lambda: {"total": 0, "completed": 0, "failed": 0}
    )

    def to_json(self) -> Dict[str, Any]:
        return {
            "id": self.id, "object": "batch", "endpoint": self.endpoint,
            "input_file_id": self.input_file_id,
            "completion_window": self.completion_window,
            "created_at": self.created_at, "metadata": self.metadata,
            "status": self.status, "output_file_id": self.output_file_id,
            "error_file_id": self.error_file_id,
            "in_progress_at": self.in_progress_at,
            "completed_at": self.completed_at, "failed_at": self.failed_at,
            "cancelled_at": self.cancelled_at, "errors": self.errors,
            "request_counts": self.request_counts,
        }


class FileStore:
    """In-memory registry + on-disk JSONL storage for files and batches."""

    def __init__(self, storage_dir: str):
        self.storage_dir = storage_dir
        self.files: Dict[str, FileRecord] = {}
        self.batches: Dict[str, BatchRecord] = {}
        self._cancelled: set = set()

    def save_file(self, content: bytes, filename: str, purpose: str) -> FileRecord:
        os.makedirs(self.storage_dir, exist_ok=True)
        file_id = f"backend_input_file-{uuid.uuid4()}"
        path = os.path.join(self.storage_dir, f"{file_id}.jsonl")
        with open(path, "wb") as f:
            f.write(content)
        rec = FileRecord(
            id=file_id, path=path, filename=filename, purpose=purpose,
            bytes=len(content), created_at=int(time.time()),
        )
        self.files[file_id] = rec
        return rec

    def save_result_file(self, lines: List[dict], purpose: str) -> FileRecord:
        os.makedirs(self.storage_dir, exist_ok=True)
        file_id = f"backend_result_file-{uuid.uuid4()}"
        path = os.path.join(self.storage_dir, f"{file_id}.jsonl")
        with open(path, "w", encoding="utf-8") as f:
            for line in lines:
                f.write(json.dumps(line) + "\n")
        rec = FileRecord(
            id=file_id, path=path, filename=f"{file_id}.jsonl", purpose=purpose,
            bytes=os.path.getsize(path), created_at=int(time.time()),
        )
        self.files[file_id] = rec
        return rec


def _store(request: web.Request) -> FileStore:
    return request.app["file_store"]


# ------------------------------------------------------------------- files
async def v1_files_create(request: web.Request) -> web.Response:
    store = _store(request)
    filename, purpose, content = "file.jsonl", "batch", b""
    if request.content_type.startswith("multipart/"):
        async for part in await request.multipart():
            if part.name == "file":
                filename = part.filename or filename
                content = await part.read(decode=False)
            elif part.name == "purpose":
                purpose = (await part.text()).strip()
    else:
        # Raw-body convenience path (curl -d @reqs.jsonl)
        content = await request.read()
        purpose = request.query.get("purpose", purpose)
    if not content:
        return web.json_response(
            {"error": {"message": "empty file upload"}}, status=400
        )
    rec = store.save_file(content, filename, purpose)
    return web.json_response(rec.to_json())


async def v1_retrieve_file(request: web.Request) -> web.Response:
    rec = _store(request).files.get(request.match_info["file_id"])
    if rec is None:
        return web.json_response({"error": {"message": "File not found"}}, status=404)
    return web.json_response(rec.to_json())


async def v1_retrieve_file_content(request: web.Request) -> web.Response:
    rec = _store(request).files.get(request.match_info["file_id"])
    if rec is None or not os.path.exists(rec.path):
        return web.json_response({"error": {"message": "File not found"}}, status=404)
    with open(rec.path, "rb") as f:
        body = f.read()
    return web.Response(body=body, content_type="application/octet-stream")


async def v1_delete_file(request: web.Request) -> web.Response:
    store = _store(request)
    file_id = request.match_info["file_id"]
    rec = store.files.pop(file_id, None)
    if rec is None:
        return web.json_response({"error": {"message": "File not found"}}, status=404)
    try:
        os.remove(rec.path)
    except OSError:
        pass
    return web.json_response({"id": file_id, "object": "file", "deleted": True})


# ------------------------------------------------------------------ batches
async def v1_batches(request: web.Request) -> web.Response:
    store = _store(request)
    try:
        body = await request.json()
        endpoint = body["endpoint"]
        input_file_id = body["input_file_id"]
    except Exception as e:  # noqa: BLE001
        return web.json_response(
            {"error": {"message": f"invalid batch request: {e}"}}, status=400
        )
    if endpoint not in ("/v1/completions", "/v1/chat/completions"):
        return web.json_response(
            {"error": {"message": f"unsupported endpoint {endpoint}"}}, status=400
        )
    if input_file_id not in store.files:
        return web.json_response(
            {"error": {"message": "Input file not found"}}, status=404
        )
    rec = BatchRecord(
        id=f"batch_{uuid.uuid4()}", endpoint=endpoint,
        input_file_id=input_file_id,
        completion_window=body.get("completion_window", "24h"),
        created_at=int(time.time()), metadata=body.get("metadata"),
    )
    store.batches[rec.id] = rec
    asyncio.create_task(_process_batch(request.app, rec.id))
    return web.json_response(rec.to_json())


async def v1_retrieve_batch(request: web.Request) -> web.Response:
    rec = _store(request).batches.get(request.match_info["batch_id"])
    if rec is None:
        return web.json_response({"error": {"message": "Batch not found"}}, status=404)
    return web.json_response(rec.to_json())


async def v1_cancel_batch(request: web.Request) -> web.Response:
    store = _store(request)
    batch_id = request.match_info["batch_id"]
    rec = store.batches.get(batch_id)
    if rec is None:
        return web.json_response({"error": {"message": "Batch not found"}}, status=404)
    if rec.status not in ("validating", "in_progress"):
        return web.json_response(
            {"error": {"message": f"Current status is {rec.status}, no need to cancel"}},
            status=400,
        )
    rec.status = "cancelling"
    store._cancelled.add(batch_id)
    ae = request.app["engine"]
    n = store.batches[batch_id].request_counts.get("total", 0) or 4096
    for i in range(n):
        ae.abort(f"{batch_id}-req_{i}")
    rec.status = "cancelled"
    rec.cancelled_at = int(time.time())
    return web.json_response(rec.to_json())


async def _run_one(ae, endpoint: str, line: dict, rid: str):
    """Translate one batch line into an engine call; returns an OpenAI-shaped
    response body (the non-streaming subset of v1_completions /
    v1_chat_completions in http_server.py)."""
    from semi_pd_tpu.entrypoints.protocol import (
        ChatCompletionRequest,
        CompletionRequest,
        chat_id,
        completion_id,
        now,
    )

    body = line.get("body") or {}
    if body.get("stream"):
        raise ValueError("Streaming requests are not supported in batch mode")
    if endpoint == "/v1/chat/completions":
        req = ChatCompletionRequest(**body)
        from semi_pd_tpu.utils.chat_template import apply_chat_template

        input_ids = apply_chat_template(
            ae.engine.tokenizer, [m.model_dump() for m in req.messages],
            chat_template=ae.engine.server_args.chat_template,
        )
        out = await ae.generate_full(
            input_ids=input_ids, sampling_params=req.to_sampling_dict(), rid=rid
        )
        if out is None or "error" in out:
            raise RuntimeError(str((out or {}).get("error", "aborted")))
        mi = out["meta_info"]
        return {
            "id": chat_id(), "object": "chat.completion", "created": now(),
            "model": req.model,
            "choices": [{
                "index": 0,
                "message": {"role": "assistant", "content": out["text"]},
                "finish_reason": mi.get("finish_reason"),
            }],
            "usage": {
                "prompt_tokens": mi["prompt_tokens"],
                "completion_tokens": mi["completion_tokens"],
                "total_tokens": mi["prompt_tokens"] + mi["completion_tokens"],
            },
        }
    req = CompletionRequest(**body)
    prompt, input_ids = None, None
    if isinstance(req.prompt, str):
        prompt = req.prompt
    elif req.prompt and isinstance(req.prompt[0], int):
        input_ids = req.prompt
    elif req.prompt:
        prompt = req.prompt[0]
    out = await ae.generate_full(
        prompt=prompt, input_ids=input_ids,
        sampling_params=req.to_sampling_dict(), rid=rid,
    )
    if out is None or "error" in out:
        raise RuntimeError(str((out or {}).get("error", "aborted")))
    mi = out["meta_info"]
    return {
        "id": completion_id(), "object": "text_completion", "created": now(),
        "model": req.model,
        "choices": [{
            "index": 0, "text": out["text"],
            "finish_reason": mi.get("finish_reason"), "logprobs": None,
        }],
        "usage": {
            "prompt_tokens": mi["prompt_tokens"],
            "completion_tokens": mi["completion_tokens"],
            "total_tokens": mi["prompt_tokens"] + mi["completion_tokens"],
        },
    }


async def _process_batch(app: web.Application, batch_id: str) -> None:
    store: FileStore = app["file_store"]
    ae = app["engine"]
    rec = store.batches[batch_id]
    try:
        rec.status = "in_progress"
        rec.in_progress_at = int(time.time())
        input_rec = store.files.get(rec.input_file_id)
        if input_rec is None:
            raise ValueError("Input file not found")
        with open(input_rec.path, "r", encoding="utf-8") as f:
            lines = [json.loads(l) for l in f if l.strip()]
        rec.request_counts["total"] = len(lines)

        async def one(i: int, line: dict) -> dict:
            rid = f"{batch_id}-req_{i}"
            try:
                resp = await _run_one(ae, rec.endpoint, line, rid)
                return {"id": f"batch_req_{uuid.uuid4()}",
                        "custom_id": line.get("custom_id"),
                        "response": {"status_code": 200, "body": resp},
                        "error": None}
            except Exception as e:  # noqa: BLE001
                return {"id": f"batch_req_{uuid.uuid4()}",
                        "custom_id": line.get("custom_id"),
                        "response": None, "error": {"message": str(e)}}

        results = await asyncio.gather(*(one(i, l) for i, l in enumerate(lines)))
        ok = sum(1 for r in results if r["error"] is None)
        rec.request_counts.update(completed=ok, failed=len(results) - ok)
        out_rec = store.save_result_file(results, purpose="batch_result")
        rec.output_file_id = out_rec.id
        if batch_id in store._cancelled:
            rec.status = "cancelled"
            rec.cancelled_at = int(time.time())
        else:
            rec.status = "completed"
            rec.completed_at = int(time.time())
    except Exception as e:  # noqa: BLE001
        logger.exception("batch %s failed", batch_id)
        rec.status = "failed"
        rec.failed_at = int(time.time())
        rec.errors = {"message": str(e)}


def add_routes(app: web.Application, storage_dir: str) -> None:
    app["file_store"] = FileStore(storage_dir)
    app.add_routes([
        web.post("/v1/files", v1_files_create),
        web.get("/v1/files/{file_id}", v1_retrieve_file),
        web.get("/v1/files/{file_id}/content", v1_retrieve_file_content),
        web.delete("/v1/files/{file_id}", v1_delete_file),
        web.post("/v1/batches", v1_batches),
        web.get("/v1/batches/{batch_id}", v1_retrieve_batch),
        web.post("/v1/batches/{batch_id}/cancel", v1_cancel_batch),
    ])
