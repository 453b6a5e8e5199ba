"""Reference flag-surface parity: allow_auto_truncate, tokenizer_mode /
load_format validation, json_model_override_args, constrained JSON
whitespace pattern, enable_cache_report usage shape, and the speculative
acceptance-threshold relaxations (reference server_args.py:133-134,
tokenizer_manager auto-truncate, adapter cache report)."""

import json
import os

import numpy as np
import pytest

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.config.server_args import ServerArgs
from semi_pd_tpu.runtime.engine import Engine
from semi_pd_tpu.runtime.req import FinishReason
from semi_pd_tpu.sampling.sampling_params import SamplingParams


def _mc(ctx=64):
    from transformers import LlamaConfig

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=ctx, tie_word_embeddings=False,
    )
    cfg.architectures = ["LlamaForCausalLM"]
    return ModelConfig.from_hf_config(cfg, dtype="float32")


def _engine(**kw):
    return Engine(server_args=ServerArgs(
        model_path="", random_weights=True, page_size=4,
        max_total_tokens=512, dtype="float32", **kw), model_config=_mc())


def test_over_length_aborts_without_flag():
    eng = _engine()
    sp = SamplingParams(max_new_tokens=4, temperature=0.0, ignore_eos=True)
    prompt = np.random.default_rng(0).integers(0, 128, size=200).tolist()
    out = eng.generate(input_ids=prompt, sampling_params=sp)
    assert out["meta_info"]["finish_reason"] == FinishReason.ABORT.value
    assert out["output_ids"] == []


def test_allow_auto_truncate_generates_from_tail():
    eng = _engine(allow_auto_truncate=True)
    sp = SamplingParams(max_new_tokens=4, temperature=0.0, ignore_eos=True)
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, 128, size=200).tolist()
    out = eng.generate(input_ids=prompt, sampling_params=sp)
    assert len(out["output_ids"]) == 4
    # truncation kept the TAIL: same output as prompting with the tail only
    keep = eng.runner.max_context_len - 1
    want = eng.generate(input_ids=prompt[-keep:], sampling_params=sp)
    assert out["output_ids"] == want["output_ids"]
    eng.scheduler.check_memory()


def test_flag_validation():
    with pytest.raises(ValueError, match="tokenizer_mode"):
        ServerArgs(model_path="", tokenizer_mode="fast")
    with pytest.raises(ValueError, match="load_format"):
        ServerArgs(model_path="", load_format="npz")
    with pytest.raises(ValueError, match="threshold_acc"):
        ServerArgs(model_path="", speculative_accept_threshold_acc=0.0)


def test_load_format_pins_family(tmp_path):
    from semi_pd_tpu.model_loader.loader import iterate_hf_weights

    import torch

    torch.save({"x": torch.zeros(2)}, tmp_path / "model.bin")
    # auto falls through to *.bin
    assert [n for n, _ in iterate_hf_weights(str(tmp_path))] == ["x"]
    # pinned safetensors refuses to fall back
    with pytest.raises(FileNotFoundError):
        list(iterate_hf_weights(str(tmp_path), load_format="safetensors"))
    with pytest.raises(FileNotFoundError):
        list(iterate_hf_weights(str(tmp_path), load_format="gguf"))


def test_json_model_override_args(tmp_path):
    cfg = {
        "architectures": ["LlamaForCausalLM"], "vocab_size": 128,
        "hidden_size": 64, "intermediate_size": 96, "num_hidden_layers": 2,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "max_position_embeddings": 64, "rope_theta": 10000.0,
        "model_type": "llama",
    }
    (tmp_path / "config.json").write_text(json.dumps(cfg))
    mc = ModelConfig.from_model_path(
        str(tmp_path), dtype="float32",
        json_override_args='{"rope_theta": 123456.0, "max_position_embeddings": 32}',
    )
    assert mc.rope_theta == 123456.0
    assert mc.max_position_embeddings == 32


def test_json_whitespace_pattern():
    from semi_pd_tpu.constrained import json_schema
    from semi_pd_tpu.constrained.json_schema import schema_to_regex

    schema = {"type": "object", "properties": {"a": {"type": "integer"}},
              "required": ["a"]}
    default = schema_to_regex(schema)
    tight = schema_to_regex(schema, whitespace_pattern="")
    assert default != tight
    import re

    assert re.fullmatch(tight, '{"a":7}')
    assert not re.fullmatch(tight, '{ "a": 7 }')
    # module constant restored after the override
    assert json_schema.WS == r"[ \n\t]{0,4}"
    assert re.fullmatch(schema_to_regex(schema), '{ "a": 7 }')


def test_usage_cache_report():
    from types import SimpleNamespace

    from semi_pd_tpu.entrypoints.http_server import _usage

    mi = {"prompt_tokens": 10, "completion_tokens": 3, "cached_tokens": 8}
    off = SimpleNamespace(engine=SimpleNamespace(
        server_args=ServerArgs(model_path="", enable_cache_report=False)))
    on = SimpleNamespace(engine=SimpleNamespace(
        server_args=ServerArgs(model_path="", enable_cache_report=True)))
    assert "prompt_tokens_details" not in _usage(mi, off)
    assert _usage(mi, on)["prompt_tokens_details"]["cached_tokens"] == 8
    assert _usage(mi, on)["total_tokens"] == 13


def test_accept_threshold_relaxation():
    """threshold_acc -> 0 accepts every valid draft for sampled requests;
    defaults keep exact rejection sampling (some drafts rejected here)."""
    import jax
    import jax.numpy as jnp

    from semi_pd_tpu.ops.sampling import SamplingArrays
    from semi_pd_tpu.runtime.speculative import verify_and_accept

    B, g, V = 4, 3, 16
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(B * (g + 1), V)).astype(np.float32))
    drafts = jnp.asarray(rng.integers(0, V, size=(B, g)).astype(np.int32))
    draft_lens = jnp.full((B,), g, jnp.int32)
    sa = SamplingArrays(
        temperature=jnp.ones(B), top_k=jnp.zeros(B, jnp.int32),
        top_p=jnp.ones(B), min_p=jnp.zeros(B),
        presence_penalty=jnp.zeros(B), frequency_penalty=jnp.zeros(B),
        repetition_penalty=jnp.ones(B),
    )
    key = jax.random.PRNGKey(0)
    exact_len, _ = verify_and_accept(logits, drafts, draft_lens, sa, key, g)
    relaxed_len, _ = verify_and_accept(
        logits, drafts, draft_lens, sa, key, g, threshold_acc=1e-9)
    assert int(jnp.sum(relaxed_len)) == B * g  # everything accepted
    assert int(jnp.sum(exact_len)) < B * g  # random drafts mostly rejected
    # threshold_single: outright accept when p exceeds it; with a tiny
    # threshold every draft's probability clears it
    single_len, _ = verify_and_accept(
        logits, drafts, draft_lens, sa, key, g, threshold_single=1e-9)
    assert int(jnp.sum(single_len)) == B * g


def test_skip_tokenizer_init():
    eng = Engine(server_args=ServerArgs(
        model_path="", tokenizer_path="/nonexistent-tokenizer-dir",
        skip_tokenizer_init=True, random_weights=True, page_size=4,
        max_total_tokens=512, dtype="float32"), model_config=_mc())
    assert eng.tokenizer is None
    sp = SamplingParams(max_new_tokens=2, temperature=0.0, ignore_eos=True)
    out = eng.generate(input_ids=[1, 2, 3], sampling_params=sp)
    assert len(out["output_ids"]) == 2


def test_is_embedding_rejects_generation():
    """--is-embedding serves pooling only (reference server_args is_embedding
    + engine embedding mode): generate raises, encode works."""
    eng = _engine(is_embedding=True)
    sp = SamplingParams(max_new_tokens=4, temperature=0.0, ignore_eos=True)
    with pytest.raises(ValueError, match="embedding mode"):
        eng.generate(input_ids=[1, 2, 3], sampling_params=sp)
    # make_request is the gate shared with AsyncEngine/HTTP generation
    # (ADVICE r2: async path bypassed the sync-only check)
    with pytest.raises(ValueError, match="embedding mode"):
        eng.make_request(input_ids=[1, 2, 3], sampling_params=sp)
    # --is-embedding propagates into ModelConfig so pooling takes effect
    # (reference tokenizer_manager.py:176)
    assert eng.runner.model_config.is_embedding
    vecs = eng.encode(input_ids=[1, 2, 3, 4])
    assert len(vecs) == 64  # hidden_size vector
    eng.scheduler.check_memory()


def test_num_continuous_decode_steps_alias():
    """--num-continuous-decode-steps maps onto the in-flight ring depth
    (reference: N decode iterations per scheduler loop)."""
    eng = _engine(num_continuous_decode_steps=2)
    assert eng.server_args.overlap_depth == 2
    assert eng.scheduler.overlap_depth == 2
    sp = SamplingParams(max_new_tokens=6, temperature=0.0, ignore_eos=True)
    out = eng.generate(input_ids=[5, 6, 7], sampling_params=sp)
    assert len(out["output_ids"]) == 6
    eng.scheduler.check_memory()


@pytest.mark.parametrize("mixed", [False, True])
def test_enable_mixed_chunk_interleaves_decode(mixed):
    """--enable-mixed-chunk: colocated ticks run decode alongside each
    prefill chunk (reference ForwardMode.MIXED / mix_with_running), so a
    running stream keeps producing while a long prompt prefills; without
    the flag the reference event_loop_normal stalls decode for the whole
    prefill."""
    eng = _engine(
        chunked_prefill_size=8, enable_mixed_chunk=mixed,
        disable_radix_cache=True, context_length=512,
    )
    s = eng.scheduler
    sp = SamplingParams(max_new_tokens=40, temperature=0.0, ignore_eos=True)
    short = eng.make_request(input_ids=[1, 2, 3, 4], sampling_params=sp)
    s.add_request(short)
    # let the short request finish prefill and start decoding
    while len(short.output_ids) < 3:
        s.tick()
    rng = np.random.default_rng(9)
    long_req = eng.make_request(
        input_ids=rng.integers(0, 128, size=120).tolist(),
        sampling_params=SamplingParams(
            max_new_tokens=2, temperature=0.0, ignore_eos=True),
    )
    s.add_request(long_req)
    produced_during_prefill = 0
    while long_req.prefilled_len < long_req.prompt_len:
        for req, tok in s.tick():
            if req is short and tok >= 0:
                produced_during_prefill += 1
    if mixed:
        assert produced_during_prefill >= 5, "decode must flow through prefill"
    else:
        # event_loop_normal semantics: at most the in-flight ring drains
        assert produced_during_prefill <= s.overlap_depth + 1
    # drive everything to completion; memory must balance
    while s.has_work():
        s.tick()
    assert len(short.output_ids) == 40
    eng.scheduler.check_memory()


def test_reference_flag_aliases_and_attention_backend():
    """Reference long-form flag names work as aliases (drop-in launch
    commands: --tensor-parallel-size, --random-seed, --device, ...), and
    --attention-backend forces a backend (reference server_args.py)."""
    import argparse

    p = argparse.ArgumentParser()
    ServerArgs.add_cli_args(p)
    a = ServerArgs.from_cli_args(p.parse_args([
        "--model-path", "x", "--tensor-parallel-size", "4",
        "--data-parallel-size", "2", "--random-seed", "7",
        "--device", "cpu", "--random-weights",
        "--attention-backend", "reference",
    ]))
    assert (a.tp_size, a.dp_size, a.seed, a.device_platform) == (4, 2, 7, "cpu")
    assert a.attention_backend == "reference"

    eng = _engine(attention_backend="reference")
    from semi_pd_tpu.layers import attention as attn_mod

    sp = SamplingParams(max_new_tokens=2, temperature=0.0, ignore_eos=True)
    out = eng.generate(input_ids=[3, 4, 5], sampling_params=sp)
    assert len(out["output_ids"]) == 2
    eng.scheduler.check_memory()


def test_debug_tensor_dump_and_warmup_registry(tmp_path):
    dump = str(tmp_path / "dump")
    eng = _engine(debug_tensor_dump_output_folder=dump,
                  skip_tokenizer_init=True)
    eng.generate(input_ids=[[1, 2, 3]], sampling_params=SamplingParams(
        max_new_tokens=3, temperature=0.0, ignore_eos=True))
    import glob

    files = sorted(glob.glob(os.path.join(dump, "*.npz")))
    assert files, "no step dumps written"
    z = np.load(files[0])
    assert {"input_ids", "tokens", "rids"} <= set(z.files)

    from semi_pd_tpu.utils.warmup import _warmup_registry, execute_warmups, warmup

    ran = []

    @warmup("test_only")
    def _w(engine):
        ran.append(engine)

    try:
        execute_warmups(["test_only", "missing_name_is_logged"], eng)
    finally:
        _warmup_registry.pop("test_only", None)
    assert ran == [eng]


def test_delete_ckpt_after_loading(tmp_path):
    import torch
    from transformers import LlamaConfig as HFC, LlamaForCausalLM as HFL

    cfg = HFC(vocab_size=128, hidden_size=64, intermediate_size=96,
              num_hidden_layers=2, num_attention_heads=4,
              num_key_value_heads=2, max_position_embeddings=64,
              tie_word_embeddings=False)
    torch.manual_seed(0)
    HFL(cfg).save_pretrained(str(tmp_path), safe_serialization=True)
    eng = Engine(server_args=ServerArgs(
        model_path=str(tmp_path), dtype="float32", page_size=4,
        max_total_tokens=512, delete_ckpt_after_loading=True,
        skip_tokenizer_init=True))
    import glob

    assert not glob.glob(os.path.join(str(tmp_path), "*.safetensors"))
    assert os.path.exists(os.path.join(str(tmp_path), "config.json"))
    out = eng.generate(input_ids=[[1, 2, 3]], sampling_params=SamplingParams(
        max_new_tokens=2, temperature=0.0, ignore_eos=True))
    assert len(out[0]["output_ids"]) == 2


def test_stream_output_incremental_ids():
    """--stream-output: streamed chunks carry only NEW token ids (reference
    tokenizer_manager.py:952 last_output_offset slicing)."""
    import asyncio

    from semi_pd_tpu.entrypoints.async_engine import AsyncEngine

    eng = _engine(stream_output=True, skip_tokenizer_init=True)
    sp = SamplingParams(max_new_tokens=6, temperature=0.0, ignore_eos=True)

    async def run():
        ae = AsyncEngine(eng)
        ae.start(asyncio.get_running_loop())
        try:
            chunks = []
            async for item in ae.generate(input_ids=[1, 2, 3],
                                          sampling_params=sp, stream=True):
                chunks.append(item["output_ids"])
            return chunks
        finally:
            ae.shutdown()

    chunks = asyncio.run(run())
    flat = [t for c in chunks for t in c]
    assert len(flat) == 6  # no token id repeats across chunks
    assert len(chunks) >= 2  # actually streamed in pieces
    # cumulative mode for comparison
    eng2 = _engine(skip_tokenizer_init=True)

    async def run2():
        ae = AsyncEngine(eng2)
        ae.start(asyncio.get_running_loop())
        try:
            last = None
            async for item in ae.generate(input_ids=[1, 2, 3],
                                          sampling_params=sp, stream=True):
                last = item["output_ids"]
            return last
        finally:
            ae.shutdown()

    assert asyncio.run(run2()) == flat


def test_memory_saver_release_resume():
    """--enable-memory-saver: /release_memory_occupation frees the KV pool's
    device buffers and resume reallocates them; generation works after a
    release/resume cycle (reference torch_memory_saver + scheduler.py:1633)."""
    eng = _engine(enable_memory_saver=True, skip_tokenizer_init=True)
    sp = SamplingParams(max_new_tokens=4, temperature=0.0, ignore_eos=True)
    before = eng.generate(input_ids=[[1, 2, 3]], sampling_params=sp)
    assert eng.release_memory_occupation()
    assert not eng.runner.kv_cache.buffers  # buffers actually dropped
    assert eng.resume_memory_occupation()
    after = eng.generate(input_ids=[[1, 2, 3]], sampling_params=sp)
    assert before[0]["output_ids"] == after[0]["output_ids"]
    eng.scheduler.check_memory()

    # VerlEngine wrapper guards rollout while released
    from semi_pd_tpu.entrypoints.verl_engine import VerlEngine

    ve = VerlEngine.__new__(VerlEngine)
    ve._engine = eng
    ve._released = False
    ve.release_memory_occupation()
    with pytest.raises(AssertionError):
        ve.generate(input_ids=[1, 2, 3], sampling_params=sp)
    ve.resume_memory_occupation()
    out = ve.generate(input_ids=[1, 2, 3], sampling_params=sp)
    assert out["output_ids"] == before[0]["output_ids"]


def test_debug_replay_tool(tmp_path):
    """utils/debug_replay re-scores a dumped extend step and the dumped
    sampled-token logprobs agree (reference --debug-tensor-dump-input-file
    replay role)."""
    import glob

    from semi_pd_tpu.utils.debug_replay import replay

    dump = str(tmp_path / "dump")
    eng = _engine(debug_tensor_dump_output_folder=dump,
                  skip_tokenizer_init=True)
    eng.generate(input_ids=[[5, 6, 7, 8]], sampling_params=SamplingParams(
        max_new_tokens=2, temperature=0.0, ignore_eos=True))
    f = sorted(glob.glob(dump + "/*extend*.npz"))[0]
    out = replay(eng, f)
    assert out["n"] == 1 and out["logprob_agree"] == 1
    with pytest.raises(ValueError, match="decode dumps"):
        replay(eng, sorted(glob.glob(dump + "/*decode*.npz"))[0])


def test_dump_requests(tmp_path):
    """dump_requests_folder/threshold: finished requests append as JSONL
    (reference tokenizer_manager.py:1104 dump_requests)."""
    import glob
    import json as _json

    folder = str(tmp_path / "reqs")
    eng = _engine(skip_tokenizer_init=True, dump_requests_folder=folder,
                  dump_requests_threshold=2)
    sp = SamplingParams(max_new_tokens=2, temperature=0.0, ignore_eos=True)
    eng.generate(input_ids=[[1, 2, 3]], sampling_params=sp)
    assert not glob.glob(folder + "/*.jsonl")  # below threshold: buffered
    eng.generate(input_ids=[[4, 5]], sampling_params=sp)
    files = glob.glob(folder + "/*.jsonl")
    assert files
    rows = [_json.loads(l) for l in open(files[0])]
    assert len(rows) == 2
    assert rows[0]["input_ids"] == [1, 2, 3] and len(rows[0]["output_ids"]) == 2
    assert rows[0]["finish_reason"] == "length"
