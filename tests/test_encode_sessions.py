"""Embedding extraction + session API tests (reference analogs:
test_embedding_models.py, session control tests)."""

import numpy as np
import pytest

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.config.server_args import ServerArgs
from semi_pd_tpu.runtime.engine import Engine
from semi_pd_tpu.sampling.sampling_params import SamplingParams


@pytest.fixture(scope="module")
def eng():
    cfg = ModelConfig(
        architecture="LlamaForCausalLM", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, max_position_embeddings=256,
        context_length=256, dtype="float32",
    )
    return Engine(
        server_args=ServerArgs(model_path="", random_weights=True,
                               page_size=4, max_total_tokens=1024),
        model_config=cfg,
    )


def test_encode_returns_normalized_embeddings(eng):
    ids = [list(range(10)), list(range(20, 35))]
    embs = eng.encode(input_ids=ids)
    assert len(embs) == 2
    for e in embs:
        assert len(e) == 32
        assert abs(np.linalg.norm(e) - 1.0) < 1e-5
    # deterministic + distinct
    embs2 = eng.encode(input_ids=ids)
    np.testing.assert_allclose(embs, embs2, rtol=1e-6)
    assert np.abs(np.asarray(embs[0]) - np.asarray(embs[1])).max() > 1e-3
    eng.scheduler.check_memory()


def test_sessions_continuation(eng):
    sp = SamplingParams(max_new_tokens=4, temperature=0.0, ignore_eos=True)
    sid = eng.open_session()
    o1 = eng.session_generate(sid, input_ids=list(range(8)), sampling_params=sp)
    o2 = eng.session_generate(sid, input_ids=[50, 51], sampling_params=sp)
    # second turn saw the full first-turn history
    assert o2["meta_info"]["prompt_tokens"] == 8 + 4 + 2
    # and reused cached prefix pages from turn 1
    assert o2["meta_info"]["cached_tokens"] >= 8
    assert eng.close_session(sid)
    assert not eng.close_session(sid)
    with pytest.raises(ValueError):
        eng.session_generate(sid, input_ids=[1], sampling_params=sp)


def test_session_branching(eng):
    """Branch-from-turn (reference session_controller.py SessionReqNode
    tree): two divergent continuations of turn 1 share its prefix pages;
    offset truncates the inherited history; replace drops descendants."""
    sp = SamplingParams(max_new_tokens=4, temperature=0.0, ignore_eos=True)
    sid = eng.open_session()
    o1 = eng.session_generate(sid, input_ids=list(range(8)),
                              sampling_params=sp)
    rid1 = o1["rid"]
    hist1 = 8 + 4

    # two different branches from the SAME turn
    oa = eng.session_generate(sid, input_ids=[40, 41], sampling_params=sp,
                              rid=rid1)
    ob = eng.session_generate(sid, input_ids=[50, 51, 52],
                              sampling_params=sp, rid=rid1)
    assert oa["meta_info"]["prompt_tokens"] == hist1 + 2
    assert ob["meta_info"]["prompt_tokens"] == hist1 + 3
    # branch B reused the shared turn-1 prefix from the radix cache
    assert ob["meta_info"]["cached_tokens"] >= 8

    # offset: branch from turn 1 truncated to its first 6 tokens
    oc = eng.session_generate(sid, input_ids=[60], sampling_params=sp,
                              rid=rid1, offset=6)
    assert oc["meta_info"]["prompt_tokens"] == 6 + 1

    # default parent is the LAST turn (oc)
    od = eng.session_generate(sid, input_ids=[61], sampling_params=sp)
    assert od["meta_info"]["prompt_tokens"] == 6 + 1 + 4 + 1

    # replace: branching again from turn 1 with replace=True drops the
    # other children; branching from a dropped turn then fails
    oe = eng.session_generate(sid, input_ids=[42], sampling_params=sp,
                              rid=rid1, replace=True)
    assert oe["meta_info"]["prompt_tokens"] == hist1 + 1
    with pytest.raises(ValueError):
        eng.session_generate(sid, input_ids=[1], sampling_params=sp,
                             rid=oa["rid"])
    # unknown branch rid
    with pytest.raises(ValueError):
        eng.session_generate(sid, input_ids=[1], sampling_params=sp,
                             rid="nope")
    eng.close_session(sid)
    eng.scheduler.check_memory()


def test_session_http_session_params(eng):
    """session_params rides /generate (reference GenerateReqInput
    session_params) through the async engine."""
    import asyncio

    from semi_pd_tpu.entrypoints.async_engine import AsyncEngine

    async def run():
        ae = AsyncEngine(eng)
        ae.start(asyncio.get_running_loop())
        sid = eng.open_session()
        o1 = await ae.generate_full(
            input_ids=list(range(8)),
            sampling_params={"max_new_tokens": 3, "temperature": 0.0,
                             "ignore_eos": True},
            session_params={"id": sid})
        o2 = await ae.generate_full(
            input_ids=[33],
            sampling_params={"max_new_tokens": 3, "temperature": 0.0,
                             "ignore_eos": True},
            session_params={"id": sid, "rid": o1["rid"], "offset": 5})
        ae.shutdown()
        return o1, o2

    o1, o2 = asyncio.run(run())
    assert o1["meta_info"]["prompt_tokens"] == 8
    assert o2["meta_info"]["prompt_tokens"] == 5 + 1
    eng.scheduler.check_memory()
