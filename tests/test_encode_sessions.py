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
