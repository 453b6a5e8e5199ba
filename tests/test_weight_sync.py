"""Trainer->server distributed weight update (reference
model_runner.py:845 update_weights_from_distributed + init_weights_update_group
and test/srt/test_update_weights_from_distributed.py).

The TCP tensor-stream transport (utils/weight_sync.py) replaces the NCCL
update group; semantics under test: (a) byte-exact tensor roundtrip,
(b) partial update touches ONLY the named tensors, (c) streaming a full
checkpoint tensor-by-tensor converges to exactly the load_params result."""

import threading

import numpy as np
import pytest

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.config.server_args import ServerArgs
from semi_pd_tpu.runtime.engine import Engine
from semi_pd_tpu.sampling.sampling_params import SamplingParams
from semi_pd_tpu.utils.weight_sync import WeightSyncGroup, WeightSyncPublisher


def test_tensor_stream_roundtrip():
    pub = WeightSyncPublisher()
    arrs = {
        "a": np.arange(12, dtype=np.float32).reshape(3, 4),
        "b": np.random.default_rng(0).normal(size=(5,)).astype(np.float16),
    }

    def trainer():
        pub.accept()
        for name, a in arrs.items():
            pub.send_tensor(name, a)

    t = threading.Thread(target=trainer)
    t.start()
    grp = WeightSyncGroup("127.0.0.1", pub.port, "g1", timeout=10)
    got = dict(grp.recv_tensors(
        ["a", "b"], ["float32", "float16"], [[3, 4], [5]]
    ))
    t.join()
    grp.close()
    pub.close()
    for k, a in arrs.items():
        np.testing.assert_array_equal(got[k], a)


@pytest.fixture(scope="module")
def hf_llama():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False,
    )
    cfg.architectures = ["LlamaForCausalLM"]
    torch.manual_seed(0)
    return LlamaForCausalLM(cfg).eval().float(), cfg


def _engine(hf_cfg):
    mc = ModelConfig.from_hf_config(hf_cfg, dtype="float32")
    return Engine(
        server_args=ServerArgs(model_path="", random_weights=True, page_size=4,
                               max_total_tokens=1024, dtype="float32"),
        model_config=mc,
    )


def test_update_weights_from_distributed_full_stream(hf_llama):
    """Streaming every checkpoint tensor through the group transport must
    reproduce the direct load_params engine token-for-token."""
    hf, hf_cfg = hf_llama
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    eng = _engine(hf_cfg)
    from semi_pd_tpu.model_loader.loader import load_params

    want_engine = _engine(hf_cfg)
    want_engine.runner.params = load_params(
        want_engine.runner.model, weights=list(sd.items()))

    pub = WeightSyncPublisher()

    def trainer():
        pub.accept()
        for name, a in sd.items():
            pub.send_tensor(name, a)

    t = threading.Thread(target=trainer)
    t.start()
    assert eng.init_weights_update_group("127.0.0.1", pub.port)
    for name, a in sd.items():
        assert eng.update_weights_from_distributed(
            name, str(a.dtype), list(a.shape))
    t.join()
    pub.close()

    prompts = [list(range(1, 11)), list(range(40, 52))]
    sp = SamplingParams(max_new_tokens=6, temperature=0.0, ignore_eos=True)
    got = [o["output_ids"] for o in eng.generate(input_ids=prompts, sampling_params=sp)]
    want = [o["output_ids"] for o in want_engine.generate(input_ids=prompts, sampling_params=sp)]
    assert got == want


def test_partial_update_leaves_rest_untouched(hf_llama):
    hf, hf_cfg = hf_llama
    eng = _engine(hf_cfg)
    params_before = {
        "embed": np.array(eng.runner.params["embed"]["w"]),
        "lm_head": np.array(eng.runner.params["lm_head"]["w"]),
    }

    new_embed = np.random.default_rng(7).normal(
        size=params_before["embed"].shape).astype(np.float32)
    pub = WeightSyncPublisher()

    def trainer():
        pub.accept()
        pub.send_tensor("model.embed_tokens.weight", new_embed)

    t = threading.Thread(target=trainer)
    t.start()
    eng.init_weights_update_group("127.0.0.1", pub.port)
    eng.update_weights_from_distributed(
        "model.embed_tokens.weight", "float32", list(new_embed.shape))
    t.join()
    pub.close()

    np.testing.assert_allclose(
        np.array(eng.runner.params["embed"]["w"]), new_embed, rtol=1e-6)
    # the untouched head kept its random-init values (a full-reload
    # implementation would have zeroed it)
    np.testing.assert_array_equal(
        np.array(eng.runner.params["lm_head"]["w"]), params_before["lm_head"])


def test_update_without_group_is_an_error(hf_llama):
    _, hf_cfg = hf_llama
    eng = _engine(hf_cfg)
    with pytest.raises(ValueError, match="init_weights_update_group"):
        eng.update_weights_from_distributed("x", "float32", [1])
