"""Double-sparsity attention (reference double_sparsity_backend.py +
DoubleSparseTokenToKVPool memory_pool.py:455-529).

Exactness contract: with heavy_token_num >= sequence length the sparse path
selects every valid token, so generation must match the dense engine
token-for-token; with a tight budget it must still generate (approximation
kicks in) while reading only the label cache + top-k tokens."""

import numpy as np
import pytest

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.config.server_args import ServerArgs
from semi_pd_tpu.runtime.engine import Engine
from semi_pd_tpu.sampling.sampling_params import SamplingParams


def _mc():
    from transformers import LlamaConfig

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False,
    )
    cfg.architectures = ["LlamaForCausalLM"]
    return ModelConfig.from_hf_config(cfg, dtype="float32")


def _engine(**kw):
    return Engine(server_args=ServerArgs(
        model_path="", random_weights=True, page_size=4,
        max_total_tokens=1024, dtype="float32", **kw), model_config=_mc())


SP = SamplingParams(max_new_tokens=8, temperature=0.0, ignore_eos=True)


def test_ds_exact_when_budget_covers_sequence():
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, 128, size=n).tolist() for n in (9, 21, 14)]
    want = [o["output_ids"] for o in _engine().generate(
        input_ids=prompts, sampling_params=SP)]
    eng = _engine(enable_double_sparsity=True, ds_heavy_token_num=256,
                  ds_heavy_channel_num=8)
    got = [o["output_ids"] for o in eng.generate(
        input_ids=prompts, sampling_params=SP)]
    assert got == want
    # the label buffer really exists in the pool
    assert len(eng.runner.kv_cache.arrays) == 2
    assert eng.runner.kv_cache.arrays[1].shape[-1] == 8
    eng.scheduler.check_memory()


def test_ds_tight_budget_generates():
    """Budget far below the sequence: outputs may differ from dense (that is
    the approximation) but decoding stays finite and leak-free. The sparse
    threshold is dropped below the context so the top-k path actually runs."""
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, 128, size=120).tolist()
    eng = _engine(enable_double_sparsity=True, ds_heavy_token_num=16,
                  ds_heavy_channel_num=8, ds_sparse_decode_threshold=8)
    out = eng.generate(input_ids=prompt, sampling_params=SP)
    assert len(out["output_ids"]) == 8
    eng.scheduler.check_memory()


def test_ds_dense_below_threshold():
    """Below ds_sparse_decode_threshold (reference server_args.py:143)
    decode stays dense and exact even with a tight top-k budget."""
    rng = np.random.default_rng(2)
    prompts = [rng.integers(0, 128, size=n).tolist() for n in (60, 33)]
    want = [o["output_ids"] for o in _engine().generate(
        input_ids=prompts, sampling_params=SP)]
    eng = _engine(enable_double_sparsity=True, ds_heavy_token_num=4,
                  ds_heavy_channel_num=8)  # threshold default 4096 >> kv
    got = [o["output_ids"] for o in eng.generate(
        input_ids=prompts, sampling_params=SP)]
    assert got == want
    eng.scheduler.check_memory()


def test_ds_channel_config_loading(tmp_path):
    import json

    from semi_pd_tpu.ops.attention.double_sparsity import load_channel_config

    # default: leading channels
    ch = load_channel_config(None, 2, 2, 4, 16, 4)
    assert ch.shape == (2, 2, 4)
    np.testing.assert_array_equal(ch[0, 0], [0, 1, 2, 3])

    # reference-format file (per q-head rows folded onto kv heads)
    cfg = {
        f"model.layers.{l}.self_attn.k_proj": [
            [h * 10 + j for j in range(16)] for h in range(2)
        ]
        for l in range(2)
    }
    path = tmp_path / "ch.json"
    path.write_text(json.dumps(cfg))
    ch = load_channel_config(str(path), 2, 2, 4, 16, 4)
    assert ch.shape == (2, 2, 4)
    np.testing.assert_array_equal(ch[0, 1], [10, 11, 12, 13])


def test_ds_rejects_mla_and_spec():
    with pytest.raises(ValueError, match="speculative"):
        ServerArgs(model_path="", enable_double_sparsity=True,
                   speculative_algorithm="EAGLE")
