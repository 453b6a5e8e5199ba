"""Hierarchical (host-tier) KV cache test: evict the device tree, then a
repeat prompt must restore its prefix from host RAM and produce identical
greedy output (reference analog: hiradix cache load/write tests)."""

import numpy as np
import pytest

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.config.server_args import ServerArgs
from semi_pd_tpu.runtime.engine import Engine
from semi_pd_tpu.sampling.sampling_params import SamplingParams


def test_host_tier_restore():
    cfg = ModelConfig(
        architecture="LlamaForCausalLM", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, max_position_embeddings=256,
        context_length=256, dtype="float32",
    )
    eng = Engine(
        server_args=ServerArgs(
            model_path="", random_weights=True, page_size=4,
            max_total_tokens=512, enable_hierarchical_cache=True,
        ),
        model_config=cfg,
    )
    rng = np.random.default_rng(7)
    prompt = rng.integers(0, 64, size=24).tolist()
    sp = SamplingParams(max_new_tokens=6, temperature=0.0, ignore_eos=True)

    o1 = eng.generate(input_ids=prompt, sampling_params=sp)
    assert eng.scheduler.host_cache.n_pages() > 0  # write-through happened

    # Nuke the DEVICE tree: only the host tier still holds the prefix
    eng.scheduler.tree_cache.evict(10**9)
    assert eng.scheduler.tree_cache.total_cached_pages() == 0

    o2 = eng.generate(input_ids=prompt, sampling_params=sp)
    assert o2["meta_info"]["cached_tokens"] > 0, "host tier not used"
    assert o2["output_ids"] == o1["output_ids"]
    eng.flush_cache()
    eng.scheduler.check_memory()
