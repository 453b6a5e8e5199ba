"""Test configuration: force CPU jax with 8 virtual devices so sharding and
multi-chip code paths run without TPU hardware (SURVEY.md §4 — the GPU-free
test tier the reference lacks)."""

import os

# Unconditional: the ambient environment may pin JAX_PLATFORMS to the TPU
# platform; unit tests must run on the host CPU backend (and TPU fp32 matmul
# defaults to bf16 precision, which would break exact-parity tolerances).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("TRANSFORMERS_NO_ADVISORY_WARNINGS", "1")
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

import jax

# The ambient TPU (axon) PJRT plugin can win platform selection even with
# JAX_PLATFORMS=cpu in the environment; the config update is authoritative.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def tiny_llama_config():
    from semi_pd_tpu.config.model_config import ModelConfig

    return ModelConfig(
        architecture="LlamaForCausalLM",
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=512,
        context_length=512,
        rope_theta=10000.0,
        dtype="float32",
    )


# ---------------------------------------------------------------- tiering
# Reference test/srt/run_suite.py:14-80 splits per-commit vs nightly
# suites. Equivalent here: `pytest -m quick` is the per-commit tier
# (<3 min — core serving loop, semi-PD cadence, memory, sampling,
# constrained decoding, kernels-on-CPU); everything else is the full tier.
QUICK_MODULES = {
    "test_mem", "test_radix_native", "test_schedule_policy",
    "test_sampling", "test_hicache", "test_watchdog_dump",
    "test_semi_pd_cadence", "test_adaptive_depth", "test_engine_e2e",
    "test_llama_parity", "test_constrained", "test_structural_tag",
    "test_encode_sessions", "test_topk_logprobs", "test_penalties_e2e",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "quick: per-commit tier (<3 min; run_suite.py analog)")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__.rsplit(".", 1)[-1] in QUICK_MODULES:
            item.add_marker(pytest.mark.quick)
