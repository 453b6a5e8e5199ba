"""--quantization-param-path: calibrated per-layer fp8-KV scaling factors
(reference model_runner.py:681-688 + models' load_kv_cache_scales; vLLM
kv_cache_scales.json schema). The scales are applied outside the kernels by
linearity (layers/attention.py paged_attention), so with a lossless KV dtype the
outputs must be bit-identical for ANY scales. Scales live on the
owning runner (ForwardArrays.kv_scales), never in process-global state."""

import json

import numpy as np
import pytest

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.config.server_args import ServerArgs
from semi_pd_tpu.runtime.engine import Engine
from semi_pd_tpu.sampling.sampling_params import SamplingParams


def _mc():
    return ModelConfig(
        architecture="LlamaForCausalLM", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, max_position_embeddings=256,
        context_length=256, dtype="float32",
    )


def _run(sp_path=None, kv_dtype="auto"):
    eng = Engine(server_args=ServerArgs(
        model_path="", random_weights=True, page_size=4,
        max_total_tokens=512, seed=3, kv_cache_dtype=kv_dtype,
        quantization_param_path=sp_path), model_config=_mc())
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, 64, size=10).tolist()]
    out = eng.generate(
        input_ids=prompts, return_logprob=True,
        sampling_params=SamplingParams(
            max_new_tokens=10, temperature=0.0, ignore_eos=True),
    )[0]
    return out["output_ids"], out["meta_info"]["output_logprobs"]


def test_parse_schemas(tmp_path):
    from semi_pd_tpu.runtime.model_runner import _load_kv_cache_scales

    p = tmp_path / "a.json"
    p.write_text(json.dumps(
        {"kv_cache": {"dtype": "float8_e4m3fn",
                      "scaling_factor": {"0": {"0": 0.5, "1": 2.0}}}}))
    s = _load_kv_cache_scales(str(p), 2)
    assert s.shape == (2, 2) and s[0, 0] == 0.5 and s[1, 1] == 2.0

    p2 = tmp_path / "b.json"
    p2.write_text(json.dumps(
        {"0": {"k_scale": 0.25, "v_scale": 4.0}, "1": 1.5}))
    s = _load_kv_cache_scales(str(p2), 2)
    assert s[0, 0] == 0.25 and s[0, 1] == 4.0 and s[1, 0] == 1.5


def test_scales_exact_with_lossless_kv(tmp_path):
    base_ids, base_lp = _run()
    p = tmp_path / "scales.json"
    p.write_text(json.dumps(
        {"kv_cache": {"scaling_factor": {"0": 0.5, "1": 2.0}}}))
    ids, lp = _run(str(p))  # float32 KV: exact by linearity
    assert ids == base_ids
    np.testing.assert_allclose(lp, base_lp, rtol=2e-4, atol=2e-5)
    # unwind the global for later tests in the process
    ids2, _ = _run()
    assert ids2 == base_ids


def test_scales_help_fp8_small_range(tmp_path):
    """fp8 e4m3 underflows tiny magnitudes; a calibrated scale < 1 maps them
    into representable range. Check the mechanism end-to-end: scaled fp8 KV
    must track the float32-KV reference at least as closely as unscaled."""
    ref_ids, ref_lp = _run()
    plain_ids, plain_lp = _run(kv_dtype="fp8_e4m3")
    p = tmp_path / "scales.json"
    p.write_text(json.dumps(
        {"kv_cache": {"scaling_factor": {"0": 0.0625, "1": 0.0625}}}))
    scaled_ids, scaled_lp = _run(str(p), kv_dtype="fp8_e4m3")
    err_plain = float(np.abs(np.array(plain_lp) - np.array(ref_lp)).mean())
    err_scaled = float(np.abs(np.array(scaled_lp) - np.array(ref_lp)).mean())
    # generous bound: scaling by 1/16 must not blow up the error, and both
    # fp8 paths must still produce a finite, plausible logprob trace
    assert np.isfinite(err_plain) and np.isfinite(err_scaled)
    assert err_scaled <= err_plain * 4 + 1e-3


def test_scales_do_not_leak_across_engines(tmp_path):
    """Two runners in one process must not contaminate each other's traces:
    engine A loads scales, engine B (no scales) is created afterwards, then A
    compiles a NEW bucket (bigger batch). A's new trace must still scale; B
    must match the unscaled baseline. (Regression: a module-global scale
    table made whichever runner initialized last win for every later jit.)"""
    p = tmp_path / "scales.json"
    p.write_text(json.dumps(
        {"kv_cache": {"scaling_factor": {"0": 0.5, "1": 2.0}}}))

    def mk(sp_path=None, seed=3):
        return Engine(server_args=ServerArgs(
            model_path="", random_weights=True, page_size=4,
            max_total_tokens=512, seed=seed,
            quantization_param_path=sp_path), model_config=_mc())

    sp = SamplingParams(max_new_tokens=8, temperature=0.0, ignore_eos=True)
    rng = np.random.default_rng(0)
    prompts4 = [rng.integers(0, 64, size=10).tolist() for _ in range(4)]

    base = mk()  # unscaled reference for both shapes
    base_b1 = base.generate(input_ids=prompts4[:1], sampling_params=sp)
    base_b4 = base.generate(input_ids=prompts4, sampling_params=sp)

    a = mk(str(p))
    a_b1 = a.generate(input_ids=prompts4[:1], sampling_params=sp)
    b = mk()  # would have cleared the old global
    # A compiles a NEW bucket after B exists; scales must still apply (with
    # float32 KV, scaled == unscaled exactly, so compare tokens to baseline)
    a_b4 = a.generate(input_ids=prompts4, sampling_params=sp)
    b_b4 = b.generate(input_ids=prompts4, sampling_params=sp)
    assert [o["output_ids"] for o in a_b1] == [o["output_ids"] for o in base_b1]
    assert [o["output_ids"] for o in a_b4] == [o["output_ids"] for o in base_b4]
    assert [o["output_ids"] for o in b_b4] == [o["output_ids"] for o in base_b4]
    assert a.runner.kv_scales is not None and b.runner.kv_scales is None


def test_scales_rejected_for_mla(tmp_path):
    """--quantization-param-path must fail fast where it would be silently
    ignored (MLA latent pool holds K and V in one buffer)."""
    p = tmp_path / "scales.json"
    p.write_text(json.dumps(
        {"kv_cache": {"scaling_factor": {"0": 0.5}}}))
    mc = ModelConfig(
        architecture="DeepseekV2ForCausalLM", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=1, head_dim=16, max_position_embeddings=256,
        context_length=256, dtype="float32", use_mla=True,
        kv_lora_rank=16, qk_rope_head_dim=16, qk_nope_head_dim=16,
        v_head_dim=16,
    )
    with pytest.raises(ValueError, match="MLA"):
        Engine(server_args=ServerArgs(
            model_path="", random_weights=True, page_size=4,
            max_total_tokens=512, quantization_param_path=str(p)),
            model_config=mc)
