"""DeepSeek NextN/MTP speculative decoding tests (speculative/nextn.py).

Greedy-output equivalence with plain decode holds for ANY draft weights
(verification against the target is exact), so a random NextN module is
enough to validate the full path: MLA latent draft pool, eh_proj merge,
chain AND tree drafting through the fused EAGLE rounds.

Reference: srt/models/deepseek_nextn.py + eagle_worker NEXTN wiring."""

import numpy as np
import pytest

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.config.server_args import ServerArgs
from semi_pd_tpu.runtime.engine import Engine
from semi_pd_tpu.sampling.sampling_params import SamplingParams


def _mk(spec: bool, topk: int = 1, seed=11):
    cfg = ModelConfig(
        architecture="DeepseekV2ForCausalLM", vocab_size=64, hidden_size=48,
        intermediate_size=64, moe_intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4,
        kv_lora_rank=32, q_lora_rank=None,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
        num_experts=4, num_experts_per_tok=2, num_shared_experts=1,
        first_k_dense_replace=1, moe_layer_freq=1,
        max_position_embeddings=256, context_length=256,
        tie_word_embeddings=False, dtype="float32", use_mla=True,
    )
    args = ServerArgs(
        model_path="", random_weights=True, page_size=4,
        max_total_tokens=2048, seed=seed,
        speculative_algorithm="NEXTN" if spec else None,
        speculative_num_draft_tokens=3,
        speculative_eagle_topk=topk,
    )
    return Engine(server_args=args, model_config=cfg)


def test_nextn_draft_module_selected():
    from semi_pd_tpu.speculative.nextn import NextNDraftModel

    eng = _mk(spec=True)
    assert isinstance(eng.runner.draft_model, NextNDraftModel)
    # draft pool mirrors the target MLA latent layout, one layer
    assert eng.runner.draft_kv.spec.use_mla
    assert eng.runner.draft_kv.spec.num_layers == 1


@pytest.mark.parametrize("topk", [1, 3])
def test_nextn_greedy_equivalence(topk):
    rng = np.random.default_rng(4)
    prompts = [rng.integers(0, 64, size=9 + 4 * i).tolist() for i in range(2)]
    sp = SamplingParams(max_new_tokens=12, temperature=0.0, ignore_eos=True)

    base = _mk(spec=False)
    want = base.generate(input_ids=prompts, sampling_params=sp)
    want = [want] if isinstance(want, dict) else want

    eng = _mk(spec=True, topk=topk)
    got = eng.generate(input_ids=prompts, sampling_params=sp)
    got = [got] if isinstance(got, dict) else got

    for w, g in zip(want, got):
        assert w["output_ids"] == g["output_ids"], (w["output_ids"], g["output_ids"])
    assert eng.scheduler.n_spec_steps > 0
    eng.scheduler.check_memory()
