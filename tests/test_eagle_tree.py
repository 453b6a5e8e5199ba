"""EAGLE top-k TREE speculative decoding tests.

Greedy-output equivalence with plain decode holds for ANY draft net and any
tree shape (verification against the target is exact): if the tree attention
masks, RoPE positions, acceptance walk or KV compaction were wrong, the
generated tokens would diverge. Acceptance-length superiority over chain
drafts is asserted statistically — a top-k tree covers the target argmax at
each branch point more often than a single chain.

Reference: srt/speculative/eagle_worker.py:162-366 + build_eagle_tree.py.
"""

import numpy as np
import pytest

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.config.server_args import ServerArgs
from semi_pd_tpu.runtime.engine import Engine
from semi_pd_tpu.sampling.sampling_params import SamplingParams
from semi_pd_tpu.speculative.tree import build_tree_template, default_tree_template


def test_template_structure():
    t = build_tree_template((3, 2))
    assert t.num_nodes == 1 + 3 + 6
    assert t.depth == 2
    # node 0 root; nodes 1-3 level 1; 4-9 level 2
    assert list(t.parents[:4]) == [-1, 0, 0, 0]
    assert t.parents[4] == 1 and t.parents[5] == 1 and t.parents[6] == 2
    # ancestor bits: node 5 (rank-1 child of node 1) -> {0, 1, 5}
    assert t.anc_bits[5] == (1 << 0) | (1 << 1) | (1 << 5)
    assert t.anc_at_depth[5, 0] == 0
    assert t.anc_at_depth[5, 1] == 1
    assert t.anc_at_depth[5, 2] == 5
    # default template respects the 32-node cap
    d = default_tree_template(topk=8, gamma=6)
    assert d.num_nodes <= 32


def _mk(spec: bool, topk: int = 1, seed=9):
    cfg = ModelConfig(
        architecture="LlamaForCausalLM", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, max_position_embeddings=512,
        context_length=512, dtype="float32",
    )
    args = ServerArgs(
        model_path="", random_weights=True, page_size=4,
        max_total_tokens=2048, seed=seed,
        speculative_algorithm="EAGLE" if spec else None,
        speculative_num_draft_tokens=3,
        speculative_eagle_topk=topk,
    )
    return Engine(server_args=args, model_config=cfg)


@pytest.mark.parametrize("n_reqs", [1, 3])
def test_eagle_tree_greedy_equivalence(n_reqs):
    rng = np.random.default_rng(4)
    prompts = [rng.integers(0, 64, size=10 + 3 * i).tolist() for i in range(n_reqs)]
    sp = SamplingParams(max_new_tokens=15, temperature=0.0, ignore_eos=True)

    base = _mk(spec=False)
    want = base.generate(input_ids=prompts, sampling_params=sp)
    want = [want] if isinstance(want, dict) else want

    eng = _mk(spec=True, topk=3)
    assert eng.runner.tree_template is not None
    got = eng.generate(input_ids=prompts, sampling_params=sp)
    got = [got] if isinstance(got, dict) else got

    for w, g in zip(want, got):
        assert w["output_ids"] == g["output_ids"], (w["output_ids"], g["output_ids"])
    assert eng.scheduler.n_spec_steps > 0
    eng.scheduler.check_memory()


def test_eagle_tree_beats_chain_acceptance():
    """Same draft weights, same requests: the top-k tree must accept at
    least as many draft tokens per round as the chain on average (it
    strictly dominates: the chain is the rank-0 path of the tree)."""
    rng = np.random.default_rng(7)
    prompts = [rng.integers(0, 64, size=12 + i).tolist() for i in range(4)]
    sp = SamplingParams(max_new_tokens=30, temperature=0.0, ignore_eos=True)

    rates = {}
    for topk in (1, 3):
        eng = _mk(spec=True, topk=topk)
        eng.generate(input_ids=prompts, sampling_params=sp)
        s = eng.scheduler
        assert s.n_spec_steps > 0
        rates[topk] = s.n_spec_accepted / s.n_spec_steps
    assert rates[3] >= rates[1], rates


def test_eagle_tree_sampled_requests_fall_back():
    """Sampled requests cannot use greedy tree acceptance: the scheduler
    must still produce correct output via the chain path."""
    eng = _mk(spec=True, topk=3)
    rng = np.random.default_rng(3)
    prompt = rng.integers(0, 64, size=16).tolist()
    sp = SamplingParams(max_new_tokens=10, temperature=0.8, ignore_eos=True)
    out = eng.generate(input_ids=prompt, sampling_params=sp)
    assert len(out["output_ids"]) == 10
    eng.flush_cache()
    eng.scheduler.check_memory()
