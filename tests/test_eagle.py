"""EAGLE speculative decoding tests.

Output equivalence with plain decode holds for ANY draft net (verification is
exact) — tested with a random draft. Acceptance-rate machinery is exercised
by the NGRAM tests which share verify_and_accept."""

import numpy as np
import pytest

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.config.server_args import ServerArgs
from semi_pd_tpu.runtime.engine import Engine
from semi_pd_tpu.sampling.sampling_params import SamplingParams


def _mk(spec: bool, seed=9):
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
    )
    return Engine(server_args=args, model_config=cfg)


@pytest.mark.parametrize("n_reqs", [1, 3])
def test_eagle_greedy_equivalence(n_reqs):
    rng = np.random.default_rng(4)
    prompts = [rng.integers(0, 64, size=10 + 3 * i).tolist() for i in range(n_reqs)]
    sp = SamplingParams(max_new_tokens=15, temperature=0.0, ignore_eos=True)

    base = _mk(spec=False)
    want = base.generate(input_ids=prompts, sampling_params=sp)
    want = [want] if isinstance(want, dict) else want

    eng = _mk(spec=True)
    got = eng.generate(input_ids=prompts, sampling_params=sp)
    got = [got] if isinstance(got, dict) else got

    for w, g in zip(want, got):
        assert w["output_ids"] == g["output_ids"], (w["output_ids"], g["output_ids"])
    assert eng.scheduler.n_spec_steps > 0
    eng.scheduler.check_memory()


def test_eagle_chunked_prefill_and_radix(n_reqs=2):
    eng = _mk(spec=True)
    rng = np.random.default_rng(5)
    prompt = rng.integers(0, 64, size=40).tolist()
    sp = SamplingParams(max_new_tokens=8, temperature=0.0, ignore_eos=True)
    o1 = eng.generate(input_ids=prompt, sampling_params=sp)
    o2 = eng.generate(input_ids=prompt, sampling_params=sp)
    assert o1["output_ids"] == o2["output_ids"]
    assert o2["meta_info"]["cached_tokens"] > 0
    eng.flush_cache()
    eng.scheduler.check_memory()


def test_draft_extend_refresh_semantics():
    """The post-verify refresh (reference eagle_worker.py
    forward_draft_extend_after_decode) must (a) leave the round's outputs
    unchanged, (b) rewrite the window's draft-KV rows 1..gamma exactly as a
    hand-rolled teacher-forced loop over the target's true hiddens does,
    and (c) actually change something vs the unrefreshed pool (the drift
    it exists to remove)."""
    import jax
    import jax.numpy as jnp
    from semi_pd_tpu.speculative.eagle import eagle_round

    eng = _mk(spec=True)
    runner = eng.runner
    cap = {}
    orig = runner.eagle_step

    def spy(fb, prev_hidden, gamma):
        if "fb" not in cap and runner._spy_round[0] >= 1:
            cap["fb"] = fb
            cap["prev_hidden"] = prev_hidden
            cap["gamma"] = gamma
            cap["kv"] = jax.tree.map(jnp.copy, runner.kv_cache.arrays)
            cap["dkv"] = jnp.copy(runner.draft_kv.arrays[0])
        runner._spy_round[0] += 1
        return orig(fb, prev_hidden, gamma)

    runner._spy_round = [0]
    runner.eagle_step = spy
    rng = np.random.default_rng(11)
    prompt = rng.integers(0, 64, size=12).tolist()
    sp = SamplingParams(max_new_tokens=12, temperature=0.0, ignore_eos=True)
    eng.generate(input_ids=prompt, sampling_params=sp)
    assert "fb" in cap, "no eagle round captured"

    fb, prev_hidden, gamma = cap["fb"], cap["prev_hidden"], cap["gamma"]
    model, draft = runner.model, runner.draft_model

    def run(refresh):
        kv = tuple(jax.tree.map(jnp.copy, cap["kv"]))
        dkv = jnp.copy(cap["dkv"])
        return eagle_round(model, draft, runner.params, runner.draft_params,
                           kv, dkv, fb, prev_hidden, gamma, refresh=refresh)

    a_on = run(True)
    a_off = run(False)
    # (a) round outputs identical
    for x, y in zip(a_on[:4], a_off[:4]):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    dkv_on, dkv_off = a_on[6], a_off[6]
    # (c) the refresh changed the pool
    assert float(jnp.abs(dkv_on - dkv_off).max()) > 0

    # (b) hand-rolled teacher forcing from the unrefreshed pool
    B = fb.page_table.shape[0]
    W = gamma + 1
    win_slots = np.asarray(fb.out_slots).reshape(B, W)
    win_pos = np.asarray(fb.q_pos).reshape(B, W)
    drafts = np.asarray(a_on[2])
    tok0 = np.asarray(fb.input_ids).reshape(B, W)[:, 0]
    window = np.concatenate([tok0[:, None], drafts], axis=1)

    # target true hiddens over the verified window
    kv3 = tuple(jax.tree.map(jnp.copy, cap["kv"]))
    _, _, hidden = model.forward(
        runner.params, fb._replace(input_ids=jnp.asarray(window.reshape(-1))),
        kv3, return_hidden=True)
    h_rows = np.asarray(hidden).reshape(B, W, -1)

    from semi_pd_tpu.ops.attention.ragged_paged_attention import AttnMeta

    dkv_manual = dkv_off
    embed_w = runner.params["embed"]["w"]
    for j in range(1, gamma + 1):
        positions = jnp.asarray(win_pos[:, 0] + j)
        meta = AttnMeta(
            q_lens=jnp.ones(B, jnp.int32), q_start=positions,
            block_seq=jnp.arange(B, dtype=jnp.int32),
            block_row=jnp.arange(B, dtype=jnp.int32),
            block_qofs=jnp.zeros(B, jnp.int32),
        )
        _, dkv_manual = draft.step(
            runner.draft_params,
            jnp.take(embed_w, jnp.asarray(window[:, j]), axis=0),
            jnp.asarray(h_rows[:, j - 1]).astype(prev_hidden.dtype),
            dkv_manual, positions, jnp.asarray(win_slots[:, j]),
            fb.page_table, positions + 1, meta,
        )
    np.testing.assert_allclose(
        np.asarray(dkv_manual), np.asarray(dkv_on), rtol=1e-5, atol=1e-6)


def test_eagle_fr_spec_token_map(tmp_path):
    """FR-Spec (--speculative-token-map): drafts are restricted to the hot
    vocab but outputs stay exactly equal to plain decode (verification is
    target-exact regardless of drafts). Reference eagle_worker.py:70-95."""
    import json

    rng = np.random.default_rng(11)
    prompts = [rng.integers(0, 64, size=12).tolist()]
    sp = SamplingParams(max_new_tokens=12, temperature=0.0, ignore_eos=True)

    base = _mk(spec=False)
    want = base.generate(input_ids=prompts, sampling_params=sp)

    tmap = tmp_path / "hot.json"
    tmap.write_text(json.dumps(list(range(0, 64, 2))))  # even ids only

    cfg = ModelConfig(
        architecture="LlamaForCausalLM", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, max_position_embeddings=512,
        context_length=512, dtype="float32",
    )
    eng = Engine(server_args=ServerArgs(
        model_path="", random_weights=True, page_size=4,
        max_total_tokens=2048, seed=9, speculative_algorithm="EAGLE",
        speculative_num_draft_tokens=3,
        speculative_token_map=str(tmap)), model_config=cfg)
    got = eng.generate(input_ids=prompts, sampling_params=sp)
    assert want[0]["output_ids"] == got[0]["output_ids"]
    assert eng.scheduler.n_spec_steps > 0
    eng.scheduler.check_memory()
