"""Structural-tag constrained decoding (reference: xgrammar
compile_structural_tag via srt/constrained/xgrammar_backend.py:162-179 and
response_format.type == "structural_tag", srt/openai_api/adapter.py:993)."""

import json

import numpy as np
import pytest

from semi_pd_tpu.constrained.structural_tag import StructuralTagDFA


def _spec(structures, triggers):
    return json.dumps({"structures": structures, "triggers": triggers})


SPEC = _spec(
    [{"begin": "<fn>", "schema": {"enum": [1, 2]}, "end": "</fn>"}],
    ["<fn>"],
)


def _walk(dfa, s, state=0):
    return dfa.step_str(state, s)


def test_free_text_is_unconstrained():
    dfa = StructuralTagDFA(SPEC)
    st = _walk(dfa, "hello world, any chars !@#$")
    assert st >= 0 and st in dfa.accepts  # still free -> EOS legal


def test_trigger_forces_structure():
    dfa = StructuralTagDFA(SPEC)
    st = _walk(dfa, "text <fn>")
    assert st >= 0 and st not in dfa.accepts  # inside structure: EOS illegal
    # only the schema body may continue: "1</fn>" ok, "x" dead
    assert _walk(dfa, "1</fn>", st) >= 0
    assert _walk(dfa, "x", st) == -1
    # completing the structure returns to free mode
    done = _walk(dfa, "2</fn>", st)
    assert done in dfa.accepts
    # and a second occurrence re-triggers
    st2 = _walk(dfa, " more <fn>", done)
    assert st2 not in dfa.accepts
    assert _walk(dfa, "1</fn>", st2) in dfa.accepts


def test_trigger_straddles_partial_prefix():
    dfa = StructuralTagDFA(SPEC)
    # "<f" then "n>" across two steps still fires
    st = _walk(dfa, "abc<f")
    assert st in dfa.accepts  # not yet fired
    st = _walk(dfa, "n>", st)
    assert st not in dfa.accepts
    # "<f" followed by non-trigger char falls back to free
    st = _walk(dfa, "<fx is fine")
    assert st in dfa.accepts


def test_begin_longer_than_trigger():
    spec = _spec(
        [{"begin": "<tool=search>", "schema": {"type": "integer"},
          "end": "</tool>"}],
        ["<tool="],
    )
    dfa = StructuralTagDFA(spec)
    st = _walk(dfa, "go <tool=")
    assert st not in dfa.accepts
    # remainder of begin is forced
    assert _walk(dfa, "search>42</tool>", st) in dfa.accepts
    assert _walk(dfa, "x", st) == -1


def test_multiple_structures_one_trigger():
    spec = _spec(
        [
            {"begin": "<t:a>", "schema": {"const": 1}, "end": "</t>"},
            {"begin": "<t:b>", "schema": {"const": 2}, "end": "</t>"},
        ],
        ["<t:"],
    )
    dfa = StructuralTagDFA(spec)
    st = _walk(dfa, "<t:")
    assert _walk(dfa, "a>1</t>", st) in dfa.accepts
    assert _walk(dfa, "b>2</t>", st) in dfa.accepts
    assert _walk(dfa, "a>2</t>", st) == -1  # schema of structure a is const 1


def test_validation_errors():
    with pytest.raises(ValueError):
        StructuralTagDFA(_spec([], ["<x>"]))
    with pytest.raises(ValueError):
        StructuralTagDFA(_spec([{"begin": "<a>", "schema": {}, "end": "</a>"}], []))
    with pytest.raises(ValueError):  # begin matches no trigger
        StructuralTagDFA(
            _spec([{"begin": "<a>", "schema": {}, "end": "</a>"}], ["<b>"]))


class FakeTok:
    """char-ish vocab incl. multi-char tokens that straddle the trigger."""

    vocab_size = 12
    all_special_ids = [11]
    _table = {0: "a", 1: "<", 2: "f", 3: "n", 4: ">", 5: "1", 6: "2",
              7: "/", 8: "<fn>", 9: "1</fn>", 10: "z<fn>1"}

    def __len__(self):
        return 12

    def decode(self, ids):
        return "".join(self._table.get(i, "") for i in ids)


def test_token_level_masks_and_eos():
    from semi_pd_tpu.constrained.grammar import GrammarCompiler

    gc = GrammarCompiler(FakeTok(), eos_ids=[11])
    m = gc.matcher("structural_tag", SPEC)
    mask = m.vocab_mask()
    # free mode: every text token allowed, EOS allowed
    assert mask[:11].all() and mask[11]
    assert m.accept_token(8)  # "<fn>" -> in structure
    mask = m.vocab_mask()
    assert mask[5] and mask[6]  # schema enum digits
    assert not mask[0] and not mask[11]  # no free text, no EOS
    assert mask[9]  # "1</fn>" completes the structure in one token
    assert m.accept_token(9)
    assert m.vocab_mask()[11]  # back to free: EOS fine
    # jump-forward inside a forced literal: after "1" the "</fn>" chars are
    # forced one char at a time
    m2 = gc.matcher("structural_tag", SPEC)
    for t in (10,):  # "z<fn>1" — free text then trigger then body
        assert m2.accept_token(t)
    jf = m2.jump_forward_tokens()
    assert [FakeTok._table[t] for t in jf[:4]] == ["<", "/", "f", "n"]


def test_e2e_engine_structural_tag():
    """Greedy engine run: learn the model's first free char, use it as the
    trigger so the structure is entered deterministically."""
    import torch
    from transformers import LlamaConfig as HFC, LlamaForCausalLM as HFL
    from tokenizers import Tokenizer, models
    from tokenizers.pre_tokenizers import Split
    from transformers import PreTrainedTokenizerFast

    chars = {chr(i): i - 32 for i in range(32, 127)}
    chars["<unk>"] = 95
    chars["</s>"] = 96
    tok_core = Tokenizer(models.WordLevel(vocab=chars, unk_token="<unk>"))
    tok_core.pre_tokenizer = Split(pattern="", behavior="isolated")
    tok = PreTrainedTokenizerFast(
        tokenizer_object=tok_core, unk_token="<unk>", eos_token="</s>"
    )

    cfg = HFC(vocab_size=100, hidden_size=64, intermediate_size=128,
              num_hidden_layers=2, num_attention_heads=4,
              num_key_value_heads=2, max_position_embeddings=256,
              eos_token_id=96, tie_word_embeddings=False)
    torch.manual_seed(0)
    hf = HFL(cfg).eval().float()

    from semi_pd_tpu.config.model_config import ModelConfig
    from semi_pd_tpu.config.server_args import ServerArgs
    from semi_pd_tpu.model_loader.loader import load_params
    from semi_pd_tpu.runtime.engine import Engine
    from semi_pd_tpu.sampling.sampling_params import SamplingParams

    mc = ModelConfig.from_hf_config(cfg, dtype="float32")
    eng = Engine(
        server_args=ServerArgs(model_path="", random_weights=True,
                               page_size=4, max_total_tokens=1024),
        model_config=mc, tokenizer=tok,
    )
    eng.runner.params = load_params(
        eng.runner.model, weights=list(hf.state_dict().items()))

    free = eng.generate(
        prompt="go:",
        sampling_params=SamplingParams(max_new_tokens=2, temperature=0.0,
                                       ignore_eos=True),
    )["text"].replace(" ", "")
    trigger = free[0]
    spec = _spec(
        [{"begin": trigger + "[", "schema": {"enum": [3]}, "end": "]"}],
        [trigger],
    )
    out = eng.generate(
        prompt="go:",
        sampling_params=SamplingParams(
            max_new_tokens=16, temperature=0.0, structural_tag=spec,
        ),
    )["text"].replace(" ", "")
    assert out.startswith(trigger + "[3]"), (trigger, out)
    eng.scheduler.check_memory()


def test_greedy_exit_ambiguity_warning(caplog):
    """A schema whose string values can contain the end literal must warn at
    compile time (greedy exit diverges from xgrammar PDA semantics there);
    a schema that cannot contain it must not."""
    import logging

    ambiguous = _spec(
        [{"begin": "<t>",
          "schema": {"type": "object",
                     "properties": {"s": {"type": "string"}},
                     "required": ["s"]},
          "end": "</t>"}],
        ["<t>"],
    )
    with caplog.at_level(logging.WARNING,
                         logger="semi_pd_tpu.constrained.structural_tag"):
        StructuralTagDFA(ambiguous)
    assert any("matchable inside" in r.getMessage() for r in caplog.records)

    caplog.clear()
    safe = _spec(
        [{"begin": "<t>", "schema": {"enum": [1, 2]}, "end": "</t>"}],
        ["<t>"],
    )
    with caplog.at_level(logging.WARNING,
                         logger="semi_pd_tpu.constrained.structural_tag"):
        StructuralTagDFA(safe)
    assert not caplog.records
