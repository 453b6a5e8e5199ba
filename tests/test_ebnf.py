"""EBNF grammar backend tests (reference analog: the ebnf rows of
test/srt/test_json_constrained.py via the xgrammar backend,
base_grammar_backend.py:183)."""

import json
import re

import numpy as np
import pytest

from semi_pd_tpu.constrained.ebnf import (
    TokenPDA,
    _closure,
    _step_char,
    build_vocab_trie,
    parse_ebnf,
)


class CharTok:
    """Char-level fake tokenizer: token i = printable chr(32+i)."""

    vocab_size = 97
    all_special_ids = [96]

    def __len__(self):
        return 97

    def decode(self, ids):
        return "".join(chr(32 + i) if i < 95 else "" for i in ids)


CHAR_STRS = [chr(32 + i) if i < 95 else "" for i in range(97)]
EOS = 96


def _accepts(ebnf: str, s: str) -> bool:
    rules, start = parse_ebnf(ebnf)
    cfgs = _closure(frozenset([(rules[start],)]))
    for ch in s:
        cfgs = _step_char(cfgs, ch)
        if not cfgs:
            return False
    return () in cfgs


ARITH = """
root ::= expr
expr ::= term (("+" | "-") term)*
term ::= factor (("*" | "/") factor)*
factor ::= num | "(" expr ")"
num ::= [0-9]+
"""


@pytest.mark.parametrize("ebnf,good,bad", [
    ('root ::= "ab" | "cd"', ["ab", "cd"], ["a", "abc", ""]),
    ('root ::= "a"* "b"', ["b", "ab", "aaab"], ["a", "ba"]),
    ('root ::= "a"+ "b"?', ["a", "ab", "aaa"], ["b", "", "abb"]),
    ('root ::= [0-9]{2,3}', ["12", "123"], ["1", "1234", "ab"]),
    ('root ::= "x" ("y" | "z"){2}', ["xyy", "xyz", "xzz"], ["xy", "xyzz"]),
    # nested recursion (balanced parens) — beyond any regex
    ('root ::= "" | "(" root ")" root', ["", "()", "(())()", "((()))"],
     ["(", "())", ")("]),
    (ARITH, ["1", "1+2", "(1+2)*34", "((7))/2-1"], ["", "1+", "(1", "*3", "1++2"]),
])
def test_ebnf_acceptance(ebnf, good, bad):
    for s in good:
        assert _accepts(ebnf, s), (ebnf, s)
    for s in bad:
        assert not _accepts(ebnf, s), (ebnf, s)


def test_ebnf_escapes_and_classes():
    g = r'root ::= "\"" [^"\\]* "\""'
    assert _accepts(g, '"hi there"')
    assert not _accepts(g, '"a"b"')
    g2 = 'root ::= [a-cx-z]+'
    assert _accepts(g2, "abcz")
    assert not _accepts(g2, "abd")


def test_left_recursion_rejected():
    with pytest.raises(ValueError, match="left-recursive"):
        parse_ebnf('root ::= root "a" | "b"')
    # indirect through a nullable prefix
    with pytest.raises(ValueError, match="left-recursive"):
        parse_ebnf('root ::= pad other\npad ::= "x"?\nother ::= root "y" | "z"')


def test_undefined_rule_rejected():
    with pytest.raises(ValueError, match="never defined"):
        parse_ebnf('root ::= missing "a"')


def test_token_pda_masks():
    pda = TokenPDA('root ::= "a" ("b" | "c") "d"*', CHAR_STRS, [EOS])
    a, b, c, d = ord("a") - 32, ord("b") - 32, ord("c") - 32, ord("d") - 32
    mask, nxt = pda.state_table(0)
    assert mask[a] and not mask[b] and not mask[EOS]
    s1 = int(nxt[a])
    mask, nxt = pda.state_table(s1)
    assert mask[b] and mask[c] and not mask[a]
    s2 = int(nxt[b])
    mask, _ = pda.state_table(s2)
    assert pda.is_accepting(s2) and mask[EOS] and mask[d]


def test_grammar_matcher_ebnf_jump_forward():
    """Forced-token chains work through the PDA exactly as through the DFA."""
    from semi_pd_tpu.constrained.grammar import GrammarMatcher

    pda = TokenPDA('root ::= ("x" | "y") "=42;"', CHAR_STRS, [EOS])
    m = GrammarMatcher(pda)
    assert not m.jump_forward_tokens()  # two choices: no forced chain
    assert m.accept_token(ord("x") - 32)
    jf = m.jump_forward_tokens()
    assert CHAR_STRS and [CHAR_STRS[t] for t in jf[:4]] == ["=", "4", "2", ";"]


def test_multi_char_tokens_and_trie_pruning():
    strs = ["", "a", "b", "ab", "abc", "abd", "zz", ""]
    pda = TokenPDA('root ::= "ab" ("c" | "d")', strs, [7],
                   vocab_trie=build_vocab_trie(strs))
    mask, nxt = pda.state_table(0)
    # "a" (prefix), "ab" (prefix), "abc"/"abd" (complete) allowed; b/zz not
    assert list(np.flatnonzero(mask)) == [1, 3, 4, 5]
    send = int(nxt[4])
    assert pda.is_accepting(send)
    assert pda.state_table(send)[0][7]  # eos


def test_e2e_ebnf_constrained_generation():
    """Arithmetic-grammar e2e through the engine (VERDICT round-1 item 4)."""
    import torch
    from tokenizers import Tokenizer, models
    from tokenizers.pre_tokenizers import Split
    from transformers import LlamaConfig as HFC, LlamaForCausalLM as HFL
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
              num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
              max_position_embeddings=256, eos_token_id=96,
              tie_word_embeddings=False)
    torch.manual_seed(0)
    hf = HFL(cfg).eval().float()

    from semi_pd_tpu.config.model_config import ModelConfig
    from semi_pd_tpu.config.server_args import ServerArgs
    from semi_pd_tpu.model_loader.loader import load_params
    from semi_pd_tpu.runtime.engine import Engine
    from semi_pd_tpu.sampling.sampling_params import SamplingParams

    mc = ModelConfig.from_hf_config(cfg, dtype="float32")
    eng = Engine(
        server_args=ServerArgs(model_path="", random_weights=True, page_size=4,
                               max_total_tokens=1024),
        model_config=mc, tokenizer=tok,
    )
    eng.runner.params = load_params(eng.runner.model, weights=list(hf.state_dict().items()))

    out = eng.generate(
        prompt="calc:",
        sampling_params=SamplingParams(
            max_new_tokens=10, temperature=0.0,
            ebnf='root ::= num (("+" | "*") num)*\nnum ::= [0-9]{1,3}',
        ),
    )
    text = out["text"].replace(" ", "")
    assert re.fullmatch(r"\d{1,3}([+*]\d{1,3})*", text), out
    eng.scheduler.check_memory()
