"""Constrained-decoding tests: regex DFA engine, JSON-schema compiler, and
end-to-end grammar-masked generation (reference analogs: the json/regex/ebnf
rows of test/srt/test_json_constrained.py etc.)."""

import json
import re

import numpy as np
import pytest

from semi_pd_tpu.constrained.json_schema import schema_to_regex
from semi_pd_tpu.constrained.regex_dfa import compile_regex


def _accepts(dfa, s):
    st = dfa.step_str(0, s)
    return st >= 0 and st in dfa.accepts


@pytest.mark.parametrize("pattern,good,bad", [
    (r"abc", ["abc"], ["ab", "abcd", "abd"]),
    (r"a+b*", ["a", "aab", "abbb"], ["", "b", "ba"]),
    (r"(foo|bar)+", ["foo", "barfoo"], ["fo", "foob"]),
    (r"[a-c]{2,3}", ["ab", "abc", "ccc"], ["a", "abcd", "ad"]),
    (r"-?\d+(\.\d+)?", ["42", "-3.14", "0"], ["-", "3.", ".5", "1.2.3"]),
    (r"[^x]+", ["abc", "yz"], ["axb", "x", ""]),
    (r"a{3}", ["aaa"], ["aa", "aaaa"]),
    (r'"(?:[^"\\]|\\.)*"', ['"hi"', '""', '"a\\"b"'], ['"', 'hi', '"a" ']),
])
def test_regex_dfa(pattern, good, bad):
    dfa = compile_regex(pattern)
    for s in good:
        assert _accepts(dfa, s), (pattern, s)
    for s in bad:
        assert not _accepts(dfa, s), (pattern, s)


def test_json_schema_regex():
    schema = {
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "age": {"type": "integer"},
            "tags": {"type": "array", "items": {"type": "string"}, "maxItems": 2},
        },
        "required": ["name", "age"],
    }
    dfa = compile_regex(schema_to_regex(schema))
    ok = '{"name": "bob", "age": 42, "tags": ["x", "y"]}'
    assert _accepts(dfa, ok)
    assert _accepts(dfa, '{"name": "a", "age": -1}')
    assert not _accepts(dfa, '{"age": 42}')  # missing required name (order fixed)
    assert not _accepts(dfa, '{"name": "bob", "age": "x"}')
    # enum + const
    dfa2 = compile_regex(schema_to_regex({"enum": ["red", "green"]}))
    assert _accepts(dfa2, '"red"') and not _accepts(dfa2, '"blue"')


def test_grammar_matcher_token_level():
    class FakeTok:
        vocab_size = 8
        all_special_ids = [7]

        def __len__(self):
            return 8

        def decode(self, ids):
            table = {0: "a", 1: "b", 2: "ab", 3: "1", 4: "2", 5: "12", 6: "x"}
            return "".join(table.get(i, "") for i in ids)

    from semi_pd_tpu.constrained.grammar import GrammarCompiler

    gc = GrammarCompiler(FakeTok(), eos_ids=[7])
    m = gc.matcher("regex", r"ab1+")
    mask = m.vocab_mask()
    # allowed first tokens: "a" (0), "ab" (2); not b/1/x; eos not yet
    assert mask[0] and mask[2]
    assert not mask[1] and not mask[3] and not mask[6] and not mask[7]
    assert m.accept_token(2)  # "ab"
    mask = m.vocab_mask()
    assert mask[3]  # "1" continues
    assert not mask[5]  # "12" would walk past the language ('2' not allowed)
    assert not m.accept_token(6)
    assert m.accept_token(3)  # "1" -> accepting; eos now allowed
    assert m.vocab_mask()[7]
    assert m.accept_token(7)
    assert m.finished


def test_e2e_regex_constrained_generation():
    """Greedy generation through the engine restricted by a regex over the
    char-level tokenizer from the verify harness."""
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
        prompt="say a number:",
        sampling_params=SamplingParams(
            max_new_tokens=12, temperature=0.0, regex=r"-?\d+(\.\d+)?",
        ),
    )
    text = out["text"].replace(" ", "")
    assert re.fullmatch(r"-?\d+(\.\d+)?", text), out
    eng.scheduler.check_memory()

    # JSON schema end-to-end (enum keeps the value finite so the grammar
    # terminates within the token budget; an unbounded integer can legally
    # consume the whole budget emitting digits)
    schema = json.dumps({"type": "object",
                         "properties": {"a": {"enum": [1, 2, 3]}},
                         "required": ["a"]})
    out2 = eng.generate(
        prompt="json:",
        sampling_params=SamplingParams(
            max_new_tokens=30, temperature=0.0, json_schema=schema,
        ),
    )
    parsed = json.loads(out2["text"].replace(" ", ""))
    assert parsed["a"] in (1, 2, 3)


def test_grammar_disk_cache(tmp_path):
    """Compiled-DFA disk cache (role of the reference's outlines disk cache,
    --disable-outlines-disk-cache): a second compiler instance loads the
    cached automaton and produces identical masks."""
    from semi_pd_tpu.constrained.grammar import GrammarCompiler

    class FakeTok:
        vocab_size = 8
        all_special_ids = [7]

        def __len__(self):
            return 8

        def decode(self, ids):
            table = {0: "a", 1: "b", 2: "ab", 3: "1", 4: "2", 5: "12", 6: "x"}
            return "".join(table.get(i, "") for i in ids)

    d = str(tmp_path / "gcache")
    gc1 = GrammarCompiler(FakeTok(), eos_ids=[7], disk_cache_dir=d)
    m1 = gc1.matcher("regex", r"ab1+2").vocab_mask()
    import glob
    assert glob.glob(d + "/dfa_*.pkl")
    gc2 = GrammarCompiler(FakeTok(), eos_ids=[7], disk_cache_dir=d)
    m2 = gc2.matcher("regex", r"ab1+2").vocab_mask()
    assert (m1 == m2).all()
    # corrupt cache entry falls back to a fresh compile
    for p in glob.glob(d + "/dfa_*.pkl"):
        with open(p, "wb") as f:
            f.write(b"garbage")
    gc3 = GrammarCompiler(FakeTok(), eos_ids=[7], disk_cache_dir=d)
    m3 = gc3.matcher("regex", r"ab1+2").vocab_mask()
    assert (m1 == m3).all()
