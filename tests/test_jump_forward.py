"""Grammar jump-forward: forced tokens emitted without model forwards, KV
back-filled by an extend (reference: outlines jump-forward,
srt/constrained/base_grammar_backend.py:187)."""

import re

import numpy as np
import pytest

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.config.server_args import ServerArgs
from semi_pd_tpu.runtime.engine import Engine
from semi_pd_tpu.sampling.sampling_params import SamplingParams

from tests.test_lang import _CharTok


def _engine(**kw):
    from transformers import LlamaConfig

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, tie_word_embeddings=False,
    )
    cfg.architectures = ["LlamaForCausalLM"]
    mc = ModelConfig.from_hf_config(cfg, dtype="float32")
    return Engine(
        server_args=ServerArgs(model_path="", random_weights=True, page_size=4,
                               max_total_tokens=2048, dtype="float32", **kw),
        model_config=mc, tokenizer=_CharTok(),
    )


REGEX = r"(a|b)=FORCED LITERAL RUN;(x|y)"


def test_jump_forward_emits_forced_run():
    eng = _engine()
    sp = SamplingParams(max_new_tokens=40, temperature=0.0, regex=REGEX,
                        ignore_eos=False)
    out = eng.generate(prompt="Q: ", sampling_params=sp)
    assert re.fullmatch(REGEX, out["text"]), out["text"]
    # the literal run was jumped, not decoded
    assert eng.scheduler.n_jump_tokens >= len("=FORCED LITERAL RUN;")


def test_jump_forward_matches_disabled_path():
    """Same greedy request with and without jump-forward produces the same
    text (forced tokens are grammar-determined; KV back-fill must keep the
    model's distribution identical for the free positions)."""
    sp = SamplingParams(max_new_tokens=40, temperature=0.0, regex=REGEX)
    a = _engine().generate(prompt="Q: ", sampling_params=sp)
    b = _engine(disable_jump_forward=True).generate(prompt="Q: ", sampling_params=sp)
    assert a["text"] == b["text"]
    assert re.fullmatch(REGEX, a["text"])


def test_jump_forward_semi_pd_and_overlap():
    eng = _engine(enable_semi_pd=True)
    sp = SamplingParams(max_new_tokens=40, temperature=0.0, regex=REGEX)
    outs = eng.generate(
        prompt=["Q: ", "R: ", "S: "],
        sampling_params=sp,
    )
    for o in outs:
        assert re.fullmatch(REGEX, o["text"]), o["text"]
    assert eng.scheduler.n_jump_tokens >= 3 * len("=FORCED LITERAL RUN;") - 3
