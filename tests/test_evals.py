"""Eval-harness unit tests (reference python/sglang/test/simple_eval_*.py).

No real datasets or checkpoints exist in this environment (BENCH notes say
so honestly); these tests pin the GRADING logic — answer extraction,
normalization, exec-based pass@1 — with a stub engine returning canned
generations, which is the part of the harness that silently rots."""

import pytest

from semi_pd_tpu.evals.simple_evals import (
    extract_boxed,
    extract_gsm8k_answer,
    score_gsm8k,
    score_humaneval,
    score_math,
    score_mmlu,
)


class StubEngine:
    def __init__(self, texts):
        self.texts = texts

    def generate(self, prompt=None, sampling_params=None, **kw):
        assert len(prompt) == len(self.texts)
        return [{"text": t} for t in self.texts]


def test_gsm8k_extraction_and_scoring():
    assert extract_gsm8k_answer("blah #### 42") == "42"
    assert extract_gsm8k_answer("so the answer is 1,234.") == "1234"
    data = [
        {"question": f"q{i}", "answer": f"w #### {i}"} for i in range(4)
    ]
    eng = StubEngine(["the answer is 2", "nope 999"])
    acc = score_gsm8k(eng, data, num_shots=2, num_examples=2)
    assert acc == 0.5


def test_mmlu_scoring():
    data = [
        {"question": "q1", "choices": ["w", "x", "y", "z"], "answer": 2},
        {"question": "q2", "choices": ["w", "x", "y", "z"], "answer": 0},
    ]
    eng = StubEngine([" C", " B"])
    assert score_mmlu(eng, data, num_examples=2) == 0.5


def test_math_boxed_extraction():
    assert extract_boxed(r"thus \boxed{\frac{1}{2}} done") == r"\frac{1}{2}"
    assert extract_boxed(r"\boxed{x + {y}}") == "x + {y}"
    data = [{"problem": "p", "answer": r"\frac{1}{2}"},
            {"problem": "p2", "answer": "7"}]
    eng = StubEngine([r"... \boxed{\frac{1}{ 2}}", "... so 8"])
    assert score_math(eng, data, num_examples=2) == 0.5


def test_humaneval_exec():
    data = [{
        "prompt": "def add(a, b):\n",
        "test": "def check(f):\n    assert f(1, 2) == 3\n",
        "entry_point": "add",
    }, {
        "prompt": "def sub(a, b):\n",
        "test": "def check(f):\n    assert f(3, 1) == 2\n",
        "entry_point": "sub",
    }]
    eng = StubEngine(["    return a + b\n", "    return a + b\n"])  # 2nd wrong
    assert score_humaneval(eng, data, num_examples=2) == 0.5
