"""Accuracy eval harness: GSM8K few-shot, MMLU/GPQA multiple-choice, MATH,
MGSM (multilingual GSM), HumanEval (sandboxed exec pass@1).

Reference: python/sglang/test/simple_eval_{gsm8k,mmlu,gpqa,math,mgsm,
humaneval}.py + few_shot_gsm8k.py — the accuracy gates in BASELINE.md
(MMLU >= 0.65 under retraction fault injection, nightly GSM8K).

Datasets are plain JSONL files (no network in this environment):
  gsm8k/mgsm: {"question": ..., "answer": "... #### 42"}
  mmlu/gpqa:  {"question": ..., "choices": ["...", ...], "answer": 2}
  math:       {"problem": ..., "answer": "..."}  (boxed-string match)
  humaneval:  {"prompt": ..., "test": ..., "entry_point": ...}

Usage:
  python -m semi_pd_tpu.evals.simple_evals --task gsm8k --data gsm8k.jsonl \
      --model-path <dir> --num-examples 200 --num-shots 5
"""

from __future__ import annotations

import argparse
import json
import re
from typing import List, Optional

ANSWER_RE = re.compile(r"#### *(-?[\d,.]+)")
NUM_RE = re.compile(r"-?[\d,]*\.?\d+")


def extract_gsm8k_answer(text: str) -> Optional[str]:
    m = ANSWER_RE.search(text)
    if m:
        return m.group(1).replace(",", "").rstrip(".")
    nums = NUM_RE.findall(text)
    return nums[-1].replace(",", "").rstrip(".") if nums else None


def build_gsm8k_prompt(shots: List[dict], q: str) -> str:
    parts = []
    for s in shots:
        parts.append(f"Question: {s['question']}\nAnswer: {s['answer']}\n")
    parts.append(f"Question: {q}\nAnswer:")
    return "\n".join(parts)


def score_gsm8k(engine, data: List[dict], num_shots: int, num_examples: int,
                max_new_tokens: int = 256) -> float:
    shots = data[:num_shots]
    items = data[num_shots : num_shots + num_examples]
    prompts = [build_gsm8k_prompt(shots, it["question"]) for it in items]
    outs = engine.generate(
        prompt=prompts,
        sampling_params={"max_new_tokens": max_new_tokens, "temperature": 0.0,
                         "stop": ["Question:"]},
    )
    correct = 0
    for it, o in zip(items, outs):
        want = extract_gsm8k_answer(it["answer"])
        got = extract_gsm8k_answer(o["text"])
        correct += int(want is not None and got == want)
    return correct / max(len(items), 1)


LETTERS = "ABCD"


def score_mmlu(engine, data: List[dict], num_examples: int) -> float:
    items = data[:num_examples]
    prompts = []
    for it in items:
        ch = "\n".join(f"{LETTERS[i]}. {c}" for i, c in enumerate(it["choices"]))
        prompts.append(
            f"{it['question']}\n{ch}\nAnswer with a single letter.\nAnswer:"
        )
    outs = engine.generate(
        prompt=prompts,
        sampling_params={"max_new_tokens": 4, "temperature": 0.0},
    )
    correct = 0
    for it, o in zip(items, outs):
        m = re.search(r"[ABCD]", o["text"])
        if m and LETTERS.index(m.group(0)) == int(it["answer"]):
            correct += 1
    return correct / max(len(items), 1)


def extract_boxed(text: str) -> Optional[str]:
    """Last \\boxed{...} content (reference simple_eval_math answer grading)."""
    i = text.rfind("\\boxed{")
    if i < 0:
        m = NUM_RE.findall(text)
        return m[-1] if m else None
    depth = 0
    for j in range(i + len("\\boxed{") - 1, len(text)):
        if text[j] == "{":
            depth += 1
        elif text[j] == "}":
            depth -= 1
            if depth == 0:
                return text[i + len("\\boxed{") : j].strip()
    return None


def _norm_math(s: str) -> str:
    s = s.strip().replace(" ", "").replace("\\left", "").replace("\\right", "")
    s = s.replace("\\!", "").replace("\\,", "").rstrip(".")
    return s


def score_math(engine, data: List[dict], num_examples: int,
               max_new_tokens: int = 512) -> float:
    """MATH dataset: exact match of normalized \\boxed answers (reference
    simple_eval_math.py)."""
    items = data[:num_examples]
    prompts = [
        f"Problem: {it['problem']}\nSolve step by step and end with the "
        f"final answer in \\boxed{{}}.\nSolution:" for it in items
    ]
    outs = engine.generate(
        prompt=prompts,
        sampling_params={"max_new_tokens": max_new_tokens, "temperature": 0.0,
                         "stop": ["Problem:"]},
    )
    correct = 0
    for it, o in zip(items, outs):
        got = extract_boxed(o["text"])
        correct += int(
            got is not None and _norm_math(got) == _norm_math(it["answer"])
        )
    return correct / max(len(items), 1)


def score_mgsm(engine, data: List[dict], num_shots: int,
               num_examples: int) -> float:
    """MGSM = GSM8K prompting over multilingual items; numeric-match scoring
    is language-agnostic (reference simple_eval_mgsm.py)."""
    return score_gsm8k(engine, data, num_shots, num_examples)


def score_humaneval(engine, data: List[dict], num_examples: int,
                    max_new_tokens: int = 512, timeout_s: float = 10.0) -> float:
    """pass@1 by executing the generated completion against the task's tests
    in a subprocess (reference simple_eval_humaneval.py; unsafe-code caveat
    applies equally there)."""
    import subprocess
    import sys as _sys
    import tempfile

    items = data[:num_examples]
    outs = engine.generate(
        prompt=[it["prompt"] for it in items],
        sampling_params={"max_new_tokens": max_new_tokens, "temperature": 0.0,
                         "stop": ["\ndef ", "\nclass ", "\nif __name__"]},
    )
    passed = 0
    for it, o in zip(items, outs):
        program = (
            it["prompt"] + o["text"] + "\n" + it["test"] + "\n"
            + f"check({it['entry_point']})\n"
        )
        with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
            f.write(program)
            path = f.name
        try:
            r = subprocess.run(
                [_sys.executable, path], capture_output=True, timeout=timeout_s
            )
            passed += int(r.returncode == 0)
        except subprocess.TimeoutExpired:
            pass
    return passed / max(len(items), 1)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument(
        "--task",
        choices=["gsm8k", "mmlu", "gpqa", "math", "mgsm", "humaneval"],
        required=True,
    )
    p.add_argument("--data", required=True)
    p.add_argument("--model-path", required=True)
    p.add_argument("--num-examples", type=int, default=200)
    p.add_argument("--num-shots", type=int, default=5)
    p.add_argument("--enable-semi-pd", action="store_true")
    args = p.parse_args(argv)

    from semi_pd_tpu.runtime.engine import Engine

    data = [json.loads(l) for l in open(args.data)]
    eng = Engine(model_path=args.model_path,
                 enable_semi_pd=args.enable_semi_pd)
    if args.task == "gsm8k":
        acc = score_gsm8k(eng, data, args.num_shots, args.num_examples)
    elif args.task == "mgsm":
        acc = score_mgsm(eng, data, args.num_shots, args.num_examples)
    elif args.task == "math":
        acc = score_math(eng, data, args.num_examples)
    elif args.task == "humaneval":
        acc = score_humaneval(eng, data, args.num_examples)
    else:  # mmlu / gpqa share the multiple-choice format
        acc = score_mmlu(eng, data, args.num_examples)
    print(json.dumps({"task": args.task, "n": args.num_examples,
                      "accuracy": round(acc, 4)}))


if __name__ == "__main__":
    main()
