"""Accuracy eval harness (GSM8K few-shot, MMLU multiple-choice).

Reference: python/sglang/test/simple_eval_gsm8k.py / simple_eval_mmlu.py /
few_shot_gsm8k.py — the accuracy gates in BASELINE.md (MMLU >= 0.65 under
retraction fault injection, nightly GSM8K).

Datasets are plain JSONL files (no network in this environment):
  gsm8k: {"question": ..., "answer": "... #### 42"}
  mmlu:  {"question": ..., "choices": ["...", ...], "answer": 2}

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


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--task", choices=["gsm8k", "mmlu"], required=True)
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
    else:
        acc = score_mmlu(eng, data, args.num_examples)
    print(json.dumps({"task": args.task, "n": args.num_examples,
                      "accuracy": round(acc, 4)}))


if __name__ == "__main__":
    main()
