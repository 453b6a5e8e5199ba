"""Replay a --debug-tensor-dump-output-folder step dump.

Reference: --debug-tensor-dump-input-file / --debug-tensor-dump-inject
(srt/model_runner.py) re-run a dumped forward's inputs to diff numerics
across builds/backends. Here: load a step .npz written by the scheduler
(runtime/scheduler.py _dump_step), teacher-force its input_ids through a
fresh engine, and report greedy-token agreement with the dumped sampled
tokens plus logprob deltas.

    python -m semi_pd_tpu.utils.debug_replay --model-path <dir> \
        --input-file /dumps/step_000003_extend.npz [--attention-backend reference]
"""

from __future__ import annotations

import argparse

import numpy as np


def replay(engine, npz_path: str) -> dict:
    import os

    z = np.load(npz_path, allow_pickle=False)
    kind = "decode" if "decode" in os.path.basename(npz_path) else "extend"
    if kind == "decode":
        raise ValueError(
            "decode dumps carry only the step's input token, not the KV "
            "history — replay the request's extend dump instead (it holds "
            "the full prompt)")
    input_ids = z["input_ids"]
    kv_lens = z["kv_lens"]
    toks = z["tokens"]
    # Extend rows are the ragged concat of per-request chunks; rows are
    # right-padded to the bucket, so split by kv_lens (= tokens visible so
    # far, which for a first chunk equals the row count). Replay each
    # request's prompt teacher-forced and compare the dumped sampled token's
    # logprob (exact agreement expected for greedy dumps on the same
    # backend/dtype; deltas localize numeric drift otherwise).
    results = []
    B = len(kv_lens)
    ext = z["extend_lens"] if "extend_lens" in z and len(z["extend_lens"]) \
        else kv_lens
    seqs, ofs = [], 0
    for i in range(B):
        n = int(ext[i])
        if int(kv_lens[i]) != n:
            seqs.append(None)  # later chunk: prompt prefix not in this dump
        else:
            seqs.append([int(t) for t in input_ids[ofs:ofs + n]])
        ofs += n
    for i, seq in enumerate(seqs):
        if not seq or int(toks[i]) < 0:
            continue
        lps = engine.score(input_ids=seq + [int(toks[i])],
                           logprob_start_len=len(seq))
        results.append({
            "req": i,
            "dumped_token": int(toks[i]),
            "replay_logprob": float(lps[0][0]) if lps else None,
            "dumped_logprob": float(z["logprobs"][i]),
        })
    agree = sum(
        1 for r in results
        if r["replay_logprob"] is not None
        and abs(r["replay_logprob"] - r["dumped_logprob"]) < 1e-2
    )
    return {"kind": kind, "n": len(results), "logprob_agree": agree,
            "rows": results}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--model-path", required=True)
    p.add_argument("--input-file", required=True)
    p.add_argument("--attention-backend", default=None)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args(argv)

    from semi_pd_tpu.config.server_args import ServerArgs
    from semi_pd_tpu.runtime.engine import Engine

    eng = Engine(server_args=ServerArgs(
        model_path=args.model_path, dtype=args.dtype,
        attention_backend=args.attention_backend, max_total_tokens=8192))
    out = replay(eng, args.input_file)
    import json

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
