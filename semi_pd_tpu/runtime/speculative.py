"""Speculative decoding: NGRAM (prompt-lookup) drafting + on-device verify.

Reference: srt/speculative/ (EAGLEWorker draft→tree→verify loop,
eagle_worker.py:162-366, and sgl-kernel speculative_sampling.cu). This module
implements the draft-model-free variant first: drafts come from n-gram
lookup over the request's own history (prompt-lookup decoding), and
verification is ONE extend-shaped forward where every draft row's logits are
scored; acceptance/correction happens on device (the role of
tree_speculative_sampling_target_only).

Chain drafts (no tree): γ tokens per request per step. Accepted tokens
advance the sequence by up to γ+1 per forward — a major win when output
copies prompt spans (code edits, RAG quotes), and on this deployment every
forward costs a host↔device round trip, so fewer forwards is the whole game.

KV correctness: draft rows write KV at their true positions during verify;
rejected rows leave stale KV beyond kv_len, which is never read (attention
masks by kv_lens) and is overwritten when real tokens reach those positions.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from semi_pd_tpu.ops.sampling import SamplingArrays
from semi_pd_tpu.runtime.req import Req


def ngram_draft(req: Req, gamma: int, min_n: int = 1, max_n: int = 3) -> List[int]:
    """Prompt-lookup: find the most recent earlier occurrence of the current
    tail n-gram in the request's full history and copy the continuation."""
    hist = req.all_token_ids()
    L = len(hist)
    if L < 2 or gamma <= 0:
        return []
    for n in range(max_n, min_n - 1, -1):
        if L <= n:
            continue
        tail = hist[-n:]
        # scan backwards for the previous occurrence of `tail`
        for start in range(L - n - 1, -1, -1):
            if hist[start : start + n] == tail:
                cont = hist[start + n : start + n + gamma]
                if cont:
                    return cont
                break
    return []


def verify_and_accept(
    logits: jax.Array,  # [B*(g+1), V] — per draft row, in request-major order
    drafts: jax.Array,  # [B, g] i32 (padded with -1)
    draft_lens: jax.Array,  # [B] i32
    sampling: SamplingArrays,
    key: jax.Array,
    gamma: int,
    threshold_single: float = 1.0,
    threshold_acc: float = 1.0,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (accept_len [B] i32, next_token [B] i32).

    Row j of request b holds logits AFTER consuming token j of its verify
    window (row 0 = after last accepted token), i.e. row j predicts draft
    j+1; the last row predicts the bonus token.

    Greedy requests accept while argmax matches the draft. Sampling requests
    use exact rejection sampling against the deterministic draft (q = delta):
    accept draft t with prob p(t); on rejection resample from p with t
    removed — unbiased (Leviathan et al.).

    Relaxations (reference server_args.py:133-134, defaults exact): a draft
    is also accepted outright when p(t) > threshold_single, and the accept
    probability is raised from p to min(1, p / threshold_acc)."""
    B = drafts.shape[0]
    V = logits.shape[-1]
    lg = logits.reshape(B, gamma + 1, V).astype(jnp.float32)

    temp = jnp.maximum(sampling.temperature, 1e-6)[:, None, None]
    probs = jax.nn.softmax(lg / temp, axis=-1)  # [B, g+1, V]

    draft_safe = jnp.maximum(drafts, 0)
    # prob of each draft token under the model: p_j = P(d_{j+1} | ...) from row j
    p_draft = jnp.take_along_axis(
        probs[:, :gamma, :], draft_safe[:, :, None], axis=2
    )[..., 0]  # [B, g]

    greedy = sampling.temperature <= 0.0  # [B]
    argmaxes = jnp.argmax(lg, axis=-1).astype(jnp.int32)  # [B, g+1]

    key, sub = jax.random.split(key)
    u = jax.random.uniform(sub, (B, gamma))
    ok_sample = u < p_draft / threshold_acc
    if threshold_single < 1.0:
        ok_sample |= p_draft > threshold_single
    ok_greedy = argmaxes[:, :gamma] == drafts
    ok = jnp.where(greedy[:, None], ok_greedy, ok_sample)
    valid = jnp.arange(gamma, dtype=jnp.int32)[None, :] < draft_lens[:, None]
    ok = ok & valid

    # accept_len = length of the all-true prefix
    accept_len = jnp.sum(jnp.cumprod(ok.astype(jnp.int32), axis=1), axis=1)

    # Correction/bonus token from row `accept_len` (0-based): if all g
    # accepted, that's the bonus row; else the first rejected row, sampling
    # from p with the rejected draft token removed.
    row = jnp.take_along_axis(probs, accept_len[:, None, None], axis=1)[:, 0, :]
    rejected_tok = jnp.take_along_axis(
        jnp.pad(draft_safe, ((0, 0), (0, 1))), accept_len[:, None], axis=1
    )[:, 0]
    fully_accepted = accept_len >= draft_lens
    adj = jnp.where(
        fully_accepted[:, None],
        row,
        row * (1 - jax.nn.one_hot(rejected_tok, V, dtype=row.dtype)),
    )
    adj = adj / jnp.maximum(adj.sum(-1, keepdims=True), 1e-20)

    key, sub = jax.random.split(key)
    sampled = jax.random.categorical(sub, jnp.log(jnp.maximum(adj, 1e-30))).astype(jnp.int32)
    greedy_next = jnp.take_along_axis(
        argmaxes, accept_len[:, None], axis=1
    )[:, 0]
    # greedy + rejection: the correction IS the argmax (≠ draft by definition)
    next_token = jnp.where(greedy, greedy_next, sampled)
    return accept_len.astype(jnp.int32), next_token
