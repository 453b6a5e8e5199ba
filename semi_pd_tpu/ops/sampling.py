"""On-device batched sampling.

Reference: srt/layers/sampler.py:29-275 (flashinfer top-k/top-p kernels with
torch fallback) + sgl-kernel sampling ops. TPU-native approach: one jitted
function fused into the decode/prefill step program — logits never leave the
device; only the sampled token ids [B] are transferred back per step.

Exactness: top-k via kth-value threshold, top-p via sorted cumulative mass,
min-p via max-prob threshold — all exact (no rejection loops; those are a
GPU-warp idiom). Categorical draw via Gumbel-argmax on the masked logits.
Penalties (presence/frequency/repetition) are applied from an output-token
count array maintained on device by scatter-add (reference penaltylib
orchestrator, srt/sampling/penaltylib/).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class PenaltyArrays(NamedTuple):
    """Compact per-request token histogram shipped with penalized batches
    (reference: srt/sampling/penaltylib/ cumulated [B, V] tensors — here the
    dense counts are rebuilt on device from a bucketed (ids, counts) list so
    the host never transfers [B, V]).

    hist_ids: [B, H] i32 token ids (-1 pad); hist_counts: [B, H] i32 counts
    of that token among *generated* tokens; hist_prompt: [B, H] bool — token
    appears in the prompt (repetition penalty covers prompt tokens too)."""

    hist_ids: jax.Array
    hist_counts: jax.Array
    hist_prompt: jax.Array


class SamplingArrays(NamedTuple):
    """Per-request sampling parameters, batch-aligned [B]."""

    temperature: jax.Array  # [B] f32; 0 => greedy
    top_k: jax.Array  # [B] i32; 0 or >=V => disabled
    top_p: jax.Array  # [B] f32; 1.0 => disabled
    min_p: jax.Array  # [B] f32; 0.0 => disabled
    presence_penalty: jax.Array  # [B] f32
    frequency_penalty: jax.Array  # [B] f32
    repetition_penalty: jax.Array  # [B] f32; 1.0 => disabled


def apply_penalties(
    logits: jax.Array,  # [B, V] f32
    output_counts: jax.Array,  # [B, V] i32 — counts of generated tokens
    prompt_mask: jax.Array,  # [B, V] bool — tokens present in prompt
    p: SamplingArrays,
) -> jax.Array:
    occurred = (output_counts > 0) | prompt_mask
    rep = p.repetition_penalty[:, None]
    logits = jnp.where(
        occurred,
        jnp.where(logits > 0, logits / rep, logits * rep),
        logits,
    )
    logits = logits - p.frequency_penalty[:, None] * output_counts.astype(jnp.float32)
    logits = logits - p.presence_penalty[:, None] * (output_counts > 0).astype(jnp.float32)
    return logits


def sample(
    logits: jax.Array,  # [B, V] any float dtype
    params: SamplingArrays,
    key: jax.Array,
    vocab_mask: Optional[jax.Array] = None,  # [B, V] bool — grammar constraint
    penalties: Optional[PenaltyArrays] = None,
) -> jax.Array:
    """Returns sampled token ids [B] int32."""
    B, V = logits.shape
    logits = logits.astype(jnp.float32)
    if penalties is not None:
        safe_ids = jnp.maximum(penalties.hist_ids, 0)
        valid = penalties.hist_ids >= 0
        rows = jnp.broadcast_to(
            jnp.arange(B, dtype=jnp.int32)[:, None], safe_ids.shape
        )
        counts = jnp.zeros((B, V), jnp.int32).at[rows, safe_ids].add(
            jnp.where(valid, penalties.hist_counts, 0)
        )
        prompt_mask = jnp.zeros((B, V), bool).at[rows, safe_ids].max(
            valid & penalties.hist_prompt
        )
        logits = apply_penalties(logits, counts, prompt_mask, params)
    if vocab_mask is not None:
        # Grammar-constrained decoding (reference: apply_vocab_mask,
        # srt/constrained/base_grammar_backend.py:30-110). A float array is
        # an additive logit bias instead (custom logit processors,
        # sampling/logit_processor.py; grammar bans arrive folded in as
        # -inf). Trace-time branch: jit specializes on the dtype.
        if vocab_mask.dtype == jnp.bool_:
            logits = jnp.where(vocab_mask, logits, -jnp.inf)
        else:
            logits = logits + vocab_mask.astype(jnp.float32)

    greedy_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    temp = jnp.maximum(params.temperature, 1e-6)[:, None]
    scaled = logits / temp

    # top-k: threshold at the kth largest logit.
    k_disabled = (params.top_k <= 0) | (params.top_k >= V)
    k_eff = jnp.clip(params.top_k, 1, V)
    sorted_desc = jnp.sort(scaled, axis=-1)[:, ::-1]  # [B, V]
    kth_val = jnp.take_along_axis(sorted_desc, (k_eff - 1)[:, None], axis=-1)
    keep_k = (scaled >= kth_val) | k_disabled[:, None]

    # top-p over the sorted distribution.
    probs_sorted = jax.nn.softmax(sorted_desc, axis=-1)
    cum = jnp.cumsum(probs_sorted, axis=-1)
    # keep the smallest set whose mass >= top_p (always keep rank 0)
    cut_val = jnp.take_along_axis(
        sorted_desc,
        jnp.argmax(cum >= params.top_p[:, None], axis=-1)[:, None],
        axis=-1,
    )
    keep_p = (scaled >= cut_val) | (params.top_p >= 1.0)[:, None]

    # min-p: prob >= min_p * max_prob.
    max_logit = jnp.max(scaled, axis=-1, keepdims=True)
    probs = jnp.exp(scaled - max_logit)  # unnormalized, max=1
    norm = jnp.sum(probs, axis=-1, keepdims=True)
    keep_m = (probs / norm) >= (params.min_p[:, None] * (1.0 / norm))
    keep_m = keep_m | (params.min_p <= 0.0)[:, None]

    masked = jnp.where(keep_k & keep_p & keep_m, scaled, -jnp.inf)
    sampled = jax.random.categorical(key, masked, axis=-1).astype(jnp.int32)

    return jnp.where(params.temperature <= 0.0, greedy_ids, sampled)


def compute_logprobs(logits: jax.Array, token_ids: jax.Array) -> jax.Array:
    """Log-prob of chosen tokens: logits [B, V], token_ids [B] -> [B] f32."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(logp, token_ids[:, None], axis=-1)[:, 0]


def top_logprobs(logits: jax.Array, k: int):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    vals, idx = jax.lax.top_k(logp, k)
    return vals, idx.astype(jnp.int32)
