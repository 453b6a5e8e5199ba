"""Device-side batch representation.

TPU-native counterpart of the reference's ForwardBatch / ForwardMode
(reference: srt/model_executor/forward_batch_info.py:53-110,131,226). One
ragged layout serves both phases: query tokens of all requests concatenated
to a flat, bucket-padded [T]; per-token arrays map tokens to requests and
absolute positions. A decode batch is the special case T == B with one token
per request. Shapes are static per (T_bucket, B_bucket, maxP_bucket) so each
bucket compiles once (the role of CUDA-graph capture sizes,
cuda_graph_runner.py:109).
"""

from __future__ import annotations

import enum
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from semi_pd_tpu.ops.attention.ragged_paged_attention import (
    AttnMeta,
    make_attn_meta_host,
)
from semi_pd_tpu.ops.sampling import SamplingArrays


class ForwardMode(enum.Enum):
    EXTEND = "extend"  # prefill / chunked prefill continuation
    DECODE = "decode"
    IDLE = "idle"


class ForwardArrays(NamedTuple):
    """Everything the jitted step program needs, all device arrays.

    Padding convention: padded token rows have q_req_idx pointing at row 0
    with q_pos 0 (outputs ignored) and out_slots inside the dump page (page
    0), so scatters are harmless. Padded batch rows have kv_lens 0.
    """

    input_ids: jax.Array  # [T] i32
    q_req_idx: jax.Array  # [T] i32 — batch row of each token
    q_pos: jax.Array  # [T] i32 — absolute position in its request
    out_slots: jax.Array  # [T] i32 — KV slot this token's K/V is written to
    page_table: jax.Array  # [B, maxP] i32
    kv_lens: jax.Array  # [B] i32 — total kv length incl. this step's tokens
    logits_idx: jax.Array  # [B] i32 — index into [T] of each request's last token
    sampling: SamplingArrays  # per-request [B]
    rng_key: jax.Array  # PRNG key for sampling
    num_reqs: jax.Array  # [] i32 — actual (unpadded) request count
    attn_meta: AttnMeta  # ragged-attention work list (pallas backend)
    lora_idx: Optional[jax.Array] = None  # [T] i32 adapter index (0 = none)
    # Multimodal: replaces the token embedding at masked rows (image patch
    # features spliced into the prompt; reference ImageInputs +
    # multi_modality_padding)
    embed_override: Optional[jax.Array] = None  # [T, H]
    embed_mask: Optional[jax.Array] = None  # [T] bool
    # Qwen2-VL m-rope: per-token (t, h, w) positions; None for 1D-rope models
    mrope_pos: Optional[jax.Array] = None  # [T, 3] i32
    # Speculation-tree batches (speculative/tree.py): slot-order positions
    # for causal masking (q_pos keeps the ROPE position = tree depth) and
    # the window start per request; None outside tree rounds.
    mask_pos: Optional[jax.Array] = None  # [T] i32
    win_base: Optional[jax.Array] = None  # [B] i32
    # Mllama cross-attention (models/mllama.py): per-request projected
    # vision states, valid-token counts, and the first prompt position that
    # may attend them (the <|image|> token); None for non-cross models.
    cross_states: Optional[jax.Array] = None  # [B, Nv, H] f32
    cross_len: Optional[jax.Array] = None  # [B] i32 (0 = no image)
    cross_from: Optional[jax.Array] = None  # [B] i32
    # Per-layer fp8-KV scaling factors [L, 2] f32 (k_scale, v_scale) from
    # --quantization-param-path, or None. Carried on the batch (stamped by
    # the owning ModelRunner inside its step programs) rather than a module
    # global so two runners in one process can't cross-contaminate each
    # other's traces (reference model_runner.py:681-688).
    kv_scales: Optional[jax.Array] = None  # [L, 2] f32


def build_attn_meta(q_lens_np: np.ndarray, kv_lens_np: np.ndarray, T: int) -> AttnMeta:
    """Numpy → device AttnMeta. q_block_size must match the kernel's choice
    (8 for decode where T == B, 128 for extend)."""
    B = len(q_lens_np)
    qbs = 8 if T == B else 128
    bs, br, bq = make_attn_meta_host(q_lens_np, T, qbs)
    return AttnMeta(
        q_lens=jnp.asarray(q_lens_np.astype(np.int32)),
        q_start=jnp.asarray((kv_lens_np - q_lens_np).astype(np.int32)),
        block_seq=jnp.asarray(bs),
        block_row=jnp.asarray(br),
        block_qofs=jnp.asarray(bq),
    )


def make_idle_batch(T: int, B: int, maxP: int) -> "ForwardArrays":
    z = lambda n, d=jnp.int32: jnp.zeros(n, dtype=d)
    return ForwardArrays(
        input_ids=z(T),
        q_req_idx=z(T),
        q_pos=z(T),
        out_slots=z(T),
        page_table=z((B, maxP)),
        kv_lens=z(B),
        logits_idx=z(B),
        sampling=SamplingArrays(
            temperature=jnp.zeros(B, jnp.float32),
            top_k=z(B),
            top_p=jnp.ones(B, jnp.float32),
            min_p=jnp.zeros(B, jnp.float32),
            presence_penalty=jnp.zeros(B, jnp.float32),
            frequency_penalty=jnp.zeros(B, jnp.float32),
            repetition_penalty=jnp.ones(B, jnp.float32),
        ),
        rng_key=jax.random.PRNGKey(0),
        num_reqs=jnp.zeros((), jnp.int32),
        attn_meta=build_attn_meta(np.zeros(B, np.int64), np.zeros(B, np.int64), T),
    )
