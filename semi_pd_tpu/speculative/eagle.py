"""EAGLE speculative decoding (draft model, chain drafts, fused program).

Reference: srt/speculative/eagle_worker.py:162-366 (draft → tree-build →
target-verify as separate CUDA-graph launches + sgl-kernel accept kernels)
and srt/models/llama_eagle.py (draft net: fc merging [embed; target hidden]
into one llama decoder layer, target lm_head reused).

TPU-native re-design — ONE jitted program per decode round:

  1. draft scan: lax.scan runs the 1-layer draft gamma times entirely on
     device (greedy chain; each step's input token/hidden feed back through
     the carry) writing the draft KV pool;
  2. target verify over the [B*(gamma+1)] window with the scanned draft
     tokens substituted in-program;
  3. acceptance (runtime/speculative.py verify_and_accept) + extraction of
     the target hidden state at the accepted row, which seeds the next
     round's draft.

The reference needs three launch phases plus host glue between them; here
the whole round is one dispatch, which matters doubly on a deployment where
every dispatch crosses a network tunnel.

Unified storage extends to the draft: the draft KV pool ``[1, 2, S, Hd, Dd]``
uses the SAME slot space and page table as the target pool — allocation,
retraction and radix bookkeeping stay single-owner with zero extra logic.

Approximation kept (documented): no post-verify draft-extend refresh — deep
draft-cache entries derive from draft hiddens rather than target hiddens
(affects acceptance rate, never output correctness).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.layers.attention import paged_attention
from semi_pd_tpu.layers.linear import apply_linear
from semi_pd_tpu.ops.elementwise import rms_norm, silu_and_mul
from semi_pd_tpu.ops.rope import RotaryEmbedding
from semi_pd_tpu.runtime.forward_batch import ForwardArrays


class EagleDraftModel:
    """One llama decoder layer + fc([embed; hidden] -> hidden). Shares the
    target's embedding and lm_head (reference llama_eagle.py)."""

    def __init__(self, config: ModelConfig):
        self.config = config
        c = config
        self.num_heads = c.num_attention_heads
        self.num_kv_heads = c.num_key_value_heads
        self.head_dim = c.head_dim
        self.q_size = self.num_heads * self.head_dim
        self.kv_size = self.num_kv_heads * self.head_dim
        self.scale = self.head_dim ** -0.5
        self.dtype = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        self.rope = RotaryEmbedding(
            head_dim=self.head_dim,
            max_position=c.context_length,
            theta=c.rope_theta,
            rope_scaling=c.rope_scaling,
        )
        self.page_size = 16

    def param_specs(self) -> Dict[str, Any]:
        c, d = self.config, self.dtype
        H = c.hidden_size
        qkv_out = self.q_size + 2 * self.kv_size
        return {
            "fc": {"w": jax.ShapeDtypeStruct((2 * H, H), d)},
            "input_norm": jax.ShapeDtypeStruct((H,), d),
            "qkv_proj": {"w": jax.ShapeDtypeStruct((H, qkv_out), d)},
            "o_proj": {"w": jax.ShapeDtypeStruct((self.q_size, H), d)},
            "post_norm": jax.ShapeDtypeStruct((H,), d),
            "gate_up": {"w": jax.ShapeDtypeStruct((H, 2 * c.intermediate_size), d)},
            "down": {"w": jax.ShapeDtypeStruct((c.intermediate_size, H), d)},
        }

    def param_partition_specs(self) -> Dict[str, Any]:
        return {
            "fc": {"w": P()},
            "input_norm": P(),
            "qkv_proj": {"w": P(None, "tp")},
            "o_proj": {"w": P("tp", None)},
            "post_norm": P(),
            "gate_up": {"w": P(None, "tp")},
            "down": {"w": P("tp", None)},
        }

    def hf_weight_plan(self) -> Dict[str, Tuple]:
        qs, ks = self.q_size, self.kv_size
        return {
            "fc.weight": ("fc.w", None, "t"),
            "layers.0.input_layernorm.weight": ("input_norm", None, "none"),
            "layers.0.self_attn.q_proj.weight": ("qkv_proj.w", (0, qs), "t"),
            "layers.0.self_attn.k_proj.weight": ("qkv_proj.w", (qs, ks), "t"),
            "layers.0.self_attn.v_proj.weight": ("qkv_proj.w", (qs + ks, ks), "t"),
            "layers.0.self_attn.o_proj.weight": ("o_proj.w", None, "t"),
            "layers.0.post_attention_layernorm.weight": ("post_norm", None, "none"),
            "layers.0.mlp.gate_proj.weight": ("gate_up.w", (0, self.config.intermediate_size), "t"),
            "layers.0.mlp.up_proj.weight": ("gate_up.w", (self.config.intermediate_size, self.config.intermediate_size), "t"),
            "layers.0.mlp.down_proj.weight": ("down.w", None, "t"),
        }

    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        rng = np.random.default_rng(seed)

        def mk(spec):
            return jnp.asarray(
                rng.standard_normal(spec.shape, dtype=np.float32) * 0.02,
                dtype=spec.dtype,
            )

        return jax.tree.map(mk, self.param_specs())

    def step(
        self,
        dp: Dict[str, Any],
        tok_embed: jax.Array,  # [B, H] embedding of the input token
        hidden_feed: jax.Array,  # [B, H] previous hidden (target or draft)
        draft_kv: jax.Array,  # [1, 2, S, Hkv, D]
        positions: jax.Array,  # [B] absolute position being written
        out_slots: jax.Array,  # [B] slot for this position
        page_table: jax.Array,
        kv_lens: jax.Array,  # [B] = positions + 1
        attn_meta,
    ) -> Tuple[jax.Array, jax.Array]:
        """One draft decode step. Returns (hidden [B, H], draft_kv')."""
        c = self.config
        B = tok_embed.shape[0]
        x = apply_linear(dp["fc"], jnp.concatenate([tok_embed, hidden_feed], -1))

        attn_in = rms_norm(x, dp["input_norm"], c.rms_norm_eps)
        qkv = apply_linear(dp["qkv_proj"], attn_in)
        q, k, v = jnp.split(qkv, [self.q_size, self.q_size + self.kv_size], -1)
        q = q.reshape(B, self.num_heads, self.head_dim)
        k = k.reshape(B, self.num_kv_heads, self.head_dim)
        v = v.reshape(B, self.num_kv_heads, self.head_dim)
        q, k = self.rope(positions, q, k)

        fb_like = ForwardArrays(
            input_ids=jnp.zeros(B, jnp.int32),
            q_req_idx=jnp.arange(B, dtype=jnp.int32),
            q_pos=positions,
            out_slots=out_slots, page_table=page_table, kv_lens=kv_lens,
            logits_idx=jnp.arange(B, dtype=jnp.int32),
            sampling=None, rng_key=None,
            num_reqs=jnp.asarray(B, jnp.int32),
            attn_meta=attn_meta,
        )
        attn, draft_kv = paged_attention(
            q, k, v, draft_kv, 0, fb_like,
            page_size=self.page_size, scale=self.scale,
        )
        h = x + apply_linear(dp["o_proj"], attn.reshape(B, self.q_size))
        y = rms_norm(h, dp["post_norm"], c.rms_norm_eps)
        h = h + apply_linear(dp["down"], silu_and_mul(apply_linear(dp["gate_up"], y)))
        return h, draft_kv


def eagle_round(
    target_model,
    draft_model: EagleDraftModel,
    params,
    draft_params,
    kv,  # (target pool,)
    draft_kv,  # [1, 2, S, Hd, Dd]
    fb: ForwardArrays,  # spec-verify batch (B*(gamma+1) rows; input_ids row0 = last token)
    prev_hidden: jax.Array,  # [B, H] target hidden seeding the draft
    gamma: int,
):
    """The fused EAGLE round. Returns
    (accept_len [B], next_tok [B], drafts [B, gamma], next_hidden [B, H],
     new_key, kv', draft_kv')."""
    from semi_pd_tpu.ops.attention.ragged_paged_attention import AttnMeta
    from semi_pd_tpu.runtime.speculative import verify_and_accept

    B = fb.page_table.shape[0]
    W = gamma + 1
    embed_w = params["embed"]["w"]
    head = params.get("lm_head") or {"w": embed_w.T}

    win_slots = fb.out_slots.reshape(B, W)
    win_pos = fb.q_pos.reshape(B, W)
    base_kv = fb.kv_lens - W + 1  # kv length as of the window's first row

    # decode-shaped attn meta for the draft steps (one row per request)
    dmeta = AttnMeta(
        q_lens=jnp.ones(B, jnp.int32),
        q_start=base_kv - 1,  # filled per step below
        block_seq=jnp.arange(B, dtype=jnp.int32),
        block_row=jnp.arange(B, dtype=jnp.int32),
        block_qofs=jnp.zeros(B, jnp.int32),
    )

    tok0 = fb.input_ids.reshape(B, W)[:, 0]

    def draft_body(carry, j):
        tok, hfeed, dkv = carry
        positions = win_pos[:, 0] + j  # the draft for position j+1 is written at row j's pos
        meta = dmeta._replace(q_start=positions)
        h, dkv = draft_model.step(
            draft_params,
            jnp.take(embed_w, tok, axis=0),
            hfeed,
            dkv,
            positions,
            jnp.take(win_slots, j, axis=1),
            fb.page_table,
            positions + 1,
            meta,
        )
        logits = apply_linear(head, h).astype(jnp.float32)
        nxt = jnp.argmax(logits, -1).astype(jnp.int32)
        return (nxt, h, dkv), nxt

    (_, _, draft_kv), drafts_t = jax.lax.scan(
        draft_body, (tok0, prev_hidden, draft_kv), jnp.arange(gamma, dtype=jnp.int32)
    )
    drafts = drafts_t.T  # [B, gamma]

    # --- target verify with the scanned drafts substituted in
    window = jnp.concatenate([tok0[:, None], drafts], axis=1)  # [B, W]
    fb = fb._replace(input_ids=window.reshape(B * W))
    logits, kv, hidden = target_model.forward(
        params, fb, kv, return_hidden=True
    )

    new_key, sub = jax.random.split(fb.rng_key)
    draft_lens = jnp.minimum(
        jnp.maximum(fb.kv_lens - base_kv, 0), gamma
    )  # == gamma for real rows, 0 for padding
    accept_len, next_tok = verify_and_accept(
        logits, drafts, draft_lens, fb.sampling, sub, gamma
    )
    h_rows = hidden.reshape(B, W, -1)
    next_hidden = jnp.take_along_axis(
        h_rows, accept_len[:, None, None], axis=1
    )[:, 0, :]
    return accept_len, next_tok, drafts, next_hidden, new_key, kv, draft_kv
