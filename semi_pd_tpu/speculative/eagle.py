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
        positions: jax.Array,  # [B] ROPE position being written
        out_slots: jax.Array,  # [B] slot for this position
        page_table: jax.Array,
        kv_lens: jax.Array,  # [B] = mask position + 1
        attn_meta,
        mask_positions: Optional[jax.Array] = None,  # [B] slot-order positions
        win_base: Optional[jax.Array] = None,  # [B] tree window start
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
            mask_pos=mask_positions, win_base=win_base,
        )
        attn, draft_kv = paged_attention(
            q, k, v, draft_kv, 0, fb_like,
            page_size=self.page_size, scale=self.scale,
        )
        h = x + apply_linear(dp["o_proj"], attn.reshape(B, self.q_size))
        y = rms_norm(h, dp["post_norm"], c.rms_norm_eps)
        h = h + apply_linear(dp["down"], silu_and_mul(apply_linear(dp["gate_up"], y)))
        return h, draft_kv

    def pre_head(self, dp, h):
        """Hidden -> lm_head input (identity: the EAGLE llama draft feeds
        the shared head directly; NextN applies shared_head.norm here)."""
        return h


def load_token_map(path: str):
    """FR-Spec hot-token map loader (reference eagle_worker.py:496-504
    load_token_map; torch.load of a token-id list). Also accepts .json and
    .npy for torch-free deployments."""
    import numpy as np

    if path.endswith(".json"):
        import json

        with open(path) as f:
            ids = json.load(f)
    elif path.endswith(".npy"):
        ids = np.load(path)
    else:
        import torch

        ids = torch.load(path, map_location="cpu", weights_only=True)
        ids = ids.tolist() if hasattr(ids, "tolist") else ids
    return np.asarray(ids, dtype=np.int32)


def _hot_head(head, hot_ids):
    """Slice the lm_head to the hot vocabulary (reference
    eagle_worker.py:92-95 ``head.data[hot_token_id]``): the draft's head
    GEMM shrinks from [H, V] to [H, Vh] and its argmax/top-k indices map
    back through ``hot_ids``. Returns None for head formats that cannot be
    sliced (blockwise-quantized scales)."""
    w = head["w"]
    out = {"w": jnp.take(w, hot_ids, axis=1)}
    if "b" in head:
        out["b"] = jnp.take(head["b"], hot_ids, axis=0)
    if "ws" in head:
        ws = head["ws"]
        if ws.ndim == w.ndim:  # 128x128 blockwise: not sliceable per column
            return None
        out["ws"] = jnp.take(ws, hot_ids, axis=0)
    return out


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
    refresh: bool = True,
    threshold_single: float = 1.0,
    threshold_acc: float = 1.0,
    hot_ids=None,  # [Vh] i32 FR-Spec hot vocab (--speculative-token-map)
    hot_head=None,  # pre-sliced hot lm_head (runner._slice_hot_head)
):
    """The fused EAGLE round. Returns
    (accept_len [B], next_tok [B], drafts [B, gamma], next_hidden [B, H],
     new_key, kv', draft_kv').

    ``refresh`` enables the post-verify draft-extend (reference
    eagle_worker.py forward_draft_extend_after_decode): window rows were
    written into the draft KV with the draft's OWN hiddens during the scan;
    after verify, the accepted rows are rewritten from the target's true
    hiddens so next rounds draft against exact state (raises acceptance,
    never changes outputs — rejected rows sit past kv_len and are masked)."""
    from semi_pd_tpu.ops.attention.ragged_paged_attention import AttnMeta
    from semi_pd_tpu.runtime.speculative import verify_and_accept

    B = fb.page_table.shape[0]
    W = gamma + 1
    embed_w = params["embed"]["w"]
    head = params.get("lm_head") or {"w": embed_w.T}

    draft_head, hot_map = head, None
    if hot_ids is not None:
        hh = hot_head if hot_head is not None else _hot_head(head, hot_ids)
        if hh is not None:
            draft_head, hot_map = hh, hot_ids

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
        logits = apply_linear(
            draft_head, draft_model.pre_head(draft_params, h)
        ).astype(jnp.float32)
        nxt = jnp.argmax(logits, -1).astype(jnp.int32)
        if hot_map is not None:
            nxt = jnp.take(hot_map, nxt)  # hot-vocab index -> real token id
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
        logits, drafts, draft_lens, fb.sampling, sub, gamma,
        threshold_single=threshold_single, threshold_acc=threshold_acc,
    )
    h_rows = hidden.reshape(B, W, -1)
    next_hidden = jnp.take_along_axis(
        h_rows, accept_len[:, None, None], axis=1
    )[:, 0, :]

    if refresh and gamma > 0:
        # post-verify draft-extend: rewrite window rows 1..gamma with the
        # TARGET hidden of the previous row (the scan used draft hiddens).
        # Rows past accept_len land beyond kv_len and are never attended,
        # so rewriting all of them unconditionally is safe.
        def refresh_body(dkv, j):
            positions = win_pos[:, 0] + j
            meta = dmeta._replace(q_start=positions)
            tok_j = jnp.take_along_axis(window, j[None, None], axis=1)[:, 0]
            h_prev = jnp.take_along_axis(
                h_rows, (j - 1)[None, None, None], axis=1)[:, 0, :]
            _, dkv = draft_model.step(
                draft_params,
                jnp.take(embed_w, tok_j, axis=0),
                h_prev.astype(prev_hidden.dtype),
                dkv,
                positions,
                jnp.take_along_axis(win_slots, j[None, None], axis=1)[:, 0],
                fb.page_table,
                positions + 1,
                meta,
            )
            return dkv, None

        draft_kv, _ = jax.lax.scan(
            refresh_body, draft_kv, jnp.arange(1, gamma + 1, dtype=jnp.int32)
        )
    return accept_len, next_tok, drafts, next_hidden, new_key, kv, draft_kv


def eagle_tree_round(
    target_model,
    draft_model: EagleDraftModel,
    params,
    draft_params,
    kv,
    draft_kv,  # [1, 2, S, Hd, Dd]
    fb: ForwardArrays,  # tree-verify batch (B*N rows; see build_tree_verify_batch)
    prev_hidden: jax.Array,  # [B, H] target hidden seeding the draft
    tree,  # TreeTemplate (static)
    refresh: bool = True,
    hot_ids=None,  # [Vh] i32 FR-Spec hot vocab (--speculative-token-map)
    hot_head=None,  # pre-sliced hot lm_head (runner._slice_hot_head)
):
    """EAGLE top-k TREE round, fully fused in one dispatch (reference:
    eagle_worker.py:162-366 + build_eagle_tree.py, which run draft CUDA
    graphs, tree construction kernels and a verify graph as separate
    launches). Greedy acceptance only — the scheduler falls back to chain
    drafts for sampled requests.

    Phases (all under one spec_tree_context so every attention call applies
    the static ancestor masks):
      1. draft, level by level (unrolled — level widths are static): run the
         1-layer draft on every node of the level, writing draft KV at the
         node's slot; top-k of each node's logits provides its children's
         tokens per the template ranks.
      2. target verify over all B*N tree rows in ONE extend forward.
      3. greedy acceptance: node is accepted iff its parent is and its token
         equals the target argmax at the parent; the deepest accepted node
         wins; bonus token = target argmax at that node.
      4. KV compaction: both pools copy the accepted path's rows into
         slot order [base+1 .. base+accept_len] so committed positions are
         contiguous (tree slots are BFS-order, not path-order).

    Returns (accept_len [B], next_tok [B], path_tokens [B, depth],
    next_hidden [B, H], new_key, kv', draft_kv')."""
    from semi_pd_tpu.layers.attention import spec_tree_context
    from semi_pd_tpu.ops.attention.ragged_paged_attention import AttnMeta

    N = tree.num_nodes
    B = fb.page_table.shape[0]
    embed_w = params["embed"]["w"]
    head = params.get("lm_head") or {"w": embed_w.T}
    draft_head, hot_map = head, None
    if hot_ids is not None:
        hh = hot_head if hot_head is not None else _hot_head(head, hot_ids)
        if hh is not None:
            draft_head, hot_map = hh, hot_ids

    win_slots = fb.out_slots.reshape(B, N)
    rope_pos = fb.q_pos.reshape(B, N)  # base + depth(node)
    mask_pos = fb.mask_pos.reshape(B, N)  # base + node
    base = mask_pos[:, 0]  # window start per request

    tok0 = fb.input_ids.reshape(B, N)[:, 0]
    node_tokens = {0: tok0}
    node_hidden = {}

    with spec_tree_context(tree.anc_bits):
        # ---- 1. draft, level by level
        for d, level in enumerate(tree.level_nodes):
            n = len(level)
            Bn = B * n
            toks = jnp.concatenate([node_tokens[j] for j in level])  # [Bn]
            if d == 0:
                hfeed = prev_hidden
            else:
                hfeed = jnp.concatenate(
                    [node_hidden[tree.parents[j]] for j in level]
                )
            slots = jnp.concatenate([win_slots[:, j] for j in level])
            rpos = jnp.concatenate([rope_pos[:, j] for j in level])
            mpos = jnp.concatenate([mask_pos[:, j] for j in level])
            pt = jnp.tile(fb.page_table, (n, 1))
            meta = AttnMeta(
                q_lens=jnp.ones(Bn, jnp.int32),
                q_start=mpos,
                block_seq=jnp.arange(Bn, dtype=jnp.int32),
                block_row=jnp.arange(Bn, dtype=jnp.int32),
                block_qofs=jnp.zeros(Bn, jnp.int32),
            )
            h, draft_kv = draft_model.step(
                draft_params,
                jnp.take(embed_w, toks, axis=0),
                hfeed,
                draft_kv,
                rpos,
                slots,
                pt,
                mpos + 1,
                meta,
                mask_positions=mpos,
                win_base=jnp.tile(base, n),
            )
            for li, j in enumerate(level):
                node_hidden[j] = h[li * B : (li + 1) * B]
            if d < tree.depth:
                k_d = tree.branching[d]
                logits = apply_linear(
                    draft_head, draft_model.pre_head(draft_params, h)
                ).astype(jnp.float32)  # [Bn, V] (or [Bn, Vh] hot vocab)
                _, topk_idx = jax.lax.top_k(logits, k_d)  # [Bn, k_d]
                if hot_map is not None:
                    topk_idx = jnp.take(hot_map, topk_idx)  # -> real ids
                for li, j in enumerate(level):
                    rows = topk_idx[li * B : (li + 1) * B]  # [B, k_d]
                    for child in range(len(tree.parents)):
                        if tree.parents[child] == j:
                            node_tokens[child] = rows[
                                :, int(tree.ranks[child])
                            ].astype(jnp.int32)

        # ---- 2. target verify over the whole tree
        window = jnp.stack([node_tokens[i] for i in range(N)], axis=1)  # [B, N]
        fb = fb._replace(input_ids=window.reshape(B * N))
        logits, kv, hidden = target_model.forward(
            params, fb, kv, return_hidden=True
        )

    # ---- 3. greedy acceptance over the tree
    g = jnp.argmax(logits.reshape(B, N, -1).astype(jnp.float32), axis=-1)
    g = g.astype(jnp.int32)  # [B, N] target's token AFTER node i
    acc = [None] * N
    acc[0] = jnp.ones(B, bool)
    for j in range(1, N):
        p = int(tree.parents[j])
        acc[j] = acc[p] & (window[:, j] == g[:, p])
    acc = jnp.stack(acc, axis=1)  # [B, N]
    depths = jnp.asarray(tree.depths, jnp.int32)  # [N]
    score = jnp.where(acc, depths[None, :], -1)
    best = jnp.argmax(score, axis=1).astype(jnp.int32)  # first deepest accepted
    accept_len = jnp.take_along_axis(score, best[:, None], axis=1)[:, 0]
    accept_len = jnp.maximum(accept_len, 0)
    next_tok = jnp.take_along_axis(g, best[:, None], axis=1)[:, 0]

    # accepted path: ancestor of `best` at each depth (static table gather)
    anc_at_depth = jnp.asarray(tree.anc_at_depth, jnp.int32)  # [N, D+1]
    path_nodes = anc_at_depth[best]  # [B, D+1]; col 0 = root
    path_tokens = jnp.take_along_axis(window, path_nodes[:, 1:], axis=1)

    # ---- 4. KV compaction: path node -> slot order (both pools)
    D_ = tree.depth
    d_idx = jnp.arange(1, D_ + 1, dtype=jnp.int32)[None, :]  # [1, D]
    on_path = d_idx <= accept_len[:, None]  # [B, D]
    src_nodes = jnp.where(on_path, path_nodes[:, 1:], d_idx)  # no-op when off
    src = jnp.take_along_axis(win_slots, src_nodes, axis=1).reshape(-1)
    dst = win_slots[:, 1 : D_ + 1].reshape(-1)
    kv = jax.tree.map(lambda a: _compact_slots(a, src, dst), kv)
    draft_kv = _compact_slots(draft_kv, src, dst)

    next_hidden = jnp.take_along_axis(
        hidden.reshape(B, N, -1), best[:, None, None], axis=1
    )[:, 0, :]

    if refresh and D_ > 0:
        # post-verify draft-extend over the accepted path (see eagle_round):
        # the compacted slots hold tree-draft entries built from draft
        # hiddens; rewrite them teacher-forced from the target's hiddens at
        # the path's parent nodes. Rows past accept_len land beyond kv_len.
        h_rows = hidden.reshape(B, N, -1)
        path_slots = win_slots[:, 1 : D_ + 1]

        def refresh_body(dkv, d):
            pos = rope_pos[:, 0] + d
            meta = AttnMeta(
                q_lens=jnp.ones(B, jnp.int32), q_start=pos,
                block_seq=jnp.arange(B, dtype=jnp.int32),
                block_row=jnp.arange(B, dtype=jnp.int32),
                block_qofs=jnp.zeros(B, jnp.int32),
            )
            tok_d = jnp.take_along_axis(
                path_tokens, (d - 1)[None, None], axis=1)[:, 0]
            prev_node = jnp.take_along_axis(
                path_nodes, (d - 1)[None, None], axis=1)[:, 0]
            h_prev = jnp.take_along_axis(
                h_rows, prev_node[:, None, None], axis=1)[:, 0, :]
            slot_d = jnp.take_along_axis(
                path_slots, (d - 1)[None, None], axis=1)[:, 0]
            _, dkv = draft_model.step(
                draft_params,
                jnp.take(embed_w, tok_d, axis=0),
                h_prev.astype(prev_hidden.dtype),
                dkv, pos, slot_d, fb.page_table, pos + 1, meta,
            )
            return dkv, None

        draft_kv, _ = jax.lax.scan(
            refresh_body, draft_kv, jnp.arange(1, D_ + 1, dtype=jnp.int32)
        )

    new_key, _ = jax.random.split(fb.rng_key)
    return (accept_len, next_tok, path_tokens, next_hidden, new_key, kv,
            draft_kv)


def _compact_slots(pool, src, dst):
    """Copy KV rows src -> dst on the slot axis. Pool layouts: 5D
    [L, C, S, H, D] (slot axis 2) or 4D chunked [L, S, CT, 128] (axis 1)."""
    if pool.ndim == 5:
        return pool.at[:, :, dst].set(pool[:, :, src])
    return pool.at[:, dst].set(pool[:, src])
