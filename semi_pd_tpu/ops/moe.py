"""Mixture-of-Experts feed-forward (grouped GEMM via ragged_dot).

Reference: srt/layers/moe/fused_moe_triton/fused_moe.py (1,260 LoC Triton
grouped kernel + align/sort machinery, moe_align_block_size sgl-kernel) and
ep_moe/layer.py. TPU-native approach: sort tokens by expert and use
``jax.lax.ragged_dot`` — XLA lowers it onto the MXU as a grouped matmul, so
no hand-written kernel is needed for the core GEMM; the sort/scatter
bookkeeping that sgl-kernel's moe_align_block_size.cu does on GPU is a few
jnp ops here.

Routing supports softmax top-k (mixtral/qwen2moe), sigmoid scoring with
grouped selection and routed scaling (DeepSeek-V3, reference
layers/moe/topk.py grouped_topk), and optional top-k prob renormalization.

Sharding note: expert weights [E, d, f] shard f (or d) over the "tp" mesh
axis like a dense MLP (expert-TP). True expert-parallel placement (reference
EPMoE: experts split across ranks, ep_moe/layer.py:106) maps to sharding E
over "tp" with shard_map + all-to-all dispatch — planned in parallel/ for the
DeepSeek configs.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from semi_pd_tpu.ops.elementwise import silu_and_mul


def route_topk(
    router_logits: jax.Array,  # [T, E] f32
    top_k: int,
    *,
    scoring: str = "softmax",
    norm_topk_prob: bool = False,
    n_group: Optional[int] = None,
    topk_group: Optional[int] = None,
    routed_scaling_factor: float = 1.0,
    e_score_bias: Optional[jax.Array] = None,  # [E] deepseek-v3 gate bias
    group_score_func: str = "top2",  # "top2" (v3 noaux_tc) | "max" (v2 group_limited)
):
    """Returns (weights [T, K] f32, expert_idx [T, K] i32)."""
    T, E = router_logits.shape
    logits = router_logits.astype(jnp.float32)
    if scoring == "sigmoid":
        scores = jax.nn.sigmoid(logits)
    else:
        scores = jax.nn.softmax(logits, axis=-1)

    select_scores = scores if e_score_bias is None else scores + e_score_bias[None, :]

    if n_group and topk_group and n_group > 1:
        # DeepSeek grouped routing: keep only top `topk_group` groups
        gs = select_scores.reshape(T, n_group, E // n_group)
        if group_score_func == "max":  # v2 group_limited_greedy
            top2 = gs.max(-1)  # [T, G]
        else:  # v3 noaux_tc: sum of top-2 per group
            top2 = jax.lax.top_k(gs, min(2, E // n_group))[0].sum(-1)
        grp_thresh = jax.lax.top_k(top2, topk_group)[0][:, -1:]  # [T, 1]
        grp_mask = top2 >= grp_thresh  # [T, G]
        mask = jnp.repeat(grp_mask, E // n_group, axis=1)
        select_scores = jnp.where(mask, select_scores, -jnp.inf)

    _, idx = jax.lax.top_k(select_scores, top_k)  # [T, K]
    w = jnp.take_along_axis(scores, idx, axis=1)  # weights from unbiased scores
    if norm_topk_prob:
        w = w / jnp.maximum(w.sum(-1, keepdims=True), 1e-20)
    w = w * routed_scaling_factor
    return w, idx.astype(jnp.int32)


def expert_weights(w) -> jax.Array:
    """Resolve a (possibly quantized) expert-stack leaf to a dense operand
    for ragged_dot. Quantized experts are stored as {"w": int8/fp8 [E, din,
    dout], "ws": [E, dout] per-channel scales} (model_loader/quantize.py) —
    half/quarter the HBM of bf16 stacks, which dominate a large-MoE model's
    footprint (reference: fp8 w8a8 expert kernels, ep_moe/layer.py). The
    convert+scale is elementwise on a dot operand, which XLA fuses into the
    grouped GEMM's operand read."""
    if isinstance(w, dict):
        # ws is [..., dout] per channel over stacked leading dims ([E] or
        # [L, E] before the layer scan slices L away)
        deq = w["w"].astype(jnp.float32) * w["ws"][..., None, :]
        return deq.astype(jnp.bfloat16)
    return w


def moe_ffn(
    x: jax.Array,  # [T, d]
    gate_up: jax.Array,  # [E, d, 2f] (or quantized dict — expert_weights)
    down: jax.Array,  # [E, f, d]
    weights: jax.Array,  # [T, K] f32 routing weights
    expert_idx: jax.Array,  # [T, K] i32
    act=silu_and_mul,  # gated activation over [.., 2f] (grok: gelu_and_mul)
) -> jax.Array:
    """Sort-by-expert grouped-GEMM MoE forward. [T, d] -> [T, d]."""
    gate_up = expert_weights(gate_up)
    down = expert_weights(down)
    T, d = x.shape
    E = gate_up.shape[0]
    K = weights.shape[1]
    TK = T * K

    flat_expert = expert_idx.reshape(TK)
    order = jnp.argsort(flat_expert)  # stable
    token_of = order // K  # original token for each sorted row

    xs = x[token_of]  # [TK, d] gathered (duplicated per selected expert)
    group_sizes = jnp.bincount(flat_expert, length=E)

    h = jax.lax.ragged_dot(
        xs.astype(gate_up.dtype), gate_up, group_sizes.astype(jnp.int32)
    )  # [TK, 2f]
    h = act(h)
    out_rows = jax.lax.ragged_dot(
        h, down, group_sizes.astype(jnp.int32)
    )  # [TK, d]

    w_rows = weights.reshape(TK)[order].astype(out_rows.dtype)  # [TK]
    out = jnp.zeros((T, d), out_rows.dtype).at[token_of].add(
        out_rows * w_rows[:, None]
    )
    return out.astype(x.dtype)


def grouped_apply(
    x: jax.Array,  # [T, din]
    a: jax.Array,  # [N, din, r]
    b: jax.Array,  # [N, r, dout]
    idx: jax.Array,  # [T] i32 group index per token
) -> jax.Array:
    """Per-token low-rank delta: out[t] = x[t] @ a[idx[t]] @ b[idx[t]].

    Sort-by-group + ragged_dot, the same machinery as MoE dispatch (here for
    multi-adapter LoRA; reference srt/lora/ uses batched SGemm Triton
    kernels). Group 0 is conventionally the zero adapter."""
    T, din = x.shape
    N = a.shape[0]
    order = jnp.argsort(idx)
    xs = x[order]
    group_sizes = jnp.bincount(idx, length=N).astype(jnp.int32)
    u = jax.lax.ragged_dot(xs.astype(a.dtype), a, group_sizes)  # [T, r]
    y = jax.lax.ragged_dot(u, b, group_sizes)  # [T, dout]
    return jnp.zeros_like(y).at[order].set(y).astype(x.dtype)


def moe_ffn_ep(
    x: jax.Array,  # [T, d] (replicated across the ep axis)
    gate_up: jax.Array,  # [E, d, 2f] sharded on E over `axis`
    down: jax.Array,  # [E, f, d] sharded on E
    weights: jax.Array,  # [T, K]
    expert_idx: jax.Array,  # [T, K]
    mesh,
    axis: str = "tp",
    capacity_factor: float = 2.0,
    act=silu_and_mul,
):
    """Expert-parallel MoE (reference EPMoE, layers/moe/ep_moe/layer.py:106:
    experts split across ranks + grouped GEMM). TPU-native: shard_map over the
    mesh axis; every rank sees the (replicated) token activations, sorts rows
    by expert, takes the contiguous slice that belongs to its local experts
    (static capacity C = ceil(T*K/n) * capacity_factor so shapes stay
    static), computes the local grouped GEMM, and the partial outputs are
    psum-combined. Rows beyond a rank's capacity are dropped (standard
    capacity-based MoE semantics; capacity_factor sizes the safety margin —
    uniform routing never drops at >= 1.0).
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    # Quantized expert stacks dequantize per shard INSIDE shard_map (each
    # rank converts only its local experts).
    gate_up_q, down_q = gate_up, down
    gate_up = gate_up_q["w"] if isinstance(gate_up_q, dict) else gate_up_q
    down = down_q["w"] if isinstance(down_q, dict) else down_q

    T, d = x.shape
    E = gate_up.shape[0]
    K = weights.shape[1]
    TK = T * K
    n = mesh.shape[axis]
    E_local = E // n
    C = min(int(np.ceil(TK / n * capacity_factor)), TK)
    C_PAD = C

    flat_e = expert_idx.reshape(TK)
    order = jnp.argsort(flat_e)  # stable
    # pad by C so per-rank dynamic slices never clamp (padding rows carry an
    # out-of-range expert id and zero weight -> masked in the shard)
    sorted_e = jnp.pad(flat_e[order], (0, C_PAD), constant_values=E)
    token_of = jnp.pad(order // K, (0, C_PAD))
    w_flat = jnp.pad(weights.reshape(TK)[order], (0, C_PAD))
    # start offset of each rank's expert range within the sorted rows
    counts = jnp.bincount(flat_e, length=E)
    starts = jnp.concatenate([jnp.zeros(1, counts.dtype), jnp.cumsum(counts)])

    quant = isinstance(gate_up_q, dict)

    def local(x, gu, dn, sorted_e, token_of, w_flat, starts, *scales):
        if quant:  # dequantize only this rank's expert shard
            gu = (gu.astype(jnp.float32)
                  * scales[0][..., None, :]).astype(jnp.bfloat16)
            dn = (dn.astype(jnp.float32)
                  * scales[1][..., None, :]).astype(jnp.bfloat16)
        r = jax.lax.axis_index(axis)
        e_lo = r * E_local
        begin = starts[e_lo]
        end = starts[e_lo + E_local]
        n_rows = jnp.minimum(end - begin, C)
        begin = begin.astype(jnp.int32)

        rows_tok = jax.lax.dynamic_slice_in_dim(token_of, begin, C)
        rows_e = jax.lax.dynamic_slice_in_dim(sorted_e, begin, C)
        rows_w = jax.lax.dynamic_slice_in_dim(w_flat, begin, C)
        valid = jnp.arange(C) < n_rows
        rows_w = jnp.where(valid, rows_w, 0.0)
        xs = x[rows_tok]  # [C, d]

        local_e = jnp.clip(rows_e - e_lo, 0, E_local - 1)
        # rows are sorted; local group sizes via bincount of clipped ids over
        # valid rows only
        gsz = jnp.bincount(
            jnp.where(valid, local_e, E_local), length=E_local + 1
        )[:E_local].astype(jnp.int32)
        # pad the remainder rows into the last group (weights are zeroed)
        gsz = gsz.at[E_local - 1].add(C - jnp.sum(gsz))

        h = jax.lax.ragged_dot(xs.astype(gu.dtype), gu[0:E_local], gsz)
        h = act(h)
        out_rows = jax.lax.ragged_dot(h, dn[0:E_local], gsz)  # [C, d]
        out = jnp.zeros((T, d), out_rows.dtype).at[rows_tok].add(
            out_rows * rows_w[:, None].astype(out_rows.dtype)
        )
        return jax.lax.psum(out, axis)

    other = tuple(a for a in mesh.axis_names if a != axis)
    args = [x, gate_up, down, sorted_e, token_of, w_flat, starts]
    specs = [P(), P(axis), P(axis), P(), P(), P(), P()]
    if quant:
        args += [gate_up_q["ws"], down_q["ws"]]
        specs += [P(axis), P(axis)]
    out = shard_map(
        local,
        mesh=mesh,
        in_specs=tuple(specs),
        out_specs=P(),
        check_rep=False,
    )(*args)
    return out.astype(x.dtype)
