"""Post-load weight quantization.

Reference: srt/layers/torchao_utils.py (post-load quant) + the quantization
registry's on-the-fly paths. Walks the param pytree and replaces eligible
linear leaves with quantized (w, ws[, wz]) dicts; runs as a jitted device
program so sharded weights quantize in place without a host round trip.

Eligible leaves: 2D (or stacked [L, din, dout]) matmul weights under the
standard projection names. Embedding/lm_head/norms/router stay high
precision (accuracy-critical, reference does the same); MoE expert stacks
are quantized blockwise when requested (ragged_dot consumes dequantized
tiles — Pallas grouped dequant GEMM is the follow-up).
"""

from __future__ import annotations

import logging
from typing import Any, Dict

import jax
import jax.numpy as jnp

from semi_pd_tpu.ops.quant.fp8 import (
    quantize_fp8_blockwise,
    quantize_fp8_per_channel,
)

logger = logging.getLogger(__name__)

QUANT_LEAF_NAMES = {
    "qkv_proj", "o_proj", "gate_up", "down", "q_proj", "q_a", "q_b", "kv_a",
}


def _quant_one(w: jax.Array, method: str, group_size: int = 0):
    """Quantize a [.., din, dout] weight (leading dims = stacked layers)."""
    lead = w.shape[:-2]
    w2 = w.reshape((-1,) + w.shape[-2:])

    if method == "fp8":
        wq, ws = jax.vmap(quantize_fp8_per_channel)(w2)
    elif method == "blockwise_fp8":
        wq, ws = jax.vmap(quantize_fp8_blockwise)(w2)
    elif method == "int8":
        absmax = jnp.max(jnp.abs(w2.astype(jnp.float32)), axis=1)
        ws = jnp.maximum(absmax / 127.0, 1e-12)
        wq = jnp.clip(
            jnp.round(w2.astype(jnp.float32) / ws[:, None, :]), -127, 127
        ).astype(jnp.int8)
    elif method == "awq_int4":
        # Asymmetric group int4 (the serving format for AWQ/GPTQ
        # checkpoints — re-grouping an exactly-group-quantized tensor at the
        # same group size is lossless). Leaves match _awq_int4_matmul:
        # w int8 values 0..15, ws/wz [din/g, dout].
        din = w2.shape[1]
        g = group_size or 128
        while din % g:
            g //= 2
        wg = w2.reshape(w2.shape[0], din // g, g, -1).astype(jnp.float32)
        wmin = jnp.min(wg, axis=2)
        wmax = jnp.max(wg, axis=2)
        ws = jnp.maximum((wmax - wmin) / 15.0, 1e-12)
        wz = jnp.clip(jnp.round(-wmin / ws), 0, 15)
        wq = jnp.clip(
            jnp.round(wg / ws[:, :, None, :]) + wz[:, :, None, :], 0, 15
        ).astype(jnp.int8).reshape(w2.shape)
        return (
            wq.reshape(lead + wq.shape[1:]),
            ws.reshape(lead + ws.shape[1:]).astype(jnp.float32),
            wz.reshape(lead + wz.shape[1:]).astype(jnp.int8),
        )
    else:
        raise ValueError(f"unknown quantization {method!r}")
    return (
        wq.reshape(lead + wq.shape[1:]),
        ws.reshape(lead + ws.shape[1:]).astype(jnp.float32),
    )


def quantize_params(
    params: Dict[str, Any], method: str, group_size: int = 0
) -> Dict[str, Any]:
    n_quant = [0]

    def rec(node, name):
        if isinstance(node, dict):
            if name == "experts":
                # MoE expert stacks are raw [E, din, dout] arrays (consumed
                # by ragged_dot, not apply_linear). Store them per-channel
                # quantized ({"w", "ws"}); ops/moe.expert_weights dequantizes
                # at use, fused into the grouped GEMM's operand read. Expert
                # stacks dominate a large-MoE model's weight footprint
                # (reference: fp8 w8a8 expert path, ep_moe/layer.py).
                em = {"fp8": "fp8", "blockwise_fp8": "fp8",
                      "int8": "int8", "awq_int4": "int8"}[method]
                out = {}
                for k, v in node.items():
                    if (
                        k in ("gate_up", "down")
                        and getattr(v, "ndim", 0) >= 3
                        and v.dtype in (jnp.bfloat16, jnp.float32, jnp.float16)
                    ):
                        wq, ws = jax.jit(
                            _quant_one, static_argnums=(1, 2), donate_argnums=0
                        )(v, em, 0)
                        n_quant[0] += 1
                        out[k] = {"w": wq, "ws": ws}
                    else:
                        out[k] = rec(v, k)
                return out
            if (
                name in QUANT_LEAF_NAMES
                and "w" in node
                and getattr(node["w"], "ndim", 0) >= 2
                and node["w"].dtype in (jnp.bfloat16, jnp.float32, jnp.float16)
            ):
                res = jax.jit(
                    _quant_one, static_argnums=(1, 2), donate_argnums=0
                )(node["w"], method, group_size)
                n_quant[0] += 1
                out = dict(node)
                if len(res) == 3:
                    out["w"], out["ws"], out["wz"] = res
                else:
                    out["w"], out["ws"] = res
                return out
            return {k: rec(v, k) for k, v in node.items()}
        if isinstance(node, list):
            return [rec(v, name) for v in node]
        return node

    out = rec(params, "")
    logger.info("quantized %d linear weights to %s", n_quant[0], method)
    return out
