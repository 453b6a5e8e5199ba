"""Linear application with quantization dispatch.

Params are plain pytrees; a "linear" is a dict with ``w`` ([din, dout],
already transposed for x @ w) plus optional ``b`` and quantization leaves.
This replaces the reference's class-per-layout scheme
(srt/layers/linear.py:ColumnParallelLinear/RowParallelLinear/... — 1,280 LoC
of process-rank bookkeeping) because on TPU tensor parallelism is expressed
by *sharding annotations on the same single-program code*, not per-rank
sliced modules: qkv/gate-up weights are sharded on dout over the ``tp`` mesh
axis, o/down on din, and XLA inserts the all-reduces the reference performs
manually after o_proj/down_proj (llama.py:204 etc.).

Quantized layouts (reference: srt/layers/quantization/*):
- fp8:  ``w`` float8_e4m3fn, ``ws`` per-channel scale [dout] f32
- int8: ``w`` int8, ``ws`` per-channel scale
- awq_int4: ``w`` int8-storing-4bit [din, dout], ``ws`` group scales
  [din/g, dout], ``wz`` group zeros [din/g, dout]
- blockwise_fp8: ``w`` fp8, ``ws`` [din/128, dout/128] block scales
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def apply_linear(p: Dict[str, jax.Array], x: jax.Array) -> jax.Array:
    w = p["w"]
    if w.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2):
        out = _fp8_matmul(x, w, p["ws"], p.get("block_size"))
    elif w.dtype == jnp.int8 and "wz" in p:
        out = _awq_int4_matmul(x, w, p["ws"], p["wz"], p.get("group_size", 128))
    elif w.dtype == jnp.int8:
        out = _int8_matmul(x, w, p["ws"])
    else:
        out = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)
    if "b" in p and p["b"] is not None:
        out = out + p["b"].astype(out.dtype)
    return out


def _fp8_matmul(x, w, ws, block_size=None):
    """FP8 weight matmul (reference: sgl-kernel fp8_gemm_kernel.cu per-channel
    path; fp8_blockwise_gemm_kernel.cu for 128x128 blocks). The jnp fallback
    dequantizes through bf16; the Pallas kernel (ops/quant/fp8.py) replaces
    this on the hot path."""
    if block_size:
        from semi_pd_tpu.ops.quant.fp8 import blockwise_fp8_matmul

        return blockwise_fp8_matmul(x, w, ws, block_size)
    out = jnp.dot(
        x, w.astype(x.dtype), preferred_element_type=jnp.float32
    )
    return (out * ws.astype(jnp.float32)[None, :]).astype(x.dtype)


def _int8_matmul(x, w, ws):
    out = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    return (out * ws.astype(jnp.float32)[None, :]).astype(x.dtype)


def _awq_int4_matmul(x, w, ws, wz, group_size: int):
    """AWQ int4 weight-only (reference: awq_kernel.cu dequant + gemm).
    w holds unpacked 4-bit values in int8 [din, dout]; per-group scale/zero."""
    din, dout = w.shape
    g = din // ws.shape[0]
    wf = w.astype(jnp.float32).reshape(din // g, g, dout)
    deq = (wf - wz.astype(jnp.float32)[:, None, :]) * ws.astype(jnp.float32)[:, None, :]
    deq = deq.reshape(din, dout).astype(x.dtype)
    return jnp.dot(x, deq, preferred_element_type=jnp.float32).astype(x.dtype)


def embedding_lookup(embed: jax.Array, ids: jax.Array) -> jax.Array:
    return jnp.take(embed, ids, axis=0)


def lm_head_logits(
    h: jax.Array, head: Dict[str, jax.Array], softcap: Optional[float] = None
) -> jax.Array:
    """h [B, d] @ lm_head -> [B, V] fp32 (reference logits_processor.py:194)."""
    logits = apply_linear(head, h).astype(jnp.float32)
    if softcap:
        logits = softcap * jnp.tanh(logits / softcap)
    return logits
