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

Quantized layouts (dispatch by dtype + scale rank; reference:
srt/layers/quantization/*):
- fp8 per-channel: ``w`` float8_e4m3fn, ``ws`` [dout] f32
- fp8 blockwise:   ``w`` float8_e4m3fn, ``ws`` [din/b, dout/b] f32 (b=128)
- int8 w8-only:    ``w`` int8, ``ws`` [dout] f32
- awq int4:        ``w`` int8 (unpacked 4-bit), ``ws`` [din/g, dout] f32,
                   ``wz`` int8 [din/g, dout] zeros
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def apply_linear(p: Dict[str, jax.Array], x: jax.Array) -> jax.Array:
    w = p["w"]
    if w.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2):
        ws = p["ws"]
        if ws.ndim == w.ndim:  # blockwise — the format is always 128x128
            from semi_pd_tpu.ops.quant.fp8 import blockwise_fp8_matmul

            out = blockwise_fp8_matmul(x, w, ws, 128)
        else:  # per-channel
            out = jnp.dot(
                x, w.astype(x.dtype), preferred_element_type=jnp.float32
            )
            out = (out * ws.astype(jnp.float32)[None, :]).astype(x.dtype)
    elif w.dtype == jnp.int8 and "wz" in p:
        out = _awq_int4_matmul(x, w, p["ws"], p["wz"])
    elif w.dtype == jnp.int8:
        out = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
        out = (out * p["ws"].astype(jnp.float32)[None, :]).astype(x.dtype)
    else:
        out = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)
    if "b" in p and p["b"] is not None:
        out = out + p["b"].astype(out.dtype)
    return out


def _awq_int4_matmul(x, w, ws, wz):
    """AWQ int4 weight-only (reference: awq_kernel.cu dequant + gemm).
    w holds unpacked 4-bit values in int8 [din, dout]; per-group scale/zero."""
    din, dout = w.shape
    g = din // ws.shape[-2]
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
