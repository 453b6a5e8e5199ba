"""Elementwise/fused ops (reference: sgl-kernel csrc/elementwise/*.cu and
srt/layers/{layernorm,activation}.py). On TPU these are left to XLA fusion —
hand-writing Pallas for rmsnorm/silu_and_mul would only re-derive what the
compiler already fuses into neighboring matmuls (SURVEY.md §2.8 note)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """RMSNorm in fp32 accumulation (reference: fused_add_rms_norm_kernel.cu)."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return (xf * weight.astype(jnp.float32)).astype(orig_dtype)


def fused_add_rms_norm(x, residual, weight, eps: float = 1e-6):
    """Returns (normed(x+residual), x+residual)."""
    resid = (x.astype(jnp.float32) + residual.astype(jnp.float32)).astype(x.dtype)
    return rms_norm(resid, weight, eps), resid


def silu_and_mul(x: jax.Array) -> jax.Array:
    """SiLU(gate) * up over the concatenated last dim (reference activation.cu)."""
    gate, up = jnp.split(x, 2, axis=-1)
    return jax.nn.silu(gate) * up


def gelu_and_mul(x: jax.Array) -> jax.Array:
    gate, up = jnp.split(x, 2, axis=-1)
    return jax.nn.gelu(gate, approximate=True) * up


ACT2FN = {
    "silu": silu_and_mul,
    "gelu": gelu_and_mul,
    "gelu_pytorch_tanh": gelu_and_mul,
}


def layer_norm(x, p, eps):
    """Standard LayerNorm; ``p`` is {"w","b"} (gpt2/stablelm/phi) or a bare
    weight vector (cohere's bias-free LN). Same call shape as rms_norm so
    models swap it in via the norm_fn hook."""
    w = p["w"] if isinstance(p, dict) else p
    b = p.get("b") if isinstance(p, dict) else None
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)
