"""FP8 weight quantization and matmuls.

Reference: sgl-kernel csrc/gemm/fp8_gemm_kernel.cu (per-tensor/per-channel
cutlass scaled_mm, 859 LoC), fp8_blockwise_gemm_kernel.cu (DeepSeek-style
128x128 block scales), per_*_quant_fp8.cu (activation quant), and the Triton
w8a8_block_fp8_matmul in srt/layers/quantization/fp8_kernel.py.

TPU-native: jnp paths here let XLA fuse dequant into the matmul epilogue
(fp8->bf16 convert + per-channel scale is a cheap elementwise preamble the
compiler folds into the MXU feed); the Pallas block-dequant kernel takes over
when tiles must be dequantized in VMEM (128x128 block scales).

v5e MXU natively multiplies bf16; fp8 here is a *memory* format (halves
weight HBM traffic, the serving bottleneck for small batches).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

FP8_MAX = 448.0  # e4m3 finite max


def quantize_fp8_per_channel(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """[din, dout] -> (fp8 [din, dout], scale [dout] f32): w ≈ w_q * scale."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scale = jnp.maximum(absmax / FP8_MAX, 1e-12)
    wq = (w.astype(jnp.float32) / scale[None, :]).astype(jnp.float8_e4m3fn)
    return wq, scale.astype(jnp.float32)


def quantize_fp8_blockwise(
    w: jax.Array, block: int = 128
) -> Tuple[jax.Array, jax.Array]:
    """[din, dout] -> (fp8, scales [ceil(din/b), ceil(dout/b)] f32) with
    per-128x128-block scales (DeepSeek-V3 format)."""
    din, dout = w.shape
    pi = (-din) % block
    po = (-dout) % block
    wp = jnp.pad(w.astype(jnp.float32), ((0, pi), (0, po)))
    nb_i, nb_o = wp.shape[0] // block, wp.shape[1] // block
    blocks = wp.reshape(nb_i, block, nb_o, block)
    absmax = jnp.max(jnp.abs(blocks), axis=(1, 3))
    scale = jnp.maximum(absmax / FP8_MAX, 1e-12)  # [nb_i, nb_o]
    wq = (blocks / scale[:, None, :, None]).reshape(wp.shape)
    wq = wq[:din, :dout].astype(jnp.float8_e4m3fn)
    return wq, scale.astype(jnp.float32)


def blockwise_fp8_matmul(
    x: jax.Array, w: jax.Array, ws: jax.Array, block: int = 128
) -> jax.Array:
    """x [T, din] @ dequant(w fp8 [din, dout], ws [din/b, dout/b])."""
    din, dout = w.shape
    # Expand block scales to full resolution; XLA fuses this into the
    # convert+matmul. (Pallas tile-dequant kernel replaces this on TPU for
    # large dout where the expanded scale bandwidth would matter.)
    si = jnp.repeat(ws, block, axis=0)[:din]
    so = jnp.repeat(si, block, axis=1)[:, :dout]
    wd = (w.astype(jnp.float32) * so).astype(x.dtype)
    return jnp.dot(x, wd, preferred_element_type=jnp.float32).astype(x.dtype)


def quantize_fp8_per_token(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Activation quant: [T, d] -> (fp8, scale [T] f32). (reference
    per_token_quant_fp8.cu)."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(absmax / FP8_MAX, 1e-12)
    xq = (x.astype(jnp.float32) / scale[:, None]).astype(jnp.float8_e4m3fn)
    return xq, scale
