"""Lightning attention decode (MiniMax-text linear attention).

Reference: sgl-kernel/csrc/attention/lightning_attention_decode_kernel.cu —
per decode step the recurrent KV state updates with a per-head exponential
decay and a rank-1 k (x) v outer product, and the output is q contracted
against the new state:

    ratio       = exp(-slope_h)
    kv'[h]      = ratio * kv[h] + k[h] (x) v[h]         # [D, Dv]
    out[h]      = q[h] @ kv'[h]                          # [Dv]

On TPU this is a batched einsum — exactly the shape XLA fuses well; no
custom kernel needed (the CUDA kernel exists because torch eager would
materialize the [b, h, d, e] update out of place).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def lightning_attention_decode(
    q: jax.Array,  # [B, H, 1, D]
    k: jax.Array,  # [B, H, 1, D]
    v: jax.Array,  # [B, H, 1, Dv]
    past_kv: jax.Array,  # [B, H, D, Dv] f32 recurrent state
    slope: jax.Array,  # [H] or [H, 1, 1] per-head decay slopes
) -> Tuple[jax.Array, jax.Array]:
    """Returns (output [B, H, 1, Dv], new_kv [B, H, D, Dv])."""
    ratio = jnp.exp(-slope.reshape(1, -1, 1, 1).astype(jnp.float32))
    kq = k[:, :, 0].astype(jnp.float32)  # [B, H, D]
    vq = v[:, :, 0].astype(jnp.float32)  # [B, H, Dv]
    new_kv = ratio * past_kv + jnp.einsum("bhd,bhe->bhde", kq, vq)
    out = jnp.einsum("bhd,bhde->bhe", q[:, :, 0].astype(jnp.float32), new_kv)
    return out[:, :, None].astype(q.dtype), new_kv
