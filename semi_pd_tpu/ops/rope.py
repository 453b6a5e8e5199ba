"""Rotary position embeddings.

Reference: python/sglang/srt/layers/rotary_embedding.py (1,276 LoC covering
every RoPE family). TPU-native approach: precompute the fp32 cos/sin cache
once at model build (a [max_pos, rot_dim] table), gather rows by absolute
position inside the jitted step, and apply with pure jnp — XLA fuses this
into the surrounding projections, so no custom kernel is warranted
(reference's in-place rope.cu kernel exists only to avoid torch op overhead).

Supported families: default (GPT-NeoX interleaving), llama3 scaling, yarn
(incl. DeepSeek-yarn mscale), linear scaling, and partial-rotary.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _default_inv_freq(rot_dim: int, theta: float) -> np.ndarray:
    return 1.0 / (theta ** (np.arange(0, rot_dim, 2, dtype=np.float64) / rot_dim))


def _llama3_scale_inv_freq(inv_freq: np.ndarray, scaling: Dict[str, Any]) -> np.ndarray:
    # reference rotary_embedding.py Llama3RotaryEmbedding
    factor = scaling.get("factor", 8.0)
    low_factor = scaling.get("low_freq_factor", 1.0)
    high_factor = scaling.get("high_freq_factor", 4.0)
    old_ctx = scaling.get("original_max_position_embeddings", 8192)
    low_wavelen = old_ctx / low_factor
    high_wavelen = old_ctx / high_factor
    wavelen = 2 * math.pi / inv_freq
    out = np.where(wavelen > low_wavelen, inv_freq / factor, inv_freq)
    smooth = (old_ctx / wavelen - low_factor) / (high_factor - low_factor)
    smoothed = (1 - smooth) / factor * inv_freq + smooth * inv_freq
    mid = (wavelen <= low_wavelen) & (wavelen >= high_wavelen)
    return np.where(mid, smoothed, out)


def _yarn_find_dim(num_rot: float, rot_dim: int, theta: float, max_pos: int) -> float:
    return (rot_dim * math.log(max_pos / (num_rot * 2 * math.pi))) / (2 * math.log(theta))


def _yarn_inv_freq(
    rot_dim: int, theta: float, scaling: Dict[str, Any]
) -> Tuple[np.ndarray, float]:
    # reference rotary_embedding.py YaRNScalingRotaryEmbedding /
    # DeepseekScalingRotaryEmbedding
    factor = scaling.get("factor", 1.0)
    orig_max = scaling.get("original_max_position_embeddings", 4096)
    beta_fast = scaling.get("beta_fast", 32)
    beta_slow = scaling.get("beta_slow", 1)
    extrapolation = 1.0 / (theta ** (np.arange(0, rot_dim, 2, dtype=np.float64) / rot_dim))
    interpolation = extrapolation / factor
    low = max(math.floor(_yarn_find_dim(beta_fast, rot_dim, theta, orig_max)), 0)
    high = min(math.ceil(_yarn_find_dim(beta_slow, rot_dim, theta, orig_max)), rot_dim - 1)
    ramp = np.clip(
        (np.arange(rot_dim // 2, dtype=np.float64) - low) / max(high - low, 0.001), 0, 1
    )
    mask = 1.0 - ramp
    inv_freq = interpolation * (1 - mask) + extrapolation * mask

    mscale_all_dim = scaling.get("mscale_all_dim", 0.0)
    mscale_cfg = scaling.get("mscale", 1.0)

    def _ys(scale, m):
        if scale <= 1:
            return 1.0
        return 0.1 * m * math.log(scale) + 1.0

    if mscale_all_dim:
        # DeepSeek-yarn attention scale adjustment
        mscale = _ys(factor, mscale_cfg) / _ys(factor, mscale_all_dim)
    else:
        mscale = _ys(factor, 1.0)
    return inv_freq, mscale


class RotaryEmbedding:
    """Holds a precomputed cos/sin cache; applied positionally per token."""

    def __init__(
        self,
        head_dim: int,
        rotary_dim: Optional[int] = None,
        max_position: int = 8192,
        theta: float = 10000.0,
        rope_scaling: Optional[Dict[str, Any]] = None,
        is_neox_style: bool = True,
        dtype: jnp.dtype = jnp.bfloat16,
    ):
        self.head_dim = head_dim
        self.rotary_dim = rotary_dim or head_dim
        self.is_neox_style = is_neox_style
        self.mscale = 1.0

        inv_freq = _default_inv_freq(self.rotary_dim, theta)
        max_pos = max_position
        freqs = None
        if rope_scaling:
            rtype = rope_scaling.get("rope_type", rope_scaling.get("type", ""))
            if rtype == "llama3":
                inv_freq = _llama3_scale_inv_freq(inv_freq, rope_scaling)
            elif rtype in ("yarn", "deepseek_yarn"):
                inv_freq, self.mscale = _yarn_inv_freq(
                    self.rotary_dim, theta, rope_scaling
                )
                max_pos = int(
                    rope_scaling.get("original_max_position_embeddings", max_pos)
                    * rope_scaling.get("factor", 1.0)
                )
            elif rtype == "linear":
                inv_freq = inv_freq / rope_scaling.get("factor", 1.0)
            elif rtype in ("longrope", "su"):
                # Phi-3 LongRoPE (reference rotary_embedding.py
                # Phi3LongRoPEScaledRotaryEmbedding; "su" is the phi-3-small
                # spelling): per-channel short/long rescale factors;
                # positions < original_max use the short table, the rest the
                # long table; both scaled by sqrt(1 + ln(s)/ln(orig)) when
                # extended, unless the config carries explicit
                # short_mscale/long_mscale (phi-3-small does).
                orig = int(rope_scaling.get(
                    "original_max_position_embeddings", max_pos))
                short = np.asarray(rope_scaling["short_factor"], np.float64)
                longf = np.asarray(rope_scaling["long_factor"], np.float64)
                scale = max(max_pos, max_position) / orig
                if scale > 1.0:
                    self.mscale = math.sqrt(1 + math.log(scale) / math.log(orig))
                t = np.arange(max(max_pos, max_position), dtype=np.float64)
                freqs = np.where(
                    t[:, None] < orig,
                    np.outer(t, inv_freq / short),
                    np.outer(t, inv_freq / longf),
                )
                if "short_mscale" in rope_scaling or "long_mscale" in rope_scaling:
                    sm = float(rope_scaling.get("short_mscale") or 1.0)
                    lm = float(rope_scaling.get("long_mscale") or sm)
                    pos_mscale = np.where(t[:, None] < orig, sm, lm)
                    self.cos = jnp.asarray(np.cos(freqs) * pos_mscale, jnp.float32)
                    self.sin = jnp.asarray(np.sin(freqs) * pos_mscale, jnp.float32)
                    return
            # "default"/"dynamic": fall through with the base table

        if freqs is None:
            t = np.arange(max(max_pos, max_position), dtype=np.float64)
            freqs = np.outer(t, inv_freq)  # [max_pos, rot_dim/2]
        self.cos = jnp.asarray(np.cos(freqs) * self.mscale, dtype=jnp.float32)
        self.sin = jnp.asarray(np.sin(freqs) * self.mscale, dtype=jnp.float32)

    def __call__(
        self, positions: jax.Array, q: jax.Array, k: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        """positions: [T]; q: [T, Hq, D]; k: [T, Hk, D]."""
        cos = self.cos[positions][:, None, :]  # [T, 1, rot/2]
        sin = self.sin[positions][:, None, :]
        q = _apply_rope(q, cos, sin, self.rotary_dim, self.is_neox_style)
        k = _apply_rope(k, cos, sin, self.rotary_dim, self.is_neox_style)
        return q, k


def _apply_rope(x, cos, sin, rotary_dim: int, neox: bool):
    dtype = x.dtype
    rot = x[..., :rotary_dim].astype(jnp.float32)
    rest = x[..., rotary_dim:]
    if neox:
        x1, x2 = jnp.split(rot, 2, axis=-1)
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        out = jnp.concatenate([o1, o2], axis=-1)
    else:  # GPT-J interleaved
        x1 = rot[..., 0::2]
        x2 = rot[..., 1::2]
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        out = jnp.stack([o1, o2], axis=-1).reshape(rot.shape)
    out = out.astype(dtype)
    if rest.shape[-1]:
        out = jnp.concatenate([out, rest.astype(dtype)], axis=-1)
    return out


class MRotaryEmbedding(RotaryEmbedding):
    """Multimodal 3D rope (Qwen2-VL; reference: srt/layers/rotary_embedding.py
    MRotaryEmbedding). Frequency channels are split by ``mrope_section``
    [t, h, w] (halves summing to rotary_dim/2); each section reads its cos/sin
    rows from the matching position component. Text tokens carry equal
    (t,h,w) positions, so plain-text behavior reduces to 1D rope."""

    def __init__(self, *args, mrope_section=None, **kwargs):
        super().__init__(*args, **kwargs)
        assert mrope_section is not None and sum(mrope_section) == self.rotary_dim // 2
        self.mrope_section = list(mrope_section)

    def __call__(self, positions: jax.Array, q: jax.Array, k: jax.Array):
        """positions: [T, 3] (or [T] → broadcast to all components)."""
        if positions.ndim == 1:
            positions = jnp.broadcast_to(positions[:, None], (*positions.shape, 3))
        cos3 = self.cos[positions]  # [T, 3, rot/2]
        sin3 = self.sin[positions]
        idx = []
        for s, n in enumerate(self.mrope_section):
            idx.extend([s] * n)
        sel = jnp.asarray(idx, jnp.int32)  # [rot/2] component per channel
        cos = jnp.take_along_axis(cos3, sel[None, None, :], axis=1)[:, 0][:, None, :]
        sin = jnp.take_along_axis(sin3, sel[None, None, :], axis=1)[:, 0][:, None, :]
        q = _apply_rope(q, cos, sin, self.rotary_dim, self.is_neox_style)
        k = _apply_rope(k, cos, sin, self.rotary_dim, self.is_neox_style)
        return q, k
