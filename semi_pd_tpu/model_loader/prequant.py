"""Pre-quantized HF checkpoint loading (AWQ / GPTQ / compressed-tensors).

Reference: srt/layers/quantization/__init__.py registers awq/gptq/marlin/
compressed-tensors linear methods that keep the CUDA-packed layouts and run
specialized dequant GEMM kernels (awq_kernel.cu, vllm marlin). Those packings
exist for CUDA warp layouts; the TPU-idiomatic path is to **dequantize while
streaming the checkpoint** (host-side, per tensor) and then re-quantize the
assembled pytree into one of this framework's device formats (group int4 /
per-channel int8 / fp8) — same bits served, no CUDA-layout emulation.
ModelRunner picks the matching re-quantization automatically (see
model_runner._load_weights).

Formats handled:
- AWQ (quant_method "awq"): qweight [din, dout/8] int32, 8 x 4-bit per word
  in the interleave order ops/quant/int4.AWQ_ORDER; qzeros packed the same;
  scales [din/g, dout] f16. w = (q - z) * s, groups along din.
- GPTQ (quant_method "gptq"): qweight [din/8, dout] int32 packed
  sequentially along din (low nibble = first row); qzeros [din/g, dout/8]
  int32 packed sequentially along dout; scales [din/g, dout]; optional
  g_idx [din] (desc_act / act-order: per-row group index). Checkpoint
  format "gptq" (v1) stores zeros minus one (kernels add it back);
  "gptq_v2" stores them directly.
- compressed-tensors (quant_method "compressed-tensors"): per-module
  ``weight`` int8/fp8 + ``weight_scale`` (per-channel [dout, 1] or
  per-tensor scalar), transposed torch layout [dout, din].

All three stream out plain ``(name.weight, float tensor)`` pairs, so every
model's declarative weight plan (fused qkv/gate-up slices included) works
unchanged.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Any, Dict, Iterable, Iterator, Optional, Tuple

import numpy as np

from semi_pd_tpu.ops.quant.int4 import unpack_awq_int32

logger = logging.getLogger(__name__)


@dataclass
class PrequantConfig:
    method: str  # awq | gptq | compressed-tensors
    bits: int = 4
    group_size: int = 128
    sym: bool = False
    desc_act: bool = False
    zeros_plus_one: bool = False  # gptq v1 stores zero-points minus one

    @property
    def requant(self) -> Optional[str]:
        """The TPU-native serving format matching this checkpoint's intent."""
        if self.bits == 4:
            return "awq_int4"
        if self.bits == 8:
            return "int8"
        return None


def detect_prequant(quantization_config) -> Optional[PrequantConfig]:
    """Parse an HF ``quantization_config`` (dict or transformers object)."""
    qc = quantization_config
    if qc is None:
        return None
    if not isinstance(qc, dict):
        qc = {
            k: getattr(qc, k)
            for k in ("quant_method", "bits", "group_size", "sym",
                      "desc_act", "checkpoint_format", "format",
                      "config_groups", "zero_point")
            if hasattr(qc, k)
        }
    method = str(qc.get("quant_method", "")).lower()
    if method == "awq":
        return PrequantConfig(
            method="awq",
            bits=int(qc.get("bits", 4)),
            group_size=int(qc.get("group_size", 128)),
            sym=not qc.get("zero_point", True),
        )
    if method in ("gptq", "gptq_v2"):
        fmt = str(qc.get("checkpoint_format", qc.get("format", "gptq")))
        return PrequantConfig(
            method="gptq",
            bits=int(qc.get("bits", 4)),
            group_size=int(qc.get("group_size", 128)),
            sym=bool(qc.get("sym", False)),
            desc_act=bool(qc.get("desc_act", False)),
            zeros_plus_one=fmt != "gptq_v2",
        )
    if method == "compressed-tensors":
        bits = 8
        for grp in (qc.get("config_groups") or {}).values():
            w = grp.get("weights") if isinstance(grp, dict) else None
            if isinstance(w, dict) and "num_bits" in w:
                bits = int(w["num_bits"])
        return PrequantConfig(method="compressed-tensors", bits=bits)
    if method in ("fp8",):  # modelopt/fbgemm fp8: weight + weight_scale
        return PrequantConfig(method="compressed-tensors", bits=8)
    return None


def _unpack_gptq_rows(packed: np.ndarray, bits: int) -> np.ndarray:
    """[din/pf, dout] int32 -> [din, dout] uint8/16; sequential low-first
    packing along dim 0."""
    pf = 32 // bits
    p = packed.view(np.uint32)
    rows = np.empty((p.shape[0] * pf, p.shape[1]), dtype=np.uint16)
    mask = (1 << bits) - 1
    for i in range(pf):
        rows[i::pf] = ((p >> (bits * i)) & mask).astype(np.uint16)
    return rows


def _unpack_gptq_cols(packed: np.ndarray, bits: int) -> np.ndarray:
    """[g, dout/pf] int32 -> [g, dout]; sequential low-first packing along
    dim 1 (qzeros layout)."""
    pf = 32 // bits
    p = packed.view(np.uint32)
    cols = np.empty((p.shape[0], p.shape[1] * pf), dtype=np.uint16)
    mask = (1 << bits) - 1
    for i in range(pf):
        cols[:, i::pf] = ((p >> (bits * i)) & mask).astype(np.uint16)
    return cols


def _dequant_awq(parts: Dict[str, np.ndarray], cfg: PrequantConfig) -> np.ndarray:
    q = unpack_awq_int32(parts["qweight"]).astype(np.float32)  # [din, dout]
    z = unpack_awq_int32(parts["qzeros"]).astype(np.float32)  # [din/g, dout]
    s = parts["scales"].astype(np.float32)  # [din/g, dout]
    din, dout = q.shape
    g = din // s.shape[0]
    w = (q.reshape(din // g, g, dout) - z[:, None, :]) * s[:, None, :]
    return w.reshape(din, dout)


def _dequant_gptq(parts: Dict[str, np.ndarray], cfg: PrequantConfig) -> np.ndarray:
    q = _unpack_gptq_rows(parts["qweight"], cfg.bits).astype(np.float32)
    z = _unpack_gptq_cols(parts["qzeros"], cfg.bits).astype(np.float32)
    if cfg.zeros_plus_one:
        z = z + 1.0
    s = parts["scales"].astype(np.float32)  # [n_groups, dout]
    din, dout = q.shape
    g_idx = parts.get("g_idx")
    if g_idx is not None and len(g_idx):
        gi = np.asarray(g_idx, dtype=np.int64)
        return (q - z[gi]) * s[gi]
    g = din // s.shape[0]
    return ((q.reshape(din // g, g, dout) - z[:, None, :])
            * s[:, None, :]).reshape(din, dout)


def _dequant_ct(parts: Dict[str, np.ndarray], cfg: PrequantConfig) -> np.ndarray:
    w = parts["weight"]
    s = parts["weight_scale"].astype(np.float32)
    wf = w.astype(np.float32)
    if s.ndim and s.size > 1:  # per-channel [dout] / [dout, 1] (torch layout)
        wf = wf * s.reshape(-1, *([1] * (w.ndim - 1)))
    else:
        wf = wf * float(np.asarray(s).reshape(-1)[0])
    return wf


# tensor-name suffix -> (format key, emit trigger). ``scales`` sorts last
# alphabetically within a module in safetensors, but multi-file checkpoints
# give no ordering guarantee, so emission waits for the full set instead.
_AWQ_KEYS = {"qweight", "qzeros", "scales"}
_GPTQ_KEYS = {"qweight", "qzeros", "scales"}  # + optional g_idx
_CT_KEYS = {"weight", "weight_scale"}


def dequantize_stream(
    weights: Iterable[Tuple[str, np.ndarray]], cfg: PrequantConfig
) -> Iterator[Tuple[str, np.ndarray]]:
    """Adapter over a checkpoint tensor stream: groups each module's packed
    pieces, emits ``(prefix + ".weight", dequantized fp32)`` once complete,
    and passes every other tensor through untouched."""
    pending: Dict[str, Dict[str, np.ndarray]] = {}
    if cfg.method == "awq":
        keys, dequant = _AWQ_KEYS, _dequant_awq
    elif cfg.method == "gptq":
        keys, dequant = _GPTQ_KEYS, _dequant_gptq
    else:
        keys, dequant = _CT_KEYS, _dequant_ct

    aux = {"g_idx"} if cfg.method == "gptq" else set()
    if cfg.method == "compressed-tensors":
        aux = {"weight_zero_point", "input_scale", "input_zero_point"}

    for name, tensor in weights:
        suffix = name.rsplit(".", 1)[-1]
        if suffix in aux:
            prefix = name[: -(len(suffix) + 1)]
            if suffix == "g_idx":
                pending.setdefault(prefix, {})[suffix] = np.asarray(tensor)
            continue  # act-quant scales are not needed (dynamic on TPU)
        if suffix not in keys:
            yield name, tensor
            continue
        prefix = name[: -(len(suffix) + 1)]
        if cfg.method == "compressed-tensors" and suffix == "weight" and (
            np.asarray(tensor).dtype.itemsize >= 2
        ):
            # Unquantized module (norms/embeddings keep plain fp weights).
            # Gate on itemsize, not dtype.kind: ml_dtypes bfloat16 reports
            # kind 'V', and a kind-based check withheld bf16 weights forever.
            # Quantized payloads (int8 / fp8) are always 1 byte.
            yield name, tensor
            continue
        parts = pending.setdefault(prefix, {})
        parts[suffix] = np.asarray(tensor)
        if keys.issubset(parts.keys()):
            w = dequant(parts, cfg)
            if cfg.method in ("awq", "gptq"):
                # packed layouts are [din, dout]; HF plans expect the torch
                # nn.Linear [dout, din] layout (plan transforms re-transpose)
                w = np.ascontiguousarray(w.T)
            del pending[prefix]
            yield prefix + ".weight", w
    for prefix, parts in pending.items():
        logger.warning(
            "pre-quantized module %s incomplete in checkpoint (have %s)",
            prefix, sorted(parts),
        )
