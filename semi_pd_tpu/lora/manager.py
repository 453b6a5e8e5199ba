"""Multi-adapter LoRA serving.

Reference: srt/lora/ (~1,100 LoC — LoRAManager load/swap, batched SGemm via
Triton, adapter memory pool). TPU-native design: all adapters live stacked on
a leading adapter axis ``[Na, ...]`` (row 0 = the zero adapter), applied
per token with sort-by-adapter + ragged_dot (ops/moe.py grouped_apply) — the
same grouped-GEMM path as MoE, so no custom kernel is needed and requests
with different adapters batch together freely.

Supported targets (llama-family): q/k/v (folded into the fused qkv delta),
o_proj, gate/up (fused), down. Adapter ranks are padded to the max rank.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

# target hf module -> (our fused leaf, output slice builder)
TARGETS = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj")


class LoRAManager:
    def __init__(self, model, max_adapters: int = 8):
        self.model = model
        self.max_adapters = max_adapters
        self.names: List[str] = ["<none>"]  # index 0 = zero adapter
        self._raw: List[Dict[str, np.ndarray]] = [{}]
        self._scaling: List[float] = [0.0]
        self.lora_params: Optional[Dict[str, Any]] = None
        self.max_rank = 1

    # ------------------------------------------------------------- loading
    def load_adapter(self, name: str, path: Optional[str] = None,
                     state_dict: Optional[Dict[str, np.ndarray]] = None,
                     rank: Optional[int] = None, alpha: Optional[float] = None):
        """Register an adapter from a peft checkpoint dir or an in-memory
        state dict (torch-layout names: base_model.model.model.layers.N.
        self_attn.q_proj.lora_A.weight etc.)."""
        slot = next((i for i, n in enumerate(self.names)
                     if n is None), None)  # reuse tombstoned slots first
        if slot is None and len(self.names) >= self.max_adapters + 1:
            raise ValueError("adapter slots exhausted")
        if name in self.names:
            raise ValueError(f"LoRA adapter {name!r} already loaded")
        if path is not None:
            with open(os.path.join(path, "adapter_config.json")) as f:
                cfg = json.load(f)
            rank = cfg["r"]
            alpha = cfg.get("lora_alpha", rank)
            state_dict = {}
            import glob as _glob

            from safetensors import safe_open

            for f in _glob.glob(os.path.join(path, "*.safetensors")):
                with safe_open(f, framework="np") as sf:
                    for k in sf.keys():
                        state_dict[k] = sf.get_tensor(k)
            if not state_dict:
                import torch

                sd = torch.load(os.path.join(path, "adapter_model.bin"),
                                map_location="cpu", weights_only=True)
                state_dict = {k: v.float().numpy() for k, v in sd.items()}
        assert state_dict is not None and rank is not None
        alpha = alpha if alpha is not None else rank
        if slot is None:
            self.names.append(name)
            self._raw.append(dict(state_dict))
            self._scaling.append(alpha / rank)
            slot = len(self.names) - 1
        else:
            self.names[slot] = name
            self._raw[slot] = dict(state_dict)
            self._scaling[slot] = alpha / rank
        self._ranks = getattr(self, "_ranks", {})
        self._ranks[slot] = rank
        self.max_rank = max([1] + list(self._ranks.values()))
        self._stack()
        return slot

    def unload_adapter(self, name: str) -> int:
        """Dynamic unload (reference lora_manager.py load/swap lifecycle):
        the slot is tombstoned — other adapters keep their indices so
        in-flight requests stay valid — and is reused by the next load. The
        stacked pytree is rebuilt without the adapter's weights."""
        idx = self.adapter_index(name)
        if idx == 0:
            raise ValueError(f"unknown LoRA adapter {name!r}")
        self.names[idx] = None
        self._raw[idx] = {}
        self._scaling[idx] = 0.0
        self._ranks = getattr(self, "_ranks", {})
        self._ranks.pop(idx, None)
        self.max_rank = max([1] + list(self._ranks.values()))
        self._stack()
        return idx

    def adapter_index(self, name: Optional[str]) -> int:
        if not name:
            return 0
        try:
            return self.names.index(name)
        except ValueError:
            raise ValueError(f"unknown LoRA adapter {name!r}")

    # ------------------------------------------------------------- stacking
    def _find(self, sd: Dict[str, np.ndarray], layer: int, target: str, ab: str):
        for k, v in sd.items():
            if f"layers.{layer}." in k and f"{target}.lora_{ab}" in k:
                return v
        return None

    def _stack(self):
        """Rebuild the stacked device pytree after adapter set changes."""
        m = self.model
        c = m.config
        L = c.num_hidden_layers
        Na = len(self.names)
        r = self.max_rank
        H = c.hidden_size
        qkv_out = m.q_size + 2 * m.kv_size
        I = c.intermediate_size
        dt = m.dtype

        def zeros(*shape):
            return np.zeros(shape, dtype=np.float32)

        qkv_a = zeros(L, Na, H, 3 * r)
        qkv_b = zeros(L, Na, 3 * r, qkv_out)
        o_a = zeros(L, Na, m.q_size, r)
        o_b = zeros(L, Na, r, H)
        gu_a = zeros(L, Na, H, 2 * r)
        gu_b = zeros(L, Na, 2 * r, 2 * I)
        dn_a = zeros(L, Na, I, r)
        dn_b = zeros(L, Na, r, H)

        for ai in range(1, Na):
            if self.names[ai] is None:  # tombstoned slot: stays zero
                continue
            sd, sc = self._raw[ai], self._scaling[ai]
            for l in range(L):
                # fused qkv: separate sub-ranks per projection
                for j, t in enumerate(("q_proj", "k_proj", "v_proj")):
                    A = self._find(sd, l, t, "A")  # [r, H]
                    B = self._find(sd, l, t, "B")  # [dout, r]
                    if A is None or B is None:
                        continue
                    rr = A.shape[0]
                    qkv_a[l, ai, :, j * r : j * r + rr] = A.T
                    off = 0 if t == "q_proj" else (
                        m.q_size if t == "k_proj" else m.q_size + m.kv_size
                    )
                    qkv_b[l, ai, j * r : j * r + rr, off : off + B.shape[0]] = B.T * sc
                A = self._find(sd, l, "o_proj", "A")
                B = self._find(sd, l, "o_proj", "B")
                if A is not None and B is not None:
                    rr = A.shape[0]
                    o_a[l, ai, :, :rr] = A.T
                    o_b[l, ai, :rr, :] = B.T * sc
                for j, t in enumerate(("gate_proj", "up_proj")):
                    A = self._find(sd, l, t, "A")
                    B = self._find(sd, l, t, "B")
                    if A is None or B is None:
                        continue
                    rr = A.shape[0]
                    gu_a[l, ai, :, j * r : j * r + rr] = A.T
                    gu_b[l, ai, j * r : j * r + rr, j * I : j * I + B.shape[0]] = B.T * sc
                A = self._find(sd, l, "down_proj", "A")
                B = self._find(sd, l, "down_proj", "B")
                if A is not None and B is not None:
                    rr = A.shape[0]
                    dn_a[l, ai, :, :rr] = A.T
                    dn_b[l, ai, :rr, :] = B.T * sc

        # HOST values: device placement happens in
        # ModelRunner.install_lora (replicated over the mesh when there is
        # one, and mirrorable to multi-host followers).
        import ml_dtypes  # noqa: F401 — numpy bf16 support

        npdt = np.dtype(dt) if dt != jnp.bfloat16 else ml_dtypes.bfloat16
        self.lora_params = {
            "qkv_a": qkv_a.astype(npdt), "qkv_b": qkv_b.astype(npdt),
            "o_a": o_a.astype(npdt), "o_b": o_b.astype(npdt),
            "gate_up_a": gu_a.astype(npdt), "gate_up_b": gu_b.astype(npdt),
            "down_a": dn_a.astype(npdt), "down_b": dn_b.astype(npdt),
        }
