"""Qwen2-VL vision-language model.

Reference: srt/models/qwen2_vl.py + srt/layers/rotary_embedding.py
MRotaryEmbedding + srt/layers/attention/vision.py. Three pieces:

- a ViT whose patches carry 2D rotary positions (interleaved in
  spatial-merge-block order) and whose merger MLP folds 2x2 patch groups
  into text-hidden-size embeddings;
- M-RoPE on the language trunk: every token has (t, h, w) positions — text
  tokens carry equal components, image tokens spread over the grid — with
  frequency channels split per mrope_section;
- the usual embed_override splice for the image features (same paged-prefill
  machinery as llava.py).

Images arrive either as the HF processor's flattened-patch layout
({"pixel_values": [n_patches, C*tp*ps*ps], "image_grid_thw": [[t,h,w]]}) or
as a raw [3, H, W] array (patchified here; H and W must be multiples of
patch_size * spatial_merge_size)."""

from __future__ import annotations

import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.models.llama import LlamaForCausalLM
from semi_pd_tpu.ops.rope import MRotaryEmbedding


def _ln(x, p, eps=1e-6):
    from semi_pd_tpu.ops.elementwise import layer_norm

    return layer_norm(x, p, eps)


class Qwen2VisionTower:
    """Qwen2-VL ViT (HF Qwen2VisionTransformerPretrainedModel)."""

    def __init__(self, vcfg, out_hidden: int, dtype):
        self.embed_dim = vcfg.embed_dim
        self.depth = vcfg.depth
        self.num_heads = vcfg.num_heads
        self.head_dim = self.embed_dim // self.num_heads
        self.mlp_dim = int(vcfg.embed_dim * vcfg.mlp_ratio)
        self.in_ch = getattr(vcfg, "in_channels", 3)
        self.patch = vcfg.patch_size
        self.tpatch = getattr(vcfg, "temporal_patch_size", 2)
        self.merge = getattr(vcfg, "spatial_merge_size", 2)
        self.out_hidden = out_hidden
        self.dtype = dtype
        self.patch_in = self.in_ch * self.tpatch * self.patch * self.patch
        # 2D rotary table (theta 10000), dim head_dim/2 per axis
        half = self.head_dim // 2
        inv = 1.0 / (10000.0 ** (np.arange(0, half, 2, dtype=np.float64) / half))
        t = np.arange(4096, dtype=np.float64)
        fr = np.outer(t, inv)
        self.vcos = jnp.asarray(np.cos(fr), jnp.float32)  # [pos, head_dim/4]
        self.vsin = jnp.asarray(np.sin(fr), jnp.float32)

    def param_specs(self) -> Dict[str, Any]:
        d, E, M = self.dtype, self.embed_dim, self.mlp_dim
        sd = lambda *sh: jax.ShapeDtypeStruct(sh, d)
        blk = {
            "ln1": {"w": sd(self.depth, E), "b": sd(self.depth, E)},
            "ln2": {"w": sd(self.depth, E), "b": sd(self.depth, E)},
            "qkv": {"w": sd(self.depth, E, 3 * E), "b": sd(self.depth, 3 * E)},
            "proj": {"w": sd(self.depth, E, E), "b": sd(self.depth, E)},
            "fc1": {"w": sd(self.depth, E, M), "b": sd(self.depth, M)},
            "fc2": {"w": sd(self.depth, M, E), "b": sd(self.depth, E)},
        }
        m2 = self.merge ** 2
        return {
            "patch": {"w": sd(self.patch_in, E)},
            "blocks": blk,
            "merger": {
                "ln_q": {"w": sd(E), "b": sd(E)},
                "fc1": {"w": sd(E * m2, E * m2), "b": sd(E * m2)},
                "fc2": {"w": sd(E * m2, self.out_hidden), "b": sd(self.out_hidden)},
            },
        }

    def param_partition_specs(self) -> Dict[str, Any]:
        return jax.tree.map(lambda _: P(), self.param_specs())

    def hf_weight_plan(self) -> Dict[str, Tuple]:
        pre = "blocks.{L}."
        plan = {
            "patch_embed.proj.weight": ("patch", None, "vconv"),
            "merger.ln_q.weight": ("merger.ln_q.w", None, "none"),
            "merger.ln_q.bias": ("merger.ln_q.b", None, "none"),
            "merger.mlp.0.weight": ("merger.fc1.w", None, "t"),
            "merger.mlp.0.bias": ("merger.fc1.b", None, "none"),
            "merger.mlp.2.weight": ("merger.fc2.w", None, "t"),
            "merger.mlp.2.bias": ("merger.fc2.b", None, "none"),
            pre + "norm1.weight": ("blocks.ln1.w", None, "none"),
            pre + "norm1.bias": ("blocks.ln1.b", None, "none"),
            pre + "norm2.weight": ("blocks.ln2.w", None, "none"),
            pre + "norm2.bias": ("blocks.ln2.b", None, "none"),
            pre + "attn.qkv.weight": ("blocks.qkv.w", None, "t"),
            pre + "attn.qkv.bias": ("blocks.qkv.b", None, "none"),
            pre + "attn.proj.weight": ("blocks.proj.w", None, "t"),
            pre + "attn.proj.bias": ("blocks.proj.b", None, "none"),
            pre + "mlp.fc1.weight": ("blocks.fc1.w", None, "t"),
            pre + "mlp.fc1.bias": ("blocks.fc1.b", None, "none"),
            pre + "mlp.fc2.weight": ("blocks.fc2.w", None, "t"),
            pre + "mlp.fc2.bias": ("blocks.fc2.b", None, "none"),
        }
        return plan

    # ---------------------------------------------------------------- rope
    def _grid_pos(self, t: int, h: int, w: int) -> np.ndarray:
        """Per-patch (h, w) indices in spatial-merge-block order (HF
        Qwen2VisionTransformer.rot_pos_emb)."""
        m = self.merge
        hp = np.arange(h).reshape(h, 1).repeat(w, 1)
        wp = np.arange(w).reshape(1, w).repeat(h, 0)
        hp = hp.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).reshape(-1)
        wp = wp.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).reshape(-1)
        hp = np.tile(hp, t)
        wp = np.tile(wp, t)
        return np.stack([hp, wp], axis=1)  # [t*h*w, 2]

    def _vrope(self, x, pos):
        """x [L, heads, hd]; pos [L, 2] -> neox rope with cos/sin built from
        concat(freqs[h], freqs[w]) (HF apply_rotary_pos_emb_vision)."""
        cos = jnp.concatenate(
            [self.vcos[pos[:, 0]], self.vcos[pos[:, 1]]], axis=-1
        )[:, None, :]  # [L,1,hd/2]
        sin = jnp.concatenate(
            [self.vsin[pos[:, 0]], self.vsin[pos[:, 1]]], axis=-1
        )[:, None, :]
        xf = x.astype(jnp.float32)
        x1, x2 = jnp.split(xf, 2, axis=-1)
        return jnp.concatenate(
            [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
        ).astype(x.dtype)

    def forward(self, params, patches: jax.Array, grid: Tuple[int, int, int]):
        """patches [L, patch_in] -> merged features [L / merge^2, out_hidden]."""
        t, h, w = grid
        x = patches.astype(self.dtype) @ params["patch"]["w"]
        pos = jnp.asarray(self._grid_pos(t, h, w), jnp.int32)
        L = x.shape[0]
        for l in range(self.depth):
            bp = jax.tree.map(lambda a: a[l], params["blocks"])
            y = _ln(x, bp["ln1"])
            qkv = y @ bp["qkv"]["w"] + bp["qkv"]["b"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = self._vrope(q.reshape(L, self.num_heads, self.head_dim), pos)
            k = self._vrope(k.reshape(L, self.num_heads, self.head_dim), pos)
            v = v.reshape(L, self.num_heads, self.head_dim)
            att = jnp.einsum("lhd,mhd->hlm", q, k).astype(jnp.float32)
            att = jax.nn.softmax(att * (self.head_dim ** -0.5), axis=-1)
            o = jnp.einsum("hlm,mhd->lhd", att.astype(v.dtype), v)
            x = x + (o.reshape(L, self.embed_dim) @ bp["proj"]["w"] + bp["proj"]["b"])
            y = _ln(x, bp["ln2"])
            y = y @ bp["fc1"]["w"] + bp["fc1"]["b"]
            y = y * jax.nn.sigmoid(1.702 * y)  # quick_gelu
            x = x + (y @ bp["fc2"]["w"] + bp["fc2"]["b"])
        mp = params["merger"]
        x = _ln(x, mp["ln_q"])
        x = x.reshape(-1, self.embed_dim * self.merge ** 2)
        x = x @ mp["fc1"]["w"] + mp["fc1"]["b"]
        x = jax.nn.gelu(x, approximate=False)
        return x @ mp["fc2"]["w"] + mp["fc2"]["b"]


class Qwen25VisionTower(Qwen2VisionTower):
    """Qwen2.5-VL ViT (HF Qwen2_5_VisionTransformerPretrainedModel):
    RMSNorm blocks, SwiGLU MLP with bias, and WINDOW attention — every block
    attends within window_size x window_size pixel windows except
    fullatt_block_indexes; patches are permuted into window order
    (get_window_index) before the blocks and un-permuted after the merger."""

    def __init__(self, vcfg, out_hidden: int, dtype):
        class _Shim:
            pass

        shim = _Shim()
        shim.embed_dim = vcfg.hidden_size
        shim.depth = vcfg.depth
        shim.num_heads = vcfg.num_heads
        shim.mlp_ratio = vcfg.intermediate_size / vcfg.hidden_size
        shim.in_channels = getattr(vcfg, "in_channels", 3)
        shim.patch_size = vcfg.patch_size
        shim.temporal_patch_size = getattr(vcfg, "temporal_patch_size", 2)
        shim.spatial_merge_size = getattr(vcfg, "spatial_merge_size", 2)
        super().__init__(shim, out_hidden, dtype)
        self.mlp_dim = vcfg.intermediate_size
        self.window_size = getattr(vcfg, "window_size", 112)
        self.fullatt = set(getattr(vcfg, "fullatt_block_indexes", []) or [])

    def param_specs(self) -> Dict[str, Any]:
        d, E, M = self.dtype, self.embed_dim, self.mlp_dim
        sd = lambda *sh: jax.ShapeDtypeStruct(sh, d)
        blk = {
            "ln1": sd(self.depth, E),  # RMSNorm (no bias)
            "ln2": sd(self.depth, E),
            "qkv": {"w": sd(self.depth, E, 3 * E), "b": sd(self.depth, 3 * E)},
            "proj": {"w": sd(self.depth, E, E), "b": sd(self.depth, E)},
            "gate_up": {"w": sd(self.depth, E, 2 * M), "b": sd(self.depth, 2 * M)},
            "down": {"w": sd(self.depth, M, E), "b": sd(self.depth, E)},
        }
        m2 = self.merge ** 2
        return {
            "patch": {"w": sd(self.patch_in, E)},
            "blocks": blk,
            "merger": {
                "ln_q": sd(E),
                "fc1": {"w": sd(E * m2, E * m2), "b": sd(E * m2)},
                "fc2": {"w": sd(E * m2, self.out_hidden), "b": sd(self.out_hidden)},
            },
        }

    def hf_weight_plan(self) -> Dict[str, Tuple]:
        pre = "blocks.{L}."
        M = self.mlp_dim
        return {
            "patch_embed.proj.weight": ("patch", None, "vconv"),
            "merger.ln_q.weight": ("merger.ln_q", None, "none"),
            "merger.mlp.0.weight": ("merger.fc1.w", None, "t"),
            "merger.mlp.0.bias": ("merger.fc1.b", None, "none"),
            "merger.mlp.2.weight": ("merger.fc2.w", None, "t"),
            "merger.mlp.2.bias": ("merger.fc2.b", None, "none"),
            pre + "norm1.weight": ("blocks.ln1", None, "none"),
            pre + "norm2.weight": ("blocks.ln2", None, "none"),
            pre + "attn.qkv.weight": ("blocks.qkv.w", None, "t"),
            pre + "attn.qkv.bias": ("blocks.qkv.b", None, "none"),
            pre + "attn.proj.weight": ("blocks.proj.w", None, "t"),
            pre + "attn.proj.bias": ("blocks.proj.b", None, "none"),
            pre + "mlp.gate_proj.weight": ("blocks.gate_up.w", (0, M), "t"),
            pre + "mlp.gate_proj.bias": ("blocks.gate_up.b", (0, M), "none"),
            pre + "mlp.up_proj.weight": ("blocks.gate_up.w", (M, M), "t"),
            pre + "mlp.up_proj.bias": ("blocks.gate_up.b", (M, M), "none"),
            pre + "mlp.down_proj.weight": ("blocks.down.w", None, "t"),
            pre + "mlp.down_proj.bias": ("blocks.down.b", None, "none"),
        }

    def _window_index(self, t: int, h: int, w: int):
        """HF get_window_index: merged-token permutation into window order +
        per-window raw-patch counts."""
        m = self.merge
        lh, lw = h // m, w // m
        ws = self.window_size // m // self.patch
        idx = np.arange(t * lh * lw).reshape(t, lh, lw)
        pad_h = (-lh) % ws
        pad_w = (-lw) % ws
        padded = np.full((t, lh + pad_h, lw + pad_w), -100, np.int64)
        padded[:, :lh, :lw] = idx
        nh, nw = (lh + pad_h) // ws, (lw + pad_w) // ws
        padded = padded.reshape(t, nh, ws, nw, ws).transpose(0, 1, 3, 2, 4)
        padded = padded.reshape(t, nh * nw, ws, ws)
        seqlens = (padded != -100).sum(axis=(2, 3)).reshape(-1)
        flat = padded.reshape(-1)
        window_index = flat[flat != -100]
        return window_index, seqlens[seqlens > 0] * (m ** 2)

    def forward(self, params, patches: jax.Array, grid: Tuple[int, int, int]):
        t, h, w = grid
        x = patches.astype(self.dtype) @ params["patch"]["w"]
        pos = np.asarray(self._grid_pos(t, h, w))  # [L, 2] merged-block order
        L = x.shape[0]
        m2 = self.merge ** 2

        window_index, win_patch_counts = self._window_index(t, h, w)
        # permute raw patches (groups of m^2) into window order
        perm = (window_index[:, None] * m2 + np.arange(m2)[None, :]).reshape(-1)
        x = x[jnp.asarray(perm)]
        pos = jnp.asarray(pos[perm], jnp.int32)
        # window id per raw patch (window-attention mask)
        win_id = np.repeat(np.arange(len(win_patch_counts)), win_patch_counts)
        win_mask = jnp.asarray(win_id[:, None] == win_id[None, :])

        from semi_pd_tpu.ops.elementwise import rms_norm, silu_and_mul

        for l in range(self.depth):
            bp = jax.tree.map(lambda a: a[l], params["blocks"])
            y = rms_norm(x, bp["ln1"], 1e-6)
            qkv = y @ bp["qkv"]["w"] + bp["qkv"]["b"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = self._vrope(q.reshape(L, self.num_heads, self.head_dim), pos)
            k = self._vrope(k.reshape(L, self.num_heads, self.head_dim), pos)
            v = v.reshape(L, self.num_heads, self.head_dim)
            att = jnp.einsum("lhd,mhd->hlm", q, k).astype(jnp.float32)
            att = att * (self.head_dim ** -0.5)
            if l not in self.fullatt:
                att = jnp.where(win_mask[None], att, -jnp.inf)
            att = jax.nn.softmax(att, axis=-1)
            o = jnp.einsum("hlm,mhd->lhd", att.astype(v.dtype), v)
            x = x + (o.reshape(L, self.embed_dim) @ bp["proj"]["w"] + bp["proj"]["b"])
            y = rms_norm(x, bp["ln2"], 1e-6)
            y = silu_and_mul(y @ bp["gate_up"]["w"] + bp["gate_up"]["b"])
            x = x + (y @ bp["down"]["w"] + bp["down"]["b"])

        x = rms_norm(x, params["merger"]["ln_q"], 1e-6)
        x = x.reshape(-1, self.embed_dim * m2)
        x = x @ params["merger"]["fc1"]["w"] + params["merger"]["fc1"]["b"]
        x = jax.nn.gelu(x, approximate=False)
        x = x @ params["merger"]["fc2"]["w"] + params["merger"]["fc2"]["b"]
        # un-permute merged tokens back to original order
        return x[jnp.asarray(np.argsort(window_index))]


class Qwen2VLForConditionalGeneration(LlamaForCausalLM):
    is_multimodal = True
    uses_mrope = True
    TOWER_CLS = Qwen2VisionTower

    def __init__(self, config: ModelConfig):
        config.attention_bias = True
        super().__init__(config)
        hf = config.hf_config
        self.image_token_index = getattr(hf, "image_token_id", 151655)
        self.vision_cfg = hf.vision_config
        out_hidden = getattr(self.vision_cfg, "out_hidden_size", None) or config.hidden_size
        self.tower = self.TOWER_CLS(
            self.vision_cfg, out_hidden, self.dtype
        )
        sect = (config.rope_scaling or {}).get("mrope_section")
        if not sect:
            half = int(self.head_dim * config.partial_rotary_factor) // 2
            third = half // 3
            sect = [half - 2 * third, third, third]
        self.rope = MRotaryEmbedding(
            head_dim=self.head_dim,
            rotary_dim=int(self.head_dim * config.partial_rotary_factor),
            max_position=config.context_length,
            theta=config.rope_theta,
            mrope_section=sect,
            dtype=self.dtype,
        )

    # ------------------------------------------------------------- params
    def param_specs(self) -> Dict[str, Any]:
        specs = super().param_specs()
        specs["vision"] = self.tower.param_specs()
        return specs

    def param_partition_specs(self) -> Dict[str, Any]:
        specs = super().param_partition_specs()
        specs["vision"] = self.tower.param_partition_specs()
        return specs

    def hf_weight_plan(self) -> Dict[str, Tuple]:
        plan = super().hf_weight_plan()
        # both HF layouts: legacy "model.layers..." handled by super with
        # "model." prefix; the refactored one nests under model.language_model
        for k in list(plan):
            if k.startswith("model."):
                plan["model.language_model." + k[len("model."):]] = plan[k]
        for tmpl, act in self.tower.hf_weight_plan().items():
            plan["visual." + tmpl] = ("vision." + act[0],) + act[1:]
            plan["model.visual." + tmpl] = ("vision." + act[0],) + act[1:]
        return plan

    def postprocess_weight(self, tag: str, arr: np.ndarray):
        if tag == "vconv":
            # Conv3d [E, C, tp, ps, ps] -> flattened [C*tp*ps*ps, E]
            return {"w": arr.reshape(arr.shape[0], -1).T}
        raise KeyError(tag)

    # --------------------------------------------------------- multimodal
    def patchify(self, img: np.ndarray) -> Tuple[np.ndarray, Tuple[int, int, int]]:
        """Raw [C, H, W] (already normalized) -> HF flattened patch layout
        [grid_h*grid_w, C*tp*ps*ps] with the image repeated over the temporal
        patch (Qwen2VLImageProcessor._preprocess)."""
        ps, tp, m = self.tower.patch, self.tower.tpatch, self.tower.merge
        C, H, W = img.shape
        gh, gw = H // ps, W // ps
        x = np.tile(img[None], (tp, 1, 1, 1))  # [tp, C, H, W]
        x = x.reshape(tp, C, gh // m, m, ps, gw // m, m, ps)
        #             0   1   2       3  4   5        6  7
        x = x.transpose(2, 5, 3, 6, 1, 0, 4, 7)
        x = x.reshape(gh * gw, C * tp * ps * ps)
        return x.astype(np.float32), (1, gh, gw)

    def encode_images(self, params, patches, grid) -> jax.Array:
        return self.tower.forward(params["vision"], jnp.asarray(patches), grid)

    def n_image_tokens_for(self, grid) -> int:
        t, h, w = grid
        return t * h * w // (self.tower.merge ** 2)

    def get_mrope_positions(
        self, input_ids: List[int], grids: List[Tuple[int, int, int]]
    ) -> Tuple[np.ndarray, int]:
        """[len, 3] (t,h,w) positions + decode delta (HF get_rope_index,
        images only)."""
        m = self.tower.merge
        pos = np.zeros((len(input_ids), 3), np.int32)
        cur = 0  # next text position
        i = 0
        gi = 0
        while i < len(input_ids):
            if input_ids[i] == self.image_token_index and gi < len(grids):
                t, h, w = grids[gi]
                gi += 1
                lh, lw = h // m, w // m
                n = t * lh * lw
                ti = np.repeat(np.arange(t), lh * lw)
                hi = np.tile(np.repeat(np.arange(lh), lw), t)
                wi = np.tile(np.arange(lw), t * lh)
                pos[i : i + n, 0] = cur + ti
                pos[i : i + n, 1] = cur + hi
                pos[i : i + n, 2] = cur + wi
                cur = cur + max(t, lh, lw)
                i += n
            else:
                pos[i] = cur
                cur += 1
                i += 1
        delta = int(pos.max() + 1 - len(input_ids)) if len(input_ids) else 0
        return pos, delta

    def forward(self, params, fb, kv, return_hidden=False, all_logits=False):
        return super().forward(params, fb, kv, return_hidden, all_logits)


class Qwen2_5_VLForConditionalGeneration(Qwen2VLForConditionalGeneration):
    """Qwen2.5-VL (reference srt/models/qwen2_5_vl.py): same M-RoPE trunk as
    Qwen2-VL; the ViT gains window attention, RMSNorm and SwiGLU
    (Qwen25VisionTower)."""

    TOWER_CLS = Qwen25VisionTower
