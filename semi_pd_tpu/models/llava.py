"""LLaVA-family vision-language models.

Reference: srt/models/llava.py (+ llavavid) — CLIP vision tower, 2-layer MLP
projector, llama language model; image patch features replace the <image>
placeholder tokens in the prompt (reference ImageInputs +
multi_modality_padding.py). Here the splice happens through ForwardArrays'
embed_override/embed_mask, so prefill stays one ragged program.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.models.llama import LlamaForCausalLM
from semi_pd_tpu.models.vision import ClipVisionTower


class LlavaForConditionalGeneration:
    is_multimodal = True

    def __init__(self, config: ModelConfig):
        self.config = config
        hf = config.hf_config
        self.vision_cfg = hf.vision_config
        self.image_token_index = getattr(hf, "image_token_index", 32000)
        self.select_layer = getattr(hf, "vision_feature_layer", -2)

        self.tower = ClipVisionTower(self.vision_cfg)
        lm_cfg = ModelConfig.from_hf_config(hf.text_config, dtype=config.dtype)
        self.lm = LlamaForCausalLM(lm_cfg)
        self.dtype = self.lm.dtype

    # Runner-facing attribute delegation (guard: during __init__, before
    # self.lm exists, fall through to AttributeError instead of recursing)
    def __getattr__(self, name):
        if name == "lm":
            raise AttributeError(name)
        return getattr(self.lm, name)

    @property
    def page_size(self):
        return self.lm.page_size

    @page_size.setter
    def page_size(self, v):
        self.lm.page_size = v

    @property
    def scan_layers(self):
        return self.lm.scan_layers

    @scan_layers.setter
    def scan_layers(self, v):
        self.lm.scan_layers = v

    @property
    def n_image_tokens(self) -> int:
        return self.tower.n_patches

    def param_specs(self) -> Dict[str, Any]:
        d = self.dtype
        Hv, Ht = self.tower.hidden, self.lm.config.hidden_size
        return {
            "vision": self.tower.param_specs(),
            "proj": {
                "fc1": {"w": jax.ShapeDtypeStruct((Hv, Ht), d),
                        "b": jax.ShapeDtypeStruct((Ht,), d)},
                "fc2": {"w": jax.ShapeDtypeStruct((Ht, Ht), d),
                        "b": jax.ShapeDtypeStruct((Ht,), d)},
            },
            "lm": self.lm.param_specs(),
        }

    def param_partition_specs(self) -> Dict[str, Any]:
        return {
            "vision": self.tower.param_partition_specs(),
            "proj": {
                "fc1": {"w": P(), "b": P()},
                "fc2": {"w": P(), "b": P()},
            },
            "lm": self.lm.param_partition_specs(),
        }

    def hf_weight_plan(self) -> Dict[str, Tuple]:
        """Covers both HF layouts: legacy checkpoints
        (``language_model.model.layers...``, ``vision_tower...``) and the
        refactored one (``model.language_model.layers...``,
        ``model.vision_tower...``, top-level ``lm_head.weight``)."""
        plan = {}
        for tmpl, (path, sl, tf) in self.tower.hf_weight_plan().items():
            plan["vision_tower." + tmpl] = ("vision." + path, sl, tf)
            plan["model.vision_tower." + tmpl] = ("vision." + path, sl, tf)
        for tmpl, (path, sl, tf) in self.lm.hf_weight_plan().items():
            plan["language_model." + tmpl] = ("lm." + path, sl, tf)
            # new layout strips the inner "model." and hoists lm_head
            if tmpl.startswith("model."):
                plan["model.language_model." + tmpl[len("model."):]] = (
                    "lm." + path, sl, tf,
                )
            elif tmpl == "lm_head.weight":
                plan["lm_head.weight"] = ("lm." + path, sl, tf)
        for prefix in ("", "model."):
            plan.update({
                prefix + "multi_modal_projector.linear_1.weight": ("proj.fc1.w", None, "t"),
                prefix + "multi_modal_projector.linear_1.bias": ("proj.fc1.b", None, "none"),
                prefix + "multi_modal_projector.linear_2.weight": ("proj.fc2.w", None, "t"),
                prefix + "multi_modal_projector.linear_2.bias": ("proj.fc2.b", None, "none"),
            })
        return plan

    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        rng = np.random.default_rng(seed)
        return jax.tree.map(
            lambda s: jnp.asarray(
                rng.standard_normal(s.shape, dtype=np.float32) * 0.02, s.dtype
            ),
            self.param_specs(),
        )

    # ------------------------------------------------------------- forward
    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        """[N, 3, H, W] -> projected patch embeddings [N, n_patches, Ht]."""
        feats = self.tower.forward(
            params["vision"], pixel_values, self.select_layer
        )
        x = feats @ params["proj"]["fc1"]["w"] + params["proj"]["fc1"]["b"]
        x = jax.nn.gelu(x, approximate=False)
        return x @ params["proj"]["fc2"]["w"] + params["proj"]["fc2"]["b"]

    def forward(self, params, fb, kv, return_hidden: bool = False,
                all_logits: bool = False):
        return self.lm.forward(params["lm"], fb, kv, return_hidden, all_logits)

    def forward_embedding(self, params, fb, kv):
        return self.lm.forward_embedding(params["lm"], fb, kv)


class YiVLForCausalLM(LlavaForConditionalGeneration):
    """Yi-VL (reference srt/models/yivl.py): llava with LayerNorms after each
    projector linear (checkpoint names model.mm_projector.{0,1,3,4})."""

    def param_specs(self) -> Dict[str, Any]:
        specs = super().param_specs()
        d, Ht = self.dtype, self.lm.config.hidden_size
        specs["proj"]["ln1"] = {"w": jax.ShapeDtypeStruct((Ht,), d),
                                "b": jax.ShapeDtypeStruct((Ht,), d)}
        specs["proj"]["ln2"] = {"w": jax.ShapeDtypeStruct((Ht,), d),
                                "b": jax.ShapeDtypeStruct((Ht,), d)}
        return specs

    def param_partition_specs(self) -> Dict[str, Any]:
        specs = super().param_partition_specs()
        specs["proj"]["ln1"] = {"w": P(), "b": P()}
        specs["proj"]["ln2"] = {"w": P(), "b": P()}
        return specs

    def hf_weight_plan(self) -> Dict[str, Tuple]:
        plan = super().hf_weight_plan()
        # Yi-VL ships llama weights at top level and the projector under
        # model.mm_projector.N (reference yivl.py:70-75)
        for tmpl, (path, sl, tf) in self.lm.hf_weight_plan().items():
            plan.setdefault(tmpl, ("lm." + path, sl, tf))
        plan.update({
            "model.mm_projector.0.weight": ("proj.fc1.w", None, "t"),
            "model.mm_projector.0.bias": ("proj.fc1.b", None, "none"),
            "model.mm_projector.1.weight": ("proj.ln1.w", None, "none"),
            "model.mm_projector.1.bias": ("proj.ln1.b", None, "none"),
            "model.mm_projector.3.weight": ("proj.fc2.w", None, "t"),
            "model.mm_projector.3.bias": ("proj.fc2.b", None, "none"),
            "model.mm_projector.4.weight": ("proj.ln2.w", None, "none"),
            "model.mm_projector.4.bias": ("proj.ln2.b", None, "none"),
        })
        for tmpl, (path, sl, tf) in self.tower.hf_weight_plan().items():
            plan["model.vision_tower.vision_tower." + tmpl] = (
                "vision." + path, sl, tf)
        return plan

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        from semi_pd_tpu.ops.elementwise import layer_norm

        feats = self.tower.forward(
            params["vision"], pixel_values, self.select_layer
        )
        x = feats @ params["proj"]["fc1"]["w"] + params["proj"]["fc1"]["b"]
        x = layer_norm(x, params["proj"]["ln1"], 1e-5)
        x = jax.nn.gelu(x, approximate=False)
        x = x @ params["proj"]["fc2"]["w"] + params["proj"]["fc2"]["b"]
        return layer_norm(x, params["proj"]["ln2"], 1e-5)


class LlavaVidForCausalLM(LlavaForConditionalGeneration):
    """LLaVA-Vid (reference srt/models/llavavid.py): video frames are CLIP-
    encoded per frame, 2x2 average-pooled on the patch grid
    (mm_spatial_pool_stride), projected, and concatenated — one <image>
    placeholder expands to num_frames * pooled-patches tokens."""

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        self.pool_stride = getattr(hf, "mm_spatial_pool_stride", 2)
        self.num_frames = getattr(hf, "num_frames", 16)

    @property
    def n_image_tokens(self) -> int:
        side = self.tower.image_size // self.tower.patch
        return self.num_frames * (side // self.pool_stride) ** 2

    def hf_weight_plan(self) -> Dict[str, Tuple]:
        plan = super().hf_weight_plan()
        # llavavid checkpoints carry llama at top level + model.mm_projector
        for tmpl, (path, sl, tf) in self.lm.hf_weight_plan().items():
            plan.setdefault(tmpl, ("lm." + path, sl, tf))
        plan.update({
            "model.mm_projector.0.weight": ("proj.fc1.w", None, "t"),
            "model.mm_projector.0.bias": ("proj.fc1.b", None, "none"),
            "model.mm_projector.2.weight": ("proj.fc2.w", None, "t"),
            "model.mm_projector.2.bias": ("proj.fc2.b", None, "none"),
        })
        for tmpl, (path, sl, tf) in self.tower.hf_weight_plan().items():
            plan["model.vision_tower.vision_tower." + tmpl] = (
                "vision." + path, sl, tf)
        return plan

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        """[T, 3, H, W] frames -> [T, pooled, Ht] (flattened by the caller)."""
        T = pixel_values.shape[0]
        assert T == self.num_frames, (
            f"LlavaVid expects num_frames={self.num_frames} frames, got {T}")
        feats = self.tower.forward(
            params["vision"], pixel_values, self.select_layer
        )  # [T, n_patches, Hv]
        side = self.tower.image_size // self.tower.patch
        s = self.pool_stride
        Hv = feats.shape[-1]
        g = feats.reshape(T, side // s, s, side // s, s, Hv)
        pooled = g.mean(axis=(2, 4)).reshape(T, -1, Hv)
        x = pooled @ params["proj"]["fc1"]["w"] + params["proj"]["fc1"]["b"]
        x = jax.nn.gelu(x, approximate=False)
        return x @ params["proj"]["fc2"]["w"] + params["proj"]["fc2"]["b"]
