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
