"""Janus-Pro (DeepSeek multimodal understanding path).

Reference: srt/models/deepseek_janus_pro.py — a SigLIP-lineage vision tower
(:~VisionTransformer) feeds an MLP aligner (MlpProjector) whose outputs
replace the <image_placeholder> tokens of a llama trunk. The image
GENERATION path (VQ tokenizer + generation head) is a diffusion-free
autoregressive image decoder the reference ships but does not serve through
its OpenAI surface; this framework serves the understanding path and skips
the VQ weights (the loader ignores unmatched tensors).

Parity target: transformers' in-library JanusForConditionalGeneration
(vision tower + aligner + llama trunk with spliced image features).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.models.llama import LlamaForCausalLM
from semi_pd_tpu.models.minicpmv import Idefics2VisionTower


class JanusProForCausalLM:
    is_multimodal = True

    def __init__(self, config: ModelConfig):
        self.config = config
        hf = config.hf_config
        vcfg = hf.vision_config
        if getattr(vcfg, "use_qk_norm", False):
            raise NotImplementedError("janus use_qk_norm checkpoints")
        self.vision_cfg = vcfg
        self.image_token_index = getattr(hf, "image_token_id", None)
        if self.image_token_index is None:
            self.image_token_index = getattr(hf, "image_token_index", 100581)

        lm_cfg = ModelConfig.from_hf_config(hf.text_config, dtype=config.dtype)
        self.lm = LlamaForCausalLM(lm_cfg)
        self.dtype = self.lm.dtype
        self.tower = Idefics2VisionTower(
            vcfg, self.dtype, act_tanh=False, pos_bucketize=False,
            out_proj_name="projection_layer",
        )
        self.proj_dim = getattr(vcfg, "projection_dim", lm_cfg.hidden_size)
        self.aligner_depth = getattr(vcfg, "depth", 2)

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
        return self.tower.side ** 2

    def param_specs(self) -> Dict[str, Any]:
        d = self.dtype
        sd = lambda *sh: jax.ShapeDtypeStruct(sh, d)
        Hv, Pd = self.tower.E, self.proj_dim
        aligner = {"fc1": {"w": sd(Hv, Pd), "b": sd(Pd)}}
        for i in range(self.aligner_depth - 1):
            aligner["h%d" % i] = {"w": sd(Pd, Pd), "b": sd(Pd)}
        return {
            "vision": self.tower.param_specs(),
            "aligner": aligner,
            "lm": self.lm.param_specs(),
        }

    def param_partition_specs(self) -> Dict[str, Any]:
        return {
            "vision": jax.tree.map(lambda _: P(), self.tower.param_specs()),
            "aligner": jax.tree.map(
                lambda _: P(), self.param_specs()["aligner"]),
            "lm": self.lm.param_partition_specs(),
        }

    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        rng = np.random.default_rng(seed)
        return jax.tree.map(
            lambda s: jnp.asarray(
                rng.standard_normal(s.shape, dtype=np.float32) * 0.02, s.dtype
            ),
            self.param_specs(),
        )

    def hf_weight_plan(self) -> Dict[str, Tuple]:
        plan = {}
        for tmpl, (path, sl, tf) in self.tower.hf_weight_plan().items():
            plan["model.vision_model." + tmpl] = ("vision." + path, sl, tf)
        plan["model.aligner.fc1.weight"] = ("aligner.fc1.w", None, "t")
        plan["model.aligner.fc1.bias"] = ("aligner.fc1.b", None, "none")
        for i in range(self.aligner_depth - 1):
            plan["model.aligner.hidden_layers.%d.weight" % i] = (
                "aligner.h%d.w" % i, None, "t")
            plan["model.aligner.hidden_layers.%d.bias" % i] = (
                "aligner.h%d.b" % i, None, "none")
        for tmpl, (path, sl, tf) in self.lm.hf_weight_plan().items():
            # HF Janus: model.language_model.layers... + top-level lm_head
            if tmpl.startswith("model."):
                plan["model.language_model." + tmpl[len("model."):]] = (
                    "lm." + path, sl, tf)
            else:
                plan[tmpl] = ("lm." + path, sl, tf)
        return plan

    def postprocess_weight(self, tag: str, arr: np.ndarray):
        if tag == "mllama_conv":
            return {"w": arr.reshape(arr.shape[0], -1).T}
        raise KeyError(tag)

    # --------------------------------------------------------- multimodal
    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        """[N, C, H, W] -> [N, n_patches, lm_hidden] aligned features
        (reference deepseek_janus_pro.py prepare_inputs_embeds: aligner over
        vision features, scattered at placeholder ids)."""
        outs = []
        for i in range(pixel_values.shape[0]):
            x = self.tower.forward(params["vision"], pixel_values[i])
            a = params["aligner"]
            x = x @ a["fc1"]["w"] + a["fc1"]["b"]
            for j in range(self.aligner_depth - 1):
                x = jax.nn.gelu(x, approximate=False)
                x = x @ a["h%d" % j]["w"] + a["h%d" % j]["b"]
            outs.append(x)
        return jnp.stack(outs)

    # ------------------------------------------------------------ forward
    def forward(self, params, fb, kv, return_hidden: bool = False,
                all_logits: bool = False):
        return self.lm.forward(params["lm"], fb, kv, return_hidden, all_logits)

    def forward_embedding(self, params, fb, kv):
        return self.lm.forward_embedding(params["lm"], fb, kv)
