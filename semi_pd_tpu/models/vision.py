"""CLIP-style vision tower in JAX.

Reference: srt/layers/attention/vision.py + the vision encoders embedded in
srt/models/llava.py (HF CLIPVisionModel is the tower for llava 1.5). Full
(non-causal) attention over patches; standard pre-norm ViT blocks with
quick-GELU; feature select at a configurable hidden layer (llava uses -2).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class ClipVisionTower:
    def __init__(self, vision_config):
        g = lambda k, d=None: getattr(vision_config, k, d)
        self.hidden = g("hidden_size", 1024)
        self.inter = g("intermediate_size", 4096)
        self.layers = g("num_hidden_layers", 24)
        self.heads = g("num_attention_heads", 16)
        self.head_dim = self.hidden // self.heads
        self.image_size = g("image_size", 336)
        self.patch = g("patch_size", 14)
        self.n_patches = (self.image_size // self.patch) ** 2
        self.eps = g("layer_norm_eps", 1e-5)
        self.dtype = jnp.float32

    # ------------------------------------------------------------- specs
    def param_specs(self) -> Dict[str, Any]:
        d = self.dtype
        Hd, L = self.hidden, self.layers
        layer = {
            "ln1": {"w": jax.ShapeDtypeStruct((L, Hd), d), "b": jax.ShapeDtypeStruct((L, Hd), d)},
            "qkv": {"w": jax.ShapeDtypeStruct((L, Hd, 3 * Hd), d), "b": jax.ShapeDtypeStruct((L, 3 * Hd), d)},
            "out": {"w": jax.ShapeDtypeStruct((L, Hd, Hd), d), "b": jax.ShapeDtypeStruct((L, Hd), d)},
            "ln2": {"w": jax.ShapeDtypeStruct((L, Hd), d), "b": jax.ShapeDtypeStruct((L, Hd), d)},
            "fc1": {"w": jax.ShapeDtypeStruct((L, Hd, self.inter), d), "b": jax.ShapeDtypeStruct((L, self.inter), d)},
            "fc2": {"w": jax.ShapeDtypeStruct((L, self.inter, Hd), d), "b": jax.ShapeDtypeStruct((L, Hd), d)},
        }
        return {
            "patch_embed": {"w": jax.ShapeDtypeStruct((self.patch, self.patch, 3, Hd), d)},
            "class_embed": jax.ShapeDtypeStruct((Hd,), d),
            "pos_embed": jax.ShapeDtypeStruct((self.n_patches + 1, Hd), d),
            "pre_ln": {"w": jax.ShapeDtypeStruct((Hd,), d), "b": jax.ShapeDtypeStruct((Hd,), d)},
            "layers": layer,
        }

    def param_partition_specs(self) -> Dict[str, Any]:
        return jax.tree.map(lambda _: P(), self.param_specs())

    def hf_weight_plan(self) -> Dict[str, Tuple]:
        """CLIPVisionModel names (prefix vision_model.)."""
        pre = "vision_model."
        plan = {
            pre + "embeddings.patch_embedding.weight": ("patch_embed.w", None, "conv"),
            pre + "embeddings.class_embedding": ("class_embed", None, "none"),
            pre + "embeddings.position_embedding.weight": ("pos_embed", None, "none"),
            pre + "pre_layrnorm.weight": ("pre_ln.w", None, "none"),
            pre + "pre_layrnorm.bias": ("pre_ln.b", None, "none"),
        }
        lp = pre + "encoder.layers.{L}."
        Hd = self.hidden
        for name, leaf in (("layer_norm1", "ln1"), ("layer_norm2", "ln2")):
            plan[lp + name + ".weight"] = (f"layers.{leaf}.w", None, "none")
            plan[lp + name + ".bias"] = (f"layers.{leaf}.b", None, "none")
        for j, proj in enumerate(("q_proj", "k_proj", "v_proj")):
            plan[lp + f"self_attn.{proj}.weight"] = ("layers.qkv.w", (j * Hd, Hd), "t")
            plan[lp + f"self_attn.{proj}.bias"] = ("layers.qkv.b", (j * Hd, Hd), "none")
        plan[lp + "self_attn.out_proj.weight"] = ("layers.out.w", None, "t")
        plan[lp + "self_attn.out_proj.bias"] = ("layers.out.b", None, "none")
        plan[lp + "mlp.fc1.weight"] = ("layers.fc1.w", None, "t")
        plan[lp + "mlp.fc1.bias"] = ("layers.fc1.b", None, "none")
        plan[lp + "mlp.fc2.weight"] = ("layers.fc2.w", None, "t")
        plan[lp + "mlp.fc2.bias"] = ("layers.fc2.b", None, "none")
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
    def _ln(self, x, p):
        mu = jnp.mean(x, -1, keepdims=True)
        var = jnp.var(x, -1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + self.eps) * p["w"] + p["b"]

    def forward(
        self, params, pixel_values: jax.Array, select_layer: int = -2
    ) -> jax.Array:
        """pixel_values [N, 3, H, W] -> patch features [N, n_patches, hidden]
        from encoder layer ``select_layer`` (CLS dropped; llava's
        vision_feature_select 'default')."""
        N = pixel_values.shape[0]
        x = jnp.transpose(pixel_values, (0, 2, 3, 1))  # NHWC
        patches = jax.lax.conv_general_dilated(
            x, params["patch_embed"]["w"],
            window_strides=(self.patch, self.patch), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # [N, gh, gw, Hd]
        patches = patches.reshape(N, self.n_patches, self.hidden)
        cls = jnp.broadcast_to(params["class_embed"], (N, 1, self.hidden))
        h = jnp.concatenate([cls, patches], axis=1) + params["pos_embed"][None]
        h = self._ln(h, params["pre_ln"])

        n_run = self.layers + select_layer + 1 if select_layer < 0 else select_layer + 1

        def block(h, lp):
            y = self._ln(h, lp["ln1"])
            qkv = y @ lp["qkv"]["w"] + lp["qkv"]["b"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            S = q.shape[1]
            q = q.reshape(N, S, self.heads, self.head_dim)
            k = k.reshape(N, S, self.heads, self.head_dim)
            v = v.reshape(N, S, self.heads, self.head_dim)
            scores = jnp.einsum("nqhd,nkhd->nhqk", q, k) / np.sqrt(self.head_dim)
            attn = jnp.einsum("nhqk,nkhd->nqhd", jax.nn.softmax(scores, -1), v)
            h = h + (attn.reshape(N, S, self.hidden) @ lp["out"]["w"] + lp["out"]["b"])
            y = self._ln(h, lp["ln2"])
            y = quick_gelu(y @ lp["fc1"]["w"] + lp["fc1"]["b"])
            return h + (y @ lp["fc2"]["w"] + lp["fc2"]["b"])

        for l in range(n_run):
            lp = jax.tree.map(lambda a: a[l], params["layers"])
            h = block(h, lp)
        return h[:, 1:, :]  # drop CLS
