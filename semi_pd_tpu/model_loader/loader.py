"""Checkpoint loading: HF safetensors / torch state dicts → stacked param pytrees.

Reference: python/sglang/srt/model_loader/loader.py (1,230 LoC vLLM-style
DefaultModelLoader) + weight_utils.py (801 LoC). TPU-native differences:

- Models declare a **weight plan** (hf_weight_plan()): a mapping from HF
  tensor-name templates to (pytree path, output-slice, transform). The loader
  is generic; there is no per-model load_weights() imperatively copying into
  nn.Parameters.
- Per-layer tensors land in **stacked [L, ...] host buffers** (the scan-over-
  layers layout), then each leaf is device_put once with its NamedSharding —
  on a mesh this shards during transfer, no full replica per device.
- bf16 host buffers via ml_dtypes (no torch dependency on the load path;
  torch tensors are accepted and converted when given a state_dict).
"""

from __future__ import annotations

import glob
import json
import logging
import os
import re
from typing import Any, Dict, Iterable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

logger = logging.getLogger(__name__)

_TRANSFORMS = {
    "none": lambda a: a,
    "t": lambda a: np.ascontiguousarray(a.T),  # torch [dout,din] -> x@w layout
    "conv": lambda a: np.ascontiguousarray(a.transpose(2, 3, 1, 0)),  # OIHW->HWIO
}


def _to_numpy(t) -> np.ndarray:
    """Accept numpy arrays or torch tensors (incl. bf16) without copies where
    possible."""
    if isinstance(t, np.ndarray):
        return t
    try:
        import torch

        if isinstance(t, torch.Tensor):
            t = t.detach().cpu()
            if t.dtype == torch.bfloat16:
                return t.view(torch.uint16).numpy().view(ml_dtypes.bfloat16)
            return t.numpy()
    except ImportError:
        pass
    return np.asarray(t)


def _np_dtype(jdt) -> np.dtype:
    return np.dtype(
        {
            jnp.bfloat16: ml_dtypes.bfloat16,
            jnp.float8_e4m3fn: ml_dtypes.float8_e4m3fn,
            jnp.float8_e5m2: ml_dtypes.float8_e5m2,
        }.get(jdt, jdt)
    )


def iterate_hf_weights(
    model_path: str, load_format: str = "auto"
) -> Iterator[Tuple[str, np.ndarray]]:
    """Yield (name, numpy array) from a HF checkpoint dir (safetensors
    preferred, *.bin fallback, single-file or in-dir *.gguf; reference
    weight_utils.py safetensors iter + gguf_quant_weights_iterator).
    load_format pins one family (reference --load-format): the call fails
    instead of silently falling through to another container type."""
    gguf_files = (
        [model_path] if model_path.endswith(".gguf")
        else sorted(glob.glob(os.path.join(model_path, "*.gguf")))
    )
    if load_format not in ("auto", "gguf"):
        gguf_files = []
    if gguf_files:
        from semi_pd_tpu.model_loader.gguf_reader import iterate_gguf_weights

        for f in gguf_files:
            yield from iterate_gguf_weights(f)
        return
    if load_format == "gguf":
        raise FileNotFoundError(f"no *.gguf under {model_path}")
    st_files = sorted(glob.glob(os.path.join(model_path, "*.safetensors")))
    if load_format == "pt":
        st_files = []
    elif load_format == "safetensors" and not st_files:
        raise FileNotFoundError(f"no *.safetensors under {model_path}")
    if st_files:
        from safetensors import safe_open

        for f in st_files:
            with safe_open(f, framework="np") as sf:
                for name in sf.keys():
                    try:
                        yield name, sf.get_tensor(name)
                    except (TypeError, ValueError):
                        # numpy framework can't express bf16; reopen via torch
                        import torch
                        from safetensors import safe_open as so_t

                        with so_t(f, framework="pt") as sft:
                            yield name, _to_numpy(sft.get_tensor(name))
        return
    bin_files = sorted(glob.glob(os.path.join(model_path, "*.bin")))
    if not bin_files:
        raise FileNotFoundError(f"no checkpoint files under {model_path}")
    import torch

    for f in bin_files:
        sd = torch.load(f, map_location="cpu", weights_only=True)
        for name, t in sd.items():
            yield name, _to_numpy(t)


def _get_path(tree: Dict[str, Any], dotted: str):
    """Traverse a pytree path; integer-like parts index lists (models with
    heterogeneous per-layer dicts, e.g. deepseek_v2, keep layers as a list)."""
    node = tree
    for part in dotted.split("."):
        node = node[int(part)] if part.isdigit() else node[part]
    return node


def _set_path(tree: Dict[str, Any], dotted: str, value):
    parts = dotted.split(".")
    node = tree
    for part in parts[:-1]:
        node = node[part]
    node[parts[-1]] = value


def _compile_plan(plan):
    """Compile name templates to regexes ({L}=layer idx, {E}=expert idx)."""
    compiled = []
    for tmpl, action in plan.items():
        pattern = re.escape(tmpl)
        pattern = pattern.replace(re.escape("{L}"), r"(?P<L>\d+)")
        pattern = pattern.replace(re.escape("{E}"), r"(?P<E>\d+)")
        compiled.append((re.compile("^" + pattern + "$"), tmpl, action))
    return compiled


def _apply_weights(model, compiled, weights, get_leaf) -> set:
    """Write checkpoint tensors into host leaves fetched via get_leaf(dotted).

    Shared by full load (zero-init staging tree) and partial update (lazy
    device->host pull of only the touched leaves). Returns matched templates.
    """
    matched = set()
    for name, tensor in weights:
        for rx, tmpl, (path, out_slice, transform) in compiled:
            m = rx.match(name)
            if not m:
                continue
            gd = m.groupdict()
            rpath = path
            for key in ("L", "E"):
                if key in gd:
                    rpath = rpath.replace("{%s}" % key, gd[key])
            if transform not in _TRANSFORMS:
                # Model-specific postprocess (e.g. deepseek kv_b -> absorbed
                # w_uk/w_uv split, dbrx fused experts). Returns
                # {leaf: array} or {leaf: (array, start, size)} (last-dim
                # slice) under rpath; stacked {L}/{E} dims index as usual.
                pieces = model.postprocess_weight(transform, _to_numpy(tensor))
                for leaf, val in pieces.items():
                    tgt = get_leaf(f"{rpath}.{leaf}" if leaf else rpath)
                    for key in ("L", "E"):
                        if key in gd and ("{%s}" % key) not in path:
                            tgt = tgt[int(gd[key])]
                    if isinstance(val, tuple):
                        a, start, size = val
                        tgt[..., start : start + size] = a.astype(tgt.dtype)
                    else:
                        tgt[...] = val.astype(tgt.dtype)
                matched.add(tmpl)
                break
            arr = _TRANSFORMS[transform](_to_numpy(tensor))
            dest = get_leaf(rpath)
            # Indices not consumed by path substitution index stacked leading
            # dims of the destination array ([L, ...] stacked layers, [E, ...]
            # stacked experts).
            target = dest
            for key in ("L", "E"):
                if key in gd and ("{%s}" % key) not in path:
                    target = target[int(gd[key])]
            if out_slice is not None:
                start, size = out_slice
                target[..., start : start + size] = arr.astype(target.dtype)
            else:
                target[...] = arr.astype(target.dtype)
            matched.add(tmpl)
            break
        else:
            if not name.endswith(("rotary_emb.inv_freq",)):
                logger.debug("unmatched checkpoint tensor: %s", name)
    return matched


def load_params(
    model,
    weights: Optional[Iterable[Tuple[str, Any]]] = None,
    model_path: Optional[str] = None,
    mesh: Optional[jax.sharding.Mesh] = None,
    load_format: str = "auto",
) -> Dict[str, Any]:
    """Assemble the model's param pytree from checkpoint weights.

    ``model`` must expose param_specs(), param_partition_specs(), and
    hf_weight_plan(). Exactly one of ``weights`` / ``model_path`` given.
    """
    specs = model.param_specs()
    compiled = _compile_plan(model.hf_weight_plan())

    # Host-side staging buffers in target dtype.
    host = jax.tree.map(
        lambda s: np.zeros(s.shape, dtype=_np_dtype(s.dtype)), specs
    )

    if weights is None:
        assert model_path is not None
        weights = iterate_hf_weights(model_path, load_format=load_format)

    matched = _apply_weights(model, compiled, weights, lambda p: _get_path(host, p))

    missing = {tmpl for _, tmpl, _ in compiled} - matched
    if missing:
        logger.warning("weight plan entries never matched: %s", sorted(missing))

    return device_put_params(host, model, mesh)


def update_params(
    model,
    params: Dict[str, Any],
    weights: Iterable[Tuple[str, Any]],
    mesh: Optional[jax.sharding.Mesh] = None,
) -> Dict[str, Any]:
    """Partial in-place weight update: only leaves named by ``weights`` are
    pulled to host, overwritten, and re-put (sharded) — the rest of the
    pytree is untouched. This is the semantics the reference's RL-loop paths
    need (model_runner.py:845 update_weights_from_distributed / :878
    update_weights_from_tensor update one named tensor per call); a full
    re-load there would zero every parameter not in the batch.
    """
    compiled = _compile_plan(model.hf_weight_plan())
    pulled: Dict[str, np.ndarray] = {}

    def get_leaf(dotted: str) -> np.ndarray:
        if dotted not in pulled:
            leaf = _get_path(params, dotted)
            if getattr(leaf, "is_fully_addressable", True):
                pulled[dotted] = np.array(leaf)
            else:
                # multi-host mesh: the global value spans processes; every
                # process runs the same update with the same tensors
                # (runtime/mirror.py), so this collective gather lines up
                from jax.experimental import multihost_utils

                pulled[dotted] = np.array(
                    multihost_utils.process_allgather(leaf, tiled=True))
        return pulled[dotted]

    _apply_weights(model, compiled, weights, get_leaf)

    pspecs = model.param_partition_specs() if mesh is not None else None
    for dotted, arr in pulled.items():
        if mesh is None:
            val = jnp.asarray(arr)
        else:
            val = jax.device_put(
                arr,
                jax.sharding.NamedSharding(mesh, _get_path(pspecs, dotted)),
            )
        parts = dotted.split(".")
        node = params
        for part in parts[:-1]:
            node = node[int(part)] if part.isdigit() else node[part]
        node[parts[-1] if not parts[-1].isdigit() else int(parts[-1])] = val
    return params


def device_put_params(
    host_tree: Dict[str, Any], model, mesh: Optional[jax.sharding.Mesh]
) -> Dict[str, Any]:
    """Transfer a host pytree to device(s), sharded per the model's specs."""
    if mesh is None:
        return jax.tree.map(jnp.asarray, host_tree)
    pspecs = model.param_partition_specs()

    def put(a, spec):
        return jax.device_put(a, jax.sharding.NamedSharding(mesh, spec))

    return jax.tree.map(put, host_tree, pspecs)


def device_init_params(
    model, seed: int, mesh: Optional[jax.sharding.Mesh] = None
) -> Dict[str, Any]:
    """Random-init params ON DEVICE (reference counterpart: the
    load_format=dummy path in model_loader/loader.py). Host-side init +
    per-leaf transfer moves GBs over a possibly-slow host<->device link;
    generating 0.02*normal inside one jitted program keeps the bytes in HBM
    (and shards them at materialization on a mesh)."""
    specs = model.param_specs()
    flat_specs, treedef = jax.tree.flatten(specs)

    def _init(key):
        outs = []
        for i, s in enumerate(flat_specs):
            k = jax.random.fold_in(key, i)
            if jnp.issubdtype(s.dtype, jnp.floating):
                a = 0.02 * jax.random.normal(k, s.shape, dtype=jnp.float32)
                outs.append(a.astype(s.dtype))
            else:
                outs.append(jnp.zeros(s.shape, s.dtype))
        return outs

    out_shardings = None
    if mesh is not None:
        flat_pspecs, _ = jax.tree.flatten(
            model.param_partition_specs(),
            is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec),
        )
        out_shardings = [
            jax.sharding.NamedSharding(mesh, p) for p in flat_pspecs
        ]
    leaves = jax.jit(_init, out_shardings=out_shardings)(
        jax.random.PRNGKey(seed)
    )
    return jax.tree.unflatten(treedef, leaves)
