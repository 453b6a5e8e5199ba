"""Multi-host serving over jax.distributed (runtime/mirror.py).

Two REAL processes on localhost (2 CPU devices each) form a 4-device
global mesh; node 0 runs the engine, node 1 replays mirrored device
transactions. Greedy outputs must equal a single-process tp=4 run of the
same seeded model — which proves the SPMD lockstep held for packed steps,
chained overlap decode, penalty-masked steps, and fused readback.

Reference analog: multi-node serving via NCCL/ZMQ broadcast
(srt/managers/scheduler.py:645-660, server_args.py:1145-1199); the
reference has no CI for it (SURVEY §4 tier 4), this test is the
accelerator-free equivalent.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.config.server_args import ServerArgs
from semi_pd_tpu.runtime.engine import Engine
from semi_pd_tpu.sampling.sampling_params import SamplingParams

PORT = 29761

_COMMON = """
import os, sys, json
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.config.server_args import ServerArgs
from semi_pd_tpu.utils.multihost import init_multihost

def make_cfg():
    return ModelConfig(
        architecture="LlamaForCausalLM", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=4, head_dim=8, max_position_embeddings=256,
        context_length=256, dtype="float32",
    )

def make_args(rank):
    return ServerArgs(
        model_path="", random_weights=True, page_size=4,
        max_total_tokens=1024, dtype="float32", seed=7,
        tp_size=4, nnodes=2, node_rank=rank,
        dist_init_addr="localhost:%d",
    )
""" % PORT

_RANK0 = _COMMON + """
args = make_args(0)
init_multihost(args)
from semi_pd_tpu.parallel.mesh import create_mesh
from semi_pd_tpu.runtime.engine import Engine
from semi_pd_tpu.sampling.sampling_params import SamplingParams

mesh = create_mesh(tp_size=4)
eng = Engine(server_args=args, model_config=make_cfg(), mesh=mesh)
rng = np.random.default_rng(3)
prompts = [rng.integers(0, 64, size=n).tolist() for n in (12, 7, 9)]
sp = SamplingParams(max_new_tokens=12, temperature=0.0, ignore_eos=True)
outs = eng.generate(input_ids=prompts, sampling_params=sp)
# penalty path exercises the masked non-packable mirror
sp_pen = SamplingParams(max_new_tokens=8, temperature=0.0, ignore_eos=True,
                        repetition_penalty=1.3)
out_pen = eng.generate(input_ids=prompts[0], sampling_params=sp_pen)
emb = eng.encode(input_ids=prompts[0])  # mirrors the "enc" message
# online weight update (mirrored "wupb"/"wupe"): every process must apply
# the same tensors or the SPMD world desyncs and later outputs diverge
w_rng = np.random.default_rng(11)
new_embed = (w_rng.standard_normal((64, 32)) * 0.05).astype(np.float32)
eng.update_weights_from_tensor([("model.embed_tokens.weight", new_embed)])
out_upd = eng.generate(input_ids=prompts[1], sampling_params=sp)
eng.runner.close()
print("RESULT " + json.dumps(
    [o["output_ids"] for o in outs] + [out_pen["output_ids"]]
    + [[round(float(x), 5) for x in emb[:8]]]
    + [out_upd["output_ids"]]))
"""

_RANK1 = _COMMON + """
from semi_pd_tpu.runtime.mirror import follower_main
args = make_args(1)
follower_main(args, model_config=make_cfg())
print("FOLLOWER DONE")
"""


def test_two_process_multihost_matches_single_process(tmp_path):
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "XLA_FLAGS", "JAX_PLATFORMS",
                     "JAX_NUM_CPU_DEVICES")
    }
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))

    r0 = subprocess.Popen([sys.executable, "-c", _RANK0],
                          stdout=subprocess.PIPE,
                          stderr=subprocess.PIPE, env=env, text=True)
    r1 = subprocess.Popen([sys.executable, "-c", _RANK1],
                          stdout=subprocess.PIPE,
                          stderr=subprocess.PIPE, env=env, text=True)
    out0, err0 = r0.communicate(timeout=420)
    out1, err1 = r1.communicate(timeout=120)
    assert r0.returncode == 0, f"rank0 failed:\n{err0[-3000:]}"
    assert r1.returncode == 0, f"rank1 failed:\n{err1[-3000:]}"
    assert "FOLLOWER DONE" in out1
    line = [l for l in out0.splitlines() if l.startswith("RESULT ")][0]
    got = json.loads(line[len("RESULT "):])

    # single-process tp=4 baseline on this process's virtual devices
    from semi_pd_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(tp_size=4)
    cfg = ModelConfig(
        architecture="LlamaForCausalLM", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=4, head_dim=8, max_position_embeddings=256,
        context_length=256, dtype="float32",
    )
    eng = Engine(server_args=ServerArgs(
        model_path="", random_weights=True, page_size=4,
        max_total_tokens=1024, dtype="float32", seed=7, tp_size=4,
    ), model_config=cfg, mesh=mesh)
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, 64, size=n).tolist() for n in (12, 7, 9)]
    sp = SamplingParams(max_new_tokens=12, temperature=0.0, ignore_eos=True)
    want = [o["output_ids"] for o in eng.generate(
        input_ids=prompts, sampling_params=sp)]
    sp_pen = SamplingParams(max_new_tokens=8, temperature=0.0,
                            ignore_eos=True, repetition_penalty=1.3)
    want.append(eng.generate(
        input_ids=prompts[0], sampling_params=sp_pen)["output_ids"])
    emb = eng.encode(input_ids=prompts[0])
    want.append([round(float(x), 5) for x in emb[:8]])
    w_rng = np.random.default_rng(11)
    new_embed = (w_rng.standard_normal((64, 32)) * 0.05).astype(np.float32)
    eng.update_weights_from_tensor([("model.embed_tokens.weight", new_embed)])
    want.append(eng.generate(
        input_ids=prompts[1], sampling_params=sp)["output_ids"])
    assert got == want


_RANK0_DP = _COMMON + """
args = make_args(0)
args.tp_size = 2; args.dp_size = 2; args.enable_dp_attention = True
args.__post_init__()
init_multihost(args)
from semi_pd_tpu.parallel.mesh import create_mesh
from semi_pd_tpu.runtime.engine import Engine
from semi_pd_tpu.sampling.sampling_params import SamplingParams

mesh = create_mesh(tp_size=2, dp_size=2)
eng = Engine(server_args=args, model_config=make_cfg(), mesh=mesh)
rng = np.random.default_rng(5)
prompts = [rng.integers(0, 64, size=n).tolist() for n in (11, 8, 13, 6)]
sp = SamplingParams(max_new_tokens=10, temperature=0.0, ignore_eos=True)
outs = eng.generate(input_ids=prompts, sampling_params=sp)
eng.runner.close()
print("RESULT " + json.dumps([o["output_ids"] for o in outs]))
"""

_RANK1_DP = _COMMON + """
from semi_pd_tpu.runtime.mirror import follower_main
args = make_args(1)
args.tp_size = 2; args.dp_size = 2; args.enable_dp_attention = True
args.__post_init__()
follower_main(args, model_config=make_cfg())
print("FOLLOWER DONE")
"""


def test_two_process_dp_attention_matches_single_process():
    """DP-attention over two processes (the spdp mirror branch): requests
    and the KV slot axis shard over "dp" spanning hosts."""
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "XLA_FLAGS", "JAX_PLATFORMS",
                     "JAX_NUM_CPU_DEVICES")
    }
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    r0 = subprocess.Popen(
        [sys.executable, "-c", _RANK0_DP.replace(str(PORT), str(PORT + 2))],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
    r1 = subprocess.Popen(
        [sys.executable, "-c", _RANK1_DP.replace(str(PORT), str(PORT + 2))],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
    out0, err0 = r0.communicate(timeout=420)
    out1, err1 = r1.communicate(timeout=120)
    assert r0.returncode == 0, f"rank0 failed:\n{err0[-3000:]}"
    assert r1.returncode == 0, f"rank1 failed:\n{err1[-3000:]}"
    line = [l for l in out0.splitlines() if l.startswith("RESULT ")][0]
    got = json.loads(line[len("RESULT "):])

    from semi_pd_tpu.parallel.mesh import create_mesh

    cfg = ModelConfig(
        architecture="LlamaForCausalLM", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=4, head_dim=8, max_position_embeddings=256,
        context_length=256, dtype="float32",
    )
    eng = Engine(server_args=ServerArgs(
        model_path="", random_weights=True, page_size=4,
        max_total_tokens=1024, dtype="float32", seed=7,
        tp_size=2, dp_size=2, enable_dp_attention=True,
    ), model_config=cfg, mesh=create_mesh(tp_size=2, dp_size=2))
    rng = np.random.default_rng(5)
    prompts = [rng.integers(0, 64, size=n).tolist() for n in (11, 8, 13, 6)]
    sp = SamplingParams(max_new_tokens=10, temperature=0.0, ignore_eos=True)
    want = [o["output_ids"] for o in eng.generate(
        input_ids=prompts, sampling_params=sp)]
    assert got == want


_VLM_SETUP = """
from transformers import CLIPVisionConfig, LlamaConfig, LlavaConfig

def make_vlm_cfg():
    vision = CLIPVisionConfig(
        hidden_size=48, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=16,
        projection_dim=32)
    text = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256, tie_word_embeddings=False)
    cfg = LlavaConfig(
        vision_config=vision, text_config=text, image_token_index=100,
        vision_feature_layer=-2, vision_feature_select_strategy="default")
    cfg.architectures = ["LlavaForConditionalGeneration"]
    mc = ModelConfig.from_hf_config(cfg, dtype="float32")
    mc.architecture = "LlavaForConditionalGeneration"
    mc.is_multimodal = True
    mc.hf_config = cfg
    return mc
"""

_RANK0_VLM = _COMMON + _VLM_SETUP + """
args = make_args(0)
init_multihost(args)
from semi_pd_tpu.parallel.mesh import create_mesh
from semi_pd_tpu.runtime.engine import Engine
from semi_pd_tpu.sampling.sampling_params import SamplingParams

mesh = create_mesh(tp_size=4)
eng = Engine(server_args=args, model_config=make_vlm_cfg(), mesh=mesh)
rng = np.random.default_rng(9)
img = rng.normal(size=(3, 32, 32)).astype(np.float32)
prompt = [5, 6, 100, 7, 8, 9]
sp = SamplingParams(max_new_tokens=8, temperature=0.0, ignore_eos=True)
out = eng.generate(input_ids=prompt, sampling_params=sp, image_data=img)
eng.runner.close()
print("RESULT " + json.dumps(out["output_ids"]))
"""

_RANK1_VLM = _COMMON + _VLM_SETUP + """
from semi_pd_tpu.runtime.mirror import follower_main
args = make_args(1)
follower_main(args, model_config=make_vlm_cfg())
print("FOLLOWER DONE")
"""


def test_two_process_multimodal_matches_single_process():
    """Multimodal over two processes (the img mirror branch): the vision
    encode runs in lockstep on every process and the spliced embeddings
    ride the host batch."""
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "XLA_FLAGS", "JAX_PLATFORMS",
                     "JAX_NUM_CPU_DEVICES")
    }
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    r0 = subprocess.Popen(
        [sys.executable, "-c", _RANK0_VLM.replace(str(PORT), str(PORT + 4))],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
    r1 = subprocess.Popen(
        [sys.executable, "-c", _RANK1_VLM.replace(str(PORT), str(PORT + 4))],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
    out0, err0 = r0.communicate(timeout=420)
    out1, err1 = r1.communicate(timeout=120)
    assert r0.returncode == 0, f"rank0 failed:\n{err0[-3000:]}"
    assert r1.returncode == 0, f"rank1 failed:\n{err1[-3000:]}"
    got = json.loads(
        [l for l in out0.splitlines() if l.startswith("RESULT ")][0][7:])

    from semi_pd_tpu.parallel.mesh import create_mesh
    from transformers import CLIPVisionConfig, LlamaConfig, LlavaConfig

    vision = CLIPVisionConfig(
        hidden_size=48, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=16,
        projection_dim=32)
    text = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256, tie_word_embeddings=False)
    hf_cfg = LlavaConfig(
        vision_config=vision, text_config=text, image_token_index=100,
        vision_feature_layer=-2, vision_feature_select_strategy="default")
    hf_cfg.architectures = ["LlavaForConditionalGeneration"]
    mc = ModelConfig.from_hf_config(hf_cfg, dtype="float32")
    mc.architecture = "LlavaForConditionalGeneration"
    mc.is_multimodal = True
    mc.hf_config = hf_cfg
    eng = Engine(server_args=ServerArgs(
        model_path="", random_weights=True, page_size=4,
        max_total_tokens=1024, dtype="float32", seed=7, tp_size=4,
    ), model_config=mc, mesh=create_mesh(tp_size=4))
    rng = np.random.default_rng(9)
    img = rng.normal(size=(3, 32, 32)).astype(np.float32)
    out = eng.generate(
        input_ids=[5, 6, 100, 7, 8, 9],
        sampling_params=SamplingParams(max_new_tokens=8, temperature=0.0,
                                       ignore_eos=True),
        image_data=img)
    assert got == out["output_ids"]


_RANK0_SPEC = _COMMON + """
args = make_args(0)
args.speculative_algorithm = "EAGLE"
args.speculative_num_draft_tokens = 3
args.__post_init__()
init_multihost(args)
from semi_pd_tpu.parallel.mesh import create_mesh
from semi_pd_tpu.runtime.engine import Engine
from semi_pd_tpu.sampling.sampling_params import SamplingParams

mesh = create_mesh(tp_size=4)
eng = Engine(server_args=args, model_config=make_cfg(), mesh=mesh)
rng = np.random.default_rng(13)
prompts = [rng.integers(0, 64, size=n).tolist() for n in (10, 7)]
sp = SamplingParams(max_new_tokens=10, temperature=0.0, ignore_eos=True)
outs = eng.generate(input_ids=prompts, sampling_params=sp)
eng.runner.close()
print("RESULT " + json.dumps(
    [[o["output_ids"] for o in outs], eng.scheduler.n_spec_steps]))
"""

_RANK1_SPEC = _COMMON + """
from semi_pd_tpu.runtime.mirror import follower_main
args = make_args(1)
args.speculative_algorithm = "EAGLE"
args.speculative_num_draft_tokens = 3
args.__post_init__()
follower_main(args, model_config=make_cfg())
print("FOLLOWER DONE")
"""


def test_two_process_eagle_matches_single_process():
    """EAGLE speculative decoding over two processes (the eag/hid mirror
    branches): fused draft+verify rounds replay in lockstep."""
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "XLA_FLAGS", "JAX_PLATFORMS",
                     "JAX_NUM_CPU_DEVICES")
    }
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    r0 = subprocess.Popen(
        [sys.executable, "-c", _RANK0_SPEC.replace(str(PORT), str(PORT + 6))],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
    r1 = subprocess.Popen(
        [sys.executable, "-c", _RANK1_SPEC.replace(str(PORT), str(PORT + 6))],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
    out0, err0 = r0.communicate(timeout=420)
    out1, err1 = r1.communicate(timeout=120)
    assert r0.returncode == 0, f"rank0 failed:\n{err0[-3000:]}"
    assert r1.returncode == 0, f"rank1 failed:\n{err1[-3000:]}"
    got_ids, got_spec_steps = json.loads(
        [l for l in out0.splitlines() if l.startswith("RESULT ")][0][7:])
    assert got_spec_steps > 0  # speculation actually ran on the mesh

    from semi_pd_tpu.parallel.mesh import create_mesh

    cfg = ModelConfig(
        architecture="LlamaForCausalLM", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=4, head_dim=8, max_position_embeddings=256,
        context_length=256, dtype="float32",
    )
    eng = Engine(server_args=ServerArgs(
        model_path="", random_weights=True, page_size=4,
        max_total_tokens=1024, dtype="float32", seed=7, tp_size=4,
        speculative_algorithm="EAGLE", speculative_num_draft_tokens=3,
    ), model_config=cfg, mesh=create_mesh(tp_size=4))
    rng = np.random.default_rng(13)
    prompts = [rng.integers(0, 64, size=n).tolist() for n in (10, 7)]
    sp = SamplingParams(max_new_tokens=10, temperature=0.0, ignore_eos=True)
    want = [o["output_ids"] for o in eng.generate(
        input_ids=prompts, sampling_params=sp)]
    assert got_ids == want


_LORA_SETUP = """
def make_adapter(rng, L=2, H=32, q_size=32, kv_size=16, I=64, R=4):
    sd = {}
    m = {"q_proj": q_size, "k_proj": kv_size, "v_proj": kv_size,
         "o_proj": H, "gate_proj": I, "up_proj": I, "down_proj": H}
    din = {"q_proj": H, "k_proj": H, "v_proj": H, "o_proj": q_size,
           "gate_proj": H, "up_proj": H, "down_proj": I}
    for l in range(L):
        for t, dout in m.items():
            sd["base_model.model.model.layers.%d.self_attn.%s.lora_A.weight"
               % (l, t)] = (rng.normal(size=(R, din[t])) * 0.5).astype("float32")
            sd["base_model.model.model.layers.%d.self_attn.%s.lora_B.weight"
               % (l, t)] = (rng.normal(size=(dout, R)) * 0.5).astype("float32")
    return sd
"""

_RANK0_LORA = _COMMON + _LORA_SETUP + """
args = make_args(0)
init_multihost(args)
from semi_pd_tpu.parallel.mesh import create_mesh
from semi_pd_tpu.runtime.engine import Engine
from semi_pd_tpu.sampling.sampling_params import SamplingParams

mesh = create_mesh(tp_size=4)
eng = Engine(server_args=args, model_config=make_cfg(), mesh=mesh)
rng = np.random.default_rng(17)
prompt = rng.integers(0, 64, size=9).tolist()
sp = SamplingParams(max_new_tokens=8, temperature=0.0, ignore_eos=True)
base = eng.generate(input_ids=prompt, sampling_params=sp)
eng.register_lora_adapter("ad", state_dict=make_adapter(rng), rank=4)
with_lora = eng.generate(input_ids=prompt, sampling_params=sp,
                         lora_path="ad")
eng.unload_lora_adapter("ad")
after = eng.generate(input_ids=prompt, sampling_params=sp)
eng.runner.close()
print("RESULT " + json.dumps(
    [base["output_ids"], with_lora["output_ids"], after["output_ids"]]))
"""

_RANK1_LORA = _COMMON + """
from semi_pd_tpu.runtime.mirror import follower_main
args = make_args(1)
follower_main(args, model_config=make_cfg())
print("FOLLOWER DONE")
"""


def test_two_process_lora_matches_single_process():
    """LoRA register/unload over two processes (the lora mirror branch):
    the stacked adapter pytree installs replicated on every process."""
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "XLA_FLAGS", "JAX_PLATFORMS",
                     "JAX_NUM_CPU_DEVICES")
    }
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    r0 = subprocess.Popen(
        [sys.executable, "-c", _RANK0_LORA.replace(str(PORT), str(PORT + 8))],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
    r1 = subprocess.Popen(
        [sys.executable, "-c", _RANK1_LORA.replace(str(PORT), str(PORT + 8))],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
    out0, err0 = r0.communicate(timeout=420)
    out1, err1 = r1.communicate(timeout=120)
    assert r0.returncode == 0, f"rank0 failed:\n{err0[-3000:]}"
    assert r1.returncode == 0, f"rank1 failed:\n{err1[-3000:]}"
    got = json.loads(
        [l for l in out0.splitlines() if l.startswith("RESULT ")][0][7:])

    from semi_pd_tpu.parallel.mesh import create_mesh

    cfg = ModelConfig(
        architecture="LlamaForCausalLM", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=4, head_dim=8, max_position_embeddings=256,
        context_length=256, dtype="float32",
    )
    eng = Engine(server_args=ServerArgs(
        model_path="", random_weights=True, page_size=4,
        max_total_tokens=1024, dtype="float32", seed=7, tp_size=4,
    ), model_config=cfg, mesh=create_mesh(tp_size=4))
    rng = np.random.default_rng(17)
    prompt = rng.integers(0, 64, size=9).tolist()
    sp = SamplingParams(max_new_tokens=8, temperature=0.0, ignore_eos=True)
    want = [eng.generate(input_ids=prompt, sampling_params=sp)["output_ids"]]
    # rebuild the same adapter from the same rng position
    import re as _re
    ns = {}
    exec(_LORA_SETUP, ns)
    eng.register_lora_adapter("ad", state_dict=ns["make_adapter"](rng),
                              rank=4)
    want.append(eng.generate(input_ids=prompt, sampling_params=sp,
                             lora_path="ad")["output_ids"])
    eng.unload_lora_adapter("ad")
    want.append(eng.generate(input_ids=prompt, sampling_params=sp)
                ["output_ids"])
    assert got == want
    assert want[0] != want[1]  # the adapter actually changed the output
    assert want[2] == want[0]  # unload restored base behavior


_RANK0_HICACHE = _COMMON + """
args = make_args(0)
args.enable_hierarchical_cache = True
args.__post_init__()
init_multihost(args)
from semi_pd_tpu.parallel.mesh import create_mesh
from semi_pd_tpu.runtime.engine import Engine
from semi_pd_tpu.sampling.sampling_params import SamplingParams

mesh = create_mesh(tp_size=4)
eng = Engine(server_args=args, model_config=make_cfg(), mesh=mesh)
rng = np.random.default_rng(23)
prompt = rng.integers(0, 64, size=16).tolist()
sp = SamplingParams(max_new_tokens=6, temperature=0.0, ignore_eos=True)
o1 = eng.generate(input_ids=prompt, sampling_params=sp)
eng.scheduler.hicache_ctl.drain()
assert eng.scheduler.host_cache.n_pages() > 0
# nuke the DEVICE tree: only the host tier still holds the prefix
assert eng.flush_cache()
o2 = eng.generate(input_ids=prompt, sampling_params=sp)
assert o2["meta_info"]["cached_tokens"] > 0   # host-tier restore
eng.runner.close()
print("RESULT " + json.dumps([o1["output_ids"], o2["output_ids"]]))
"""

_RANK1_HICACHE = _COMMON + """
from semi_pd_tpu.runtime.mirror import follower_main
args = make_args(1)
args.enable_hierarchical_cache = True
args.__post_init__()
follower_main(args, model_config=make_cfg())
print("FOLLOWER DONE")
"""


def test_two_process_hicache_matches_single_process():
    """Hierarchical host-KV tier over two processes (hdl/hup mirror
    branches): write-through gathers allgather in lockstep, a host-tier
    restore uploads into every process's pool shards, and the restored
    prefix reproduces the original outputs."""
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "XLA_FLAGS", "JAX_PLATFORMS",
                     "JAX_NUM_CPU_DEVICES")
    }
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    r0 = subprocess.Popen(
        [sys.executable, "-c",
         _RANK0_HICACHE.replace(str(PORT), str(PORT + 10))],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
    r1 = subprocess.Popen(
        [sys.executable, "-c",
         _RANK1_HICACHE.replace(str(PORT), str(PORT + 10))],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
    out0, err0 = r0.communicate(timeout=420)
    out1, err1 = r1.communicate(timeout=120)
    assert r0.returncode == 0, f"rank0 failed:\n{err0[-3000:]}"
    assert r1.returncode == 0, f"rank1 failed:\n{err1[-3000:]}"
    got = json.loads(
        [l for l in out0.splitlines() if l.startswith("RESULT ")][0][7:])
    assert got[0] == got[1]  # host-restored prefix reproduces the output
