"""Custom logit processors (reference srt/sampling/custom_logit_processor.py
+ --enable-custom-logit-processor io_struct.py:80-82; TPU-native registry
form — semi_pd_tpu/sampling/logit_processor.py)."""

import numpy as np
import pytest

from semi_pd_tpu.sampling.logit_processor import (
    CustomLogitProcessor,
    register_processor,
    resolve_processor,
)


def test_builtin_rows():
    lb = resolve_processor("logit_bias")
    row = lb.bias([], {"logit_bias": {"3": 5.0, 7: -1.0}}, 10)
    assert row[3] == 5.0 and row[7] == -1.0 and row[0] == 0.0
    assert lb.bias([], {}, 10) is None

    dt = resolve_processor("disallow_tokens")
    row = dt.bias([], {"token_ids": [2, 9]}, 10)
    assert row[2] == -np.inf and row[9] == -np.inf and np.isfinite(row[1])

    tb = resolve_processor("thinking_budget")
    assert tb.bias([1, 2], {"budget": 4, "end_token_id": 5}, 10) is None
    row = tb.bias([1, 2, 3, 4], {"budget": 4, "end_token_id": 5}, 10)
    assert row[5] == 0.0 and row[4] == -np.inf
    assert tb.bias([1, 5, 3, 4], {"budget": 4, "end_token_id": 5}, 10) is None

    with pytest.raises(ValueError):
        resolve_processor("nope")


def _make_engine(**server_kw):
    import torch
    from transformers import LlamaConfig as HFC, LlamaForCausalLM as HFL

    from semi_pd_tpu.config.model_config import ModelConfig
    from semi_pd_tpu.config.server_args import ServerArgs
    from semi_pd_tpu.model_loader.loader import load_params
    from semi_pd_tpu.runtime.engine import Engine

    cfg = HFC(vocab_size=97, hidden_size=64, intermediate_size=128,
              num_hidden_layers=2, num_attention_heads=4,
              num_key_value_heads=2, max_position_embeddings=256,
              eos_token_id=96, tie_word_embeddings=False)
    torch.manual_seed(0)
    hf = HFL(cfg).eval().float()
    mc = ModelConfig.from_hf_config(cfg, dtype="float32")
    eng = Engine(
        server_args=ServerArgs(model_path="", random_weights=True,
                               page_size=4, max_total_tokens=1024,
                               skip_tokenizer_init=True, **server_kw),
        model_config=mc,
    )
    eng.runner.params = load_params(
        eng.runner.model, weights=list(hf.state_dict().items()))
    return eng


def test_flag_gating():
    from semi_pd_tpu.sampling.sampling_params import SamplingParams

    eng = _make_engine()  # flag off
    with pytest.raises(ValueError, match="enable-custom-logit-processor"):
        eng.generate(
            input_ids=[[1, 2, 3]],
            sampling_params=SamplingParams(
                max_new_tokens=2, temperature=0.0,
                custom_logit_processor="disallow_tokens",
                custom_params={"token_ids": [0]},
            ),
        )
    # logit_bias is exempt (standard OpenAI field)
    out = eng.generate(
        input_ids=[[1, 2, 3]],
        sampling_params=SamplingParams(
            max_new_tokens=2, temperature=0.0, ignore_eos=True,
            custom_logit_processor="logit_bias",
            custom_params={"logit_bias": {}},
        ),
    )
    assert len(out[0]["output_ids"]) == 2


def test_e2e_disallow_forces_second_best():
    from semi_pd_tpu.sampling.sampling_params import SamplingParams

    eng = _make_engine(enable_custom_logit_processor=True)
    base = eng.generate(
        input_ids=[[1, 2, 3, 4]],
        sampling_params=SamplingParams(max_new_tokens=1, temperature=0.0,
                                       ignore_eos=True),
    )[0]["output_ids"]
    banned = base[0]
    out = eng.generate(
        input_ids=[[1, 2, 3, 4]],
        sampling_params=SamplingParams(
            max_new_tokens=1, temperature=0.0, ignore_eos=True,
            custom_logit_processor="disallow_tokens",
            custom_params={"token_ids": [banned]},
        ),
    )[0]["output_ids"]
    assert out[0] != banned
    eng.scheduler.check_memory()


def test_e2e_thinking_budget_and_logit_bias():
    from semi_pd_tpu.sampling.sampling_params import SamplingParams

    eng = _make_engine(enable_custom_logit_processor=True)
    # thinking budget: end token must appear exactly at position `budget`
    out = eng.generate(
        input_ids=[[5, 6, 7]],
        sampling_params=SamplingParams(
            max_new_tokens=8, temperature=0.0, ignore_eos=True,
            custom_logit_processor="thinking_budget",
            custom_params={"budget": 3, "end_token_id": 42},
        ),
    )[0]["output_ids"]
    assert out[3] == 42 and 42 not in out[:3]

    # a huge positive bias forces that token every step
    out = eng.generate(
        input_ids=[[5, 6, 7]],
        sampling_params=SamplingParams(
            max_new_tokens=3, temperature=0.0, ignore_eos=True,
            custom_logit_processor="logit_bias",
            custom_params={"logit_bias": {"33": 1000.0}},
        ),
    )[0]["output_ids"]
    assert out == [33, 33, 33]
    eng.scheduler.check_memory()


def test_register_custom_class():
    class EvenOnly(CustomLogitProcessor):
        name = "even_only_test"

        def bias(self, output_ids, custom_params, vocab_size):
            row = np.zeros(vocab_size, np.float32)
            row[1::2] = -np.inf
            return row

    register_processor(EvenOnly())
    from semi_pd_tpu.sampling.sampling_params import SamplingParams

    eng = _make_engine(enable_custom_logit_processor=True)
    out = eng.generate(
        input_ids=[[9, 8, 7]],
        sampling_params=SamplingParams(
            max_new_tokens=4, temperature=0.0, ignore_eos=True,
            custom_logit_processor="even_only_test",
        ),
    )[0]["output_ids"]
    assert all(t % 2 == 0 for t in out), out


def test_custom_processor_under_semi_pd_with_prefill():
    """The float-bias path composes with semi-PD ticks: a ban stays enforced
    on every decode step while a long chunked prefill streams alongside."""
    import numpy as np_

    from semi_pd_tpu.sampling.sampling_params import SamplingParams

    eng = _make_engine(enable_custom_logit_processor=True,
                       enable_semi_pd=True, chunked_prefill_size=16)
    banned = list(range(0, 48))
    sp_short = SamplingParams(max_new_tokens=8, temperature=0.0,
                              ignore_eos=True,
                              custom_logit_processor="disallow_tokens",
                              custom_params={"token_ids": banned})
    sp_long = SamplingParams(max_new_tokens=2, temperature=0.0,
                             ignore_eos=True)
    rng = np_.random.default_rng(2)
    r_short = eng.make_request(input_ids=[5, 6, 7], sampling_params=sp_short)
    r_long = eng.make_request(
        input_ids=rng.integers(0, 90, size=60).tolist(),
        sampling_params=sp_long)
    eng.scheduler.add_request(r_short)
    eng.scheduler.add_request(r_long)
    for _ in range(600):
        eng.scheduler.tick()
        if r_short.finished and r_long.finished:
            break
    assert r_short.finished and r_long.finished
    assert all(t not in banned for t in r_short.output_ids), r_short.output_ids
    eng.scheduler.check_memory()


@pytest.mark.quick
def test_pickled_processor_rejected_with_guidance():
    """Reference clients ship dill-pickled callables over the wire
    (srt/sampling/custom_logit_processor.py to_str — base64 pickle blobs);
    this framework rejects them BY DESIGN (RCE). The error must say so and
    point at the named server-side registry (README compat boundary)."""
    import base64
    import pickle

    from semi_pd_tpu.sampling.logit_processor import resolve_processor

    blob = base64.b64encode(pickle.dumps({"fake": "callable"})).decode()
    with pytest.raises(ValueError) as ei:
        resolve_processor(blob)
    msg = str(ei.value)
    assert "pickled" in msg and "register_processor" in msg

    # a short unknown name still gets the plain unknown-name error
    with pytest.raises(ValueError) as ei2:
        resolve_processor("nope")
    assert "unknown custom logit processor" in str(ei2.value)
