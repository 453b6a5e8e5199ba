"""Named chat-template registry (reference srt/conversation.py registry,
selected by --chat-template). The HF Jinja path stays the default; names
resolve to the reference's registered formats."""

import pytest

from semi_pd_tpu.utils.chat_template import (
    NAMED_TEMPLATES,
    apply_chat_template,
    render_named_template,
)

MSGS = [
    {"role": "system", "content": "Be terse."},
    {"role": "user", "content": "hi"},
    {"role": "assistant", "content": "hello"},
    {"role": "user", "content": "bye"},
]


def test_registry_covers_reference_names():
    ref_names = {
        "llama-2", "chatml", "chatml-llava", "vicuna_v1.1",
        "llama_3_vision", "llava_llama_3", "internlm2-chat", "qwen2-vl",
        "gme-qwen2-vl", "minicpmv", "janus-pro",
    }
    assert ref_names <= set(NAMED_TEMPLATES)


def test_chatml_format():
    text = render_named_template("chatml", MSGS)
    assert text.startswith("<|im_start|>system\nBe terse.<|im_end|>\n")
    assert "<|im_start|>user\nhi<|im_end|>\n" in text
    assert "<|im_start|>assistant\nhello<|im_end|>\n" in text
    assert text.endswith("<|im_start|>assistant\n")


def test_llama2_format():
    text = render_named_template("llama-2", MSGS)
    assert text.startswith("[INST] <<SYS>>\nBe terse.\n<</SYS>>\n\nhi")
    assert " [/INST] hello </s><s>" in text
    assert "[INST] bye" in text
    assert text.endswith(" [/INST]")


def test_llama3_format():
    text = render_named_template("llama-3", MSGS)
    assert "<|start_header_id|>user<|end_header_id|>\n\nhi<|eot_id|>" in text
    assert text.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")


def test_vicuna_format():
    text = render_named_template("vicuna_v1.1", MSGS[1:])  # default system
    assert text.startswith("A chat between")
    assert "USER: hi ASSISTANT: hello</s>" in text
    assert text.endswith("ASSISTANT:")


def test_apply_uses_named_template():
    class Tok:
        chat_template = "{{ oops }}"  # must NOT be used when name given

        def encode(self, s):
            return [len(s)]

        def apply_chat_template(self, *a, **k):  # pragma: no cover
            raise AssertionError("Jinja path must not run for a named template")

    ids = apply_chat_template(Tok(), MSGS, chat_template="chatml")
    assert ids == [len(render_named_template("chatml", MSGS))]
