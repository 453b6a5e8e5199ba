"""Chat template application.

Reference: srt/conversation.py (648 LoC Conversation dataclass + separator
styles + a registry of named templates, selected by --chat-template). The
TPU build prefers the tokenizer's own Jinja chat template
(tokenizer.apply_chat_template) — the modern HF-native path — but carries
the reference's NAMED template registry for checkpoints whose tokenizer
ships no template (or when the operator pins one): the same names the
reference registers (chatml, llama-2, llama-3, vicuna_v1.1, internlm2-chat,
qwen2-vl, minicpmv, janus-pro, ...) resolve here. A --chat-template value
that is not a registered name is treated as a raw Jinja template string and
handed to the tokenizer.
"""

from __future__ import annotations

from typing import Dict, List, Optional

# name -> dict(style, system_template, default_system, roles, sep/sep2,
# image_token). Styles are the four the reference's templates actually use.
NAMED_TEMPLATES: Dict[str, Dict] = {
    "chatml": dict(
        style="chatml",
        system_template="<|im_start|>system\n{system_message}",
        default_system="You are a helpful assistant.",
        roles=("<|im_start|>user", "<|im_start|>assistant"),
        sep="<|im_end|>",
    ),
    "internlm2-chat": dict(
        style="chatml",
        system_template="<|im_start|>system\n{system_message}",
        default_system="",
        roles=("<|im_start|>user", "<|im_start|>assistant"),
        sep="<|im_end|>",
    ),
    "qwen2-vl": dict(
        style="add_new_line_single",
        system_template="<|im_start|>system\n{system_message}",
        default_system="You are a helpful assistant.",
        roles=("<|im_start|>user", "<|im_start|>assistant"),
        sep="<|im_end|>\n",
        image_token="<|vision_start|><|image_pad|><|vision_end|>",
    ),
    "minicpmv": dict(
        style="add_new_line_single",
        system_template="<|im_start|>system\n{system_message}.",
        default_system="You are a helpful assistant",
        roles=("<|im_start|>user", "<|im_start|>assistant"),
        sep="<|im_end|>\n",
        image_token="(<image>./</image>)",
    ),
    "llama-2": dict(
        style="llama2",
        system_template="[INST] <<SYS>>\n{system_message}\n<</SYS>>\n\n",
        default_system="",
        roles=("[INST]", "[/INST]"),
        sep=" ",
        sep2=" </s><s>",
    ),
    "llama-3": dict(
        style="llama3",
        system_template=(
            "<|start_header_id|>system<|end_header_id|>\n\n"
            "{system_message}<|eot_id|>"),
        default_system="",
        roles=("user", "assistant"),
        sep="",
    ),
    "vicuna_v1.1": dict(
        style="add_colon_two",
        system_template="{system_message}",
        default_system=(
            "A chat between a curious user and an artificial intelligence "
            "assistant. The assistant gives helpful, detailed, and polite "
            "answers to the user's questions."),
        roles=("USER", "ASSISTANT"),
        sep=" ",
        sep2="</s>",
    ),
    "janus-pro": dict(
        style="add_colon_two",
        system_template="{system_message}.",
        default_system=(
            "You are a helpful language and vision assistant. You are able "
            "to understand the visual content that the user provides, and "
            "assist the user with a variety of tasks using natural language"),
        roles=("User", "Assistant"),
        sep="\n\n",
        sep2="<｜end▁of▁sentence｜>",
        image_token="<image_placeholder>",
    ),
}
# CHATML-family aliases the reference registers separately
NAMED_TEMPLATES["chatml-llava"] = NAMED_TEMPLATES["chatml"]
NAMED_TEMPLATES["gme-qwen2-vl"] = NAMED_TEMPLATES["qwen2-vl"]
NAMED_TEMPLATES["llava_llama_3"] = dict(
    NAMED_TEMPLATES["llama-3"],
    default_system=(
        "You are a helpful language and vision assistant. You are able to "
        "understand the visual content that the user provides, and assist "
        "the user with a variety of tasks using natural language."),
)
NAMED_TEMPLATES["llama_3_vision"] = dict(
    NAMED_TEMPLATES["llava_llama_3"], image_token="<|image|>")


def render_named_template(name: str, messages: List[Dict],
                          add_generation_prompt: bool = True) -> str:
    t = NAMED_TEMPLATES[name]
    system = t["default_system"]
    body = []
    for m in messages:
        if m["role"] == "system":
            system = m.get("content") or system
        else:
            body.append(m)
    ur, ar = t["roles"]
    style = t["style"]
    out = t["system_template"].format(system_message=system) if system else ""

    if style == "chatml":
        # <|im_start|>role\ncontent<|im_end|>\n
        if out:
            out += t["sep"] + "\n"
        for m in body:
            role = ur if m["role"] != "assistant" else ar
            out += f"{role}\n{m.get('content') or ''}{t['sep']}\n"
        if add_generation_prompt:
            out += f"{ar}\n"
    elif style == "add_new_line_single":
        # role\ncontent + sep (sep carries the end tag + newline)
        if out:
            out += t["sep"]
        for m in body:
            role = ur if m["role"] != "assistant" else ar
            out += f"{role}\n{m.get('content') or ''}{t['sep']}"
        if add_generation_prompt:
            out += f"{ar}\n"
    elif style == "llama2":
        # [INST] <<SYS>>..<</SYS>>\n\nuser [/INST] asst </s><s>[INST] u2 ...
        sys_prefix, out, first = out, "", True
        for m in body:
            c = m.get("content") or ""
            if m["role"] != "assistant":
                if first and sys_prefix:
                    out += sys_prefix + c
                else:
                    out += f"{ur} {c}"
                first = False
            else:
                out += f" {ar} {c}{t['sep2']}"
        if add_generation_prompt:
            out += f" {ar}"
    elif style == "llama3":
        for m in body:
            role = ur if m["role"] != "assistant" else ar
            out += (f"<|start_header_id|>{role}<|end_header_id|>\n\n"
                    f"{m.get('content') or ''}<|eot_id|>")
        if add_generation_prompt:
            out += f"<|start_header_id|>{ar}<|end_header_id|>\n\n"
    elif style == "add_colon_two":
        seps = (t["sep"], t["sep2"])
        if out:
            out += t["sep"]
        for i, m in enumerate(body):
            role = ur if m["role"] != "assistant" else ar
            out += f"{role}: {m.get('content') or ''}{seps[m['role'] == 'assistant']}"
        if add_generation_prompt:
            out += f"{ar}:"
    else:  # pragma: no cover
        raise ValueError(f"unknown template style {style}")
    return out


def apply_chat_template(
    tokenizer,
    messages: List[Dict],
    chat_template: Optional[str] = None,
    add_generation_prompt: bool = True,
) -> List[int]:
    if tokenizer is None:
        raise ValueError("no tokenizer loaded")
    # Normalize multimodal content lists: text parts concatenate; image
    # parts become the template's image_token (named vision templates) so
    # the image processor finds its placeholders in the prompt.
    image_token = (NAMED_TEMPLATES.get(chat_template) or {}).get(
        "image_token", "")
    norm = []
    for m in messages:
        c = m.get("content")
        if isinstance(c, list):
            c = "".join(
                p.get("text", "") if p.get("type") == "text"
                else image_token if p.get("type") in ("image", "image_url")
                else ""
                for p in c)
        norm.append({**m, "content": c})

    if chat_template in NAMED_TEMPLATES:
        # reference --chat-template <registered name> (conversation.py
        # registry); formats the prompt text directly
        text = render_named_template(
            chat_template, norm, add_generation_prompt)
        return tokenizer.encode(text)

    if getattr(tokenizer, "chat_template", None) or chat_template:
        return tokenizer.apply_chat_template(
            norm,
            chat_template=chat_template,
            add_generation_prompt=add_generation_prompt,
            tokenize=True,
        )
    # Fallback: simple role-tagged concatenation
    text = ""
    for m in norm:
        text += f"<|{m['role']}|>\n{m.get('content') or ''}\n"
    if add_generation_prompt:
        text += "<|assistant|>\n"
    return tokenizer.encode(text)
