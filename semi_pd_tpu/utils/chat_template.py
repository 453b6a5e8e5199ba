"""Chat template application.

Reference: srt/conversation.py (648 LoC template registry). TPU build uses
the tokenizer's own Jinja chat template (tokenizer.apply_chat_template) —
the modern HF-native path — with a minimal fallback for tokenizers without
one."""

from __future__ import annotations

from typing import Dict, List, Optional


_FALLBACK = (
    "{prefix}"  # placeholder (kept simple; llama-2-style)
)


def apply_chat_template(
    tokenizer,
    messages: List[Dict],
    chat_template: Optional[str] = None,
    add_generation_prompt: bool = True,
) -> List[int]:
    if tokenizer is None:
        raise ValueError("no tokenizer loaded")
    # Normalize multimodal content lists to their text parts
    norm = []
    for m in messages:
        c = m.get("content")
        if isinstance(c, list):
            c = "".join(p.get("text", "") for p in c if p.get("type") == "text")
        norm.append({**m, "content": c})

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
