"""Chat templates — llama_chat_apply_template analog (src/llama-chat.cpp).

The reference ships 36 hardcoded dialect formatters selected by
fingerprinting the GGUF's `tokenizer.chat_template` Jinja source; full
Jinja rendering is available via the bundled minja engine (common/minja).
Here: the major dialect formatters are hardcoded the same way, detection
uses the same substring fingerprints, and arbitrary templates render
through jinja2 (the minja analog, already in the image).
"""
from __future__ import annotations

from typing import Optional


def detect_template(tmpl_source: str) -> str:
    """Fingerprint a Jinja chat-template source (llm_chat_detect_template)."""
    t = tmpl_source
    if "<|im_start|>" in t:
        return "chatml"
    if "<|start_header_id|>" in t and "<|eot_id|>" in t:
        return "llama3"
    if "[INST]" in t:
        return "mistral" if "[/INST]" in t and "<<SYS>>" not in t else "llama2"
    if "<start_of_turn>" in t:
        return "gemma"
    if "<|assistant|>" in t and "<|end|>" in t:
        return "phi3"
    if "<|user|>" in t and "</s>" in t:
        return "zephyr"
    if "USER:" in t and "ASSISTANT:" in t:
        return "vicuna"
    if "<｜User｜>" in t or "User: " in t and "Assistant: " in t:
        return "deepseek3"
    return "unknown"


def _chatml(messages, add_assistant):
    out = []
    for m in messages:
        out.append(f"<|im_start|>{m['role']}\n{m['content']}<|im_end|>\n")
    if add_assistant:
        out.append("<|im_start|>assistant\n")
    return "".join(out)


def _llama3(messages, add_assistant):
    out = ["<|begin_of_text|>"]
    for m in messages:
        out.append(
            f"<|start_header_id|>{m['role']}<|end_header_id|>\n\n{m['content']}<|eot_id|>"
        )
    if add_assistant:
        out.append("<|start_header_id|>assistant<|end_header_id|>\n\n")
    return "".join(out)


def _llama2(messages, add_assistant):
    out = []
    system = ""
    for m in messages:
        if m["role"] == "system":
            system = f"<<SYS>>\n{m['content']}\n<</SYS>>\n\n"
        elif m["role"] == "user":
            out.append(f"[INST] {system}{m['content']} [/INST]")
            system = ""
        else:
            out.append(f" {m['content']} ")
    return "".join(out)


def _mistral(messages, add_assistant):
    out = []
    for m in messages:
        if m["role"] == "user":
            out.append(f"[INST] {m['content']}[/INST]")
        elif m["role"] == "assistant":
            out.append(f" {m['content']}</s>")
    return "".join(out)


def _gemma(messages, add_assistant):
    out = []
    for m in messages:
        role = "model" if m["role"] == "assistant" else "user"
        out.append(f"<start_of_turn>{role}\n{m['content']}<end_of_turn>\n")
    if add_assistant:
        out.append("<start_of_turn>model\n")
    return "".join(out)


def _phi3(messages, add_assistant):
    out = [f"<|{m['role']}|>\n{m['content']}<|end|>\n" for m in messages]
    if add_assistant:
        out.append("<|assistant|>\n")
    return "".join(out)


def _zephyr(messages, add_assistant):
    out = [f"<|{m['role']}|>\n{m['content']}</s>\n" for m in messages]
    if add_assistant:
        out.append("<|assistant|>\n")
    return "".join(out)


def _vicuna(messages, add_assistant):
    out = []
    for m in messages:
        if m["role"] == "system":
            out.append(f"{m['content']}\n\n")
        elif m["role"] == "user":
            out.append(f"USER: {m['content']}\n")
        else:
            out.append(f"ASSISTANT: {m['content']}</s>\n")
    if add_assistant:
        out.append("ASSISTANT:")
    return "".join(out)


def _deepseek3(messages, add_assistant):
    out = []
    for m in messages:
        if m["role"] == "system":
            out.append(m["content"])
        elif m["role"] == "user":
            out.append(f"<｜User｜>{m['content']}")
        else:
            out.append(f"<｜Assistant｜>{m['content']}<｜end▁of▁sentence｜>")
    if add_assistant:
        out.append("<｜Assistant｜>")
    return "".join(out)


FORMATTERS = {
    "chatml": _chatml,
    "llama3": _llama3,
    "llama2": _llama2,
    "mistral": _mistral,
    "gemma": _gemma,
    "phi3": _phi3,
    "zephyr": _zephyr,
    "vicuna": _vicuna,
    "deepseek3": _deepseek3,
}


def apply_chat_template(
    messages: list[dict],
    template: str = "chatml",
    add_assistant: bool = True,
    jinja_source: Optional[str] = None,
    bos_token: str = "<s>",
    eos_token: str = "</s>",
) -> str:
    """Format messages.  `template` is a dialect name; `jinja_source` (the
    GGUF's tokenizer.chat_template) renders via jinja2 when given and the
    dialect is unknown."""
    if template in FORMATTERS:
        return FORMATTERS[template](messages, add_assistant)
    if jinja_source is None and template not in FORMATTERS:
        raise ValueError(f"unknown template {template!r}; known: {sorted(FORMATTERS)}")
    import jinja2

    env = jinja2.Environment(trim_blocks=True, lstrip_blocks=True)
    env.globals["raise_exception"] = lambda msg: (_ for _ in ()).throw(ValueError(msg))
    tmpl = env.from_string(jinja_source)
    return tmpl.render(
        messages=messages,
        add_generation_prompt=add_assistant,
        bos_token=bos_token,
        eos_token=eos_token,
    )


def template_from_gguf(metadata: dict) -> tuple[str, Optional[str]]:
    """(dialect, jinja_source) from GGUF metadata."""
    src = metadata.get("tokenizer.chat_template")
    if not src:
        return "chatml", None
    return detect_template(src), src
