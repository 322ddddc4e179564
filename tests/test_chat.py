"""Chat template tests (mirror tests/test-chat-template.cpp golden strings)."""
import pytest

from ggml_hexagon_tpu.runtime.chat import (
    apply_chat_template,
    detect_template,
    template_from_gguf,
)

MSGS = [
    {"role": "system", "content": "You are helpful."},
    {"role": "user", "content": "Hi"},
    {"role": "assistant", "content": "Hello!"},
    {"role": "user", "content": "Bye"},
]


def test_chatml():
    out = apply_chat_template(MSGS, "chatml")
    assert out.startswith("<|im_start|>system\nYou are helpful.<|im_end|>\n")
    assert out.endswith("<|im_start|>assistant\n")


def test_llama3():
    out = apply_chat_template(MSGS, "llama3")
    assert out.startswith("<|begin_of_text|><|start_header_id|>system<|end_header_id|>")
    assert "<|eot_id|>" in out
    assert out.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")


def test_llama2_sys_folding():
    out = apply_chat_template(MSGS, "llama2")
    assert out.startswith("[INST] <<SYS>>\nYou are helpful.\n<</SYS>>\n\nHi [/INST]")


def test_gemma_role_mapping():
    out = apply_chat_template(MSGS[1:], "gemma")
    assert "<start_of_turn>model\nHello!<end_of_turn>" in out


def test_detect():
    assert detect_template("{% %}<|im_start|>{{role}}") == "chatml"
    assert detect_template("<|start_header_id|> x <|eot_id|>") == "llama3"
    assert detect_template("[INST] <<SYS>> hmm [/INST]") == "llama2"
    assert detect_template("<start_of_turn>") == "gemma"


def test_jinja_fallback():
    src = "{% for m in messages %}<<{{ m.role }}>>{{ m.content }}{% endfor %}{% if add_generation_prompt %}<<assistant>>{% endif %}"
    out = apply_chat_template(MSGS[:2], "unknown", jinja_source=src)
    assert out == "<<system>>You are helpful.<<user>>Hi<<assistant>>"


def test_unknown_without_source():
    with pytest.raises(ValueError, match="unknown template"):
        apply_chat_template(MSGS, "nope")


def test_template_from_gguf():
    assert template_from_gguf({}) == ("chatml", None)
    d, src = template_from_gguf({"tokenizer.chat_template": "x [INST] y [/INST]"})
    assert d == "mistral" and src
