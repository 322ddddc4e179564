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


# --- full 36-dialect coverage (reference src/llama-chat.cpp bodies) ---

U = [{"role": "user", "content": "Hi"}]
SUA = [
    {"role": "system", "content": "S"},
    {"role": "user", "content": "U"},
    {"role": "assistant", "content": "A"},
]


def test_phi4():
    out = apply_chat_template(SUA, "phi4")
    assert out == ("<|im_start|>system<|im_sep|>S<|im_end|>"
                   "<|im_start|>user<|im_sep|>U<|im_end|>"
                   "<|im_start|>assistant<|im_sep|>A<|im_end|>"
                   "<|im_start|>assistant<|im_sep|>")


def test_mistral_v1():
    out = apply_chat_template(SUA, "mistral-v1", add_assistant=False)
    assert out == " [INST] S\n\nU [/INST] A</s>"


def test_mistral_v3():
    out = apply_chat_template(SUA, "mistral-v3", add_assistant=False)
    assert out == "[INST] S\n\nU[/INST] A</s>"


def test_mistral_v3_tekken():
    out = apply_chat_template(SUA, "mistral-v3-tekken", add_assistant=False)
    assert out == "[INST]S\n\nU[/INST]A</s>"


def test_mistral_v7():
    out = apply_chat_template(SUA, "mistral-v7", add_assistant=False)
    assert out == "[SYSTEM_PROMPT] S[/SYSTEM_PROMPT][INST] U[/INST] A</s>"


def test_llama2_variants():
    base = apply_chat_template(SUA, "llama2-sys", add_assistant=False)
    assert base == "[INST] <<SYS>>\nS\n<</SYS>>\n\nU [/INST]A</s>"
    nosys = apply_chat_template(SUA, "llama2-nosys", add_assistant=False)
    assert nosys == "[INST] S\nU [/INST]A</s>"
    multi = SUA + [{"role": "user", "content": "U2"}]
    bos = apply_chat_template(multi, "llama2-sys-bos", add_assistant=False)
    assert "</s><s>[INST] U2 [/INST]" in bos
    strip = apply_chat_template(
        [{"role": "user", "content": "  padded  "}], "llama2-sys-strip",
        add_assistant=False)
    assert strip == "[INST] padded [/INST]"


def test_falcon3_and_glmedge():
    assert apply_chat_template(U, "falcon3") == "<|user|>\nHi\n<|assistant|>\n"
    assert apply_chat_template(U, "glmedge") == "<|user|>\nHi<|assistant|>"


def test_monarch():
    out = apply_chat_template(SUA, "monarch")
    assert out == "system\nS</s>\n<s>user\nU</s>\n<s>assistant\nA</s>\n<s>assistant\n"


def test_orion():
    out = apply_chat_template(SUA, "orion", add_assistant=False)
    assert out == "Human: S\n\nU\n\nAssistant: </s>A</s>"


def test_openchat():
    out = apply_chat_template(SUA, "openchat")
    assert out == ("S<|end_of_turn|>GPT4 Correct User: U<|end_of_turn|>"
                   "GPT4 Correct Assistant: A<|end_of_turn|>GPT4 Correct Assistant:")


def test_vicuna_orca():
    out = apply_chat_template(SUA, "vicuna-orca")
    assert out == "SYSTEM: S\nUSER: U\nASSISTANT: A</s>\nASSISTANT:"


def test_deepseek_coder():
    out = apply_chat_template(SUA, "deepseek")
    assert out == "S### Instruction:\nU\n### Response:\nA\n<|EOT|>\n### Response:\n"


def test_deepseek2():
    out = apply_chat_template(SUA, "deepseek2")
    assert out == "S\n\nUser: U\n\nAssistant: A<｜end▁of▁sentence｜>Assistant:"


def test_command_r():
    out = apply_chat_template(SUA, "command-r")
    assert out == ("<|START_OF_TURN_TOKEN|><|SYSTEM_TOKEN|>S<|END_OF_TURN_TOKEN|>"
                   "<|START_OF_TURN_TOKEN|><|USER_TOKEN|>U<|END_OF_TURN_TOKEN|>"
                   "<|START_OF_TURN_TOKEN|><|CHATBOT_TOKEN|>A<|END_OF_TURN_TOKEN|>"
                   "<|START_OF_TURN_TOKEN|><|CHATBOT_TOKEN|>")


def test_chatglm():
    assert apply_chat_template(U, "chatglm3") == "[gMASK]sop<|user|>\n Hi<|assistant|>"
    assert apply_chat_template(U, "chatglm4") == "[gMASK]<sop><|user|>\nHi<|assistant|>"


def test_minicpm():
    out = apply_chat_template(U + [{"role": "assistant", "content": "Yo"}], "minicpm")
    assert out == "<用户>Hi<AI>Yo"


def test_exaone3():
    out = apply_chat_template(SUA, "exaone3")
    assert out == ("[|system|]S[|endofturn|]\n[|user|]U\n"
                   "[|assistant|]A[|endofturn|]\n[|assistant|]")


def test_rwkv_world():
    out = apply_chat_template(U + [{"role": "assistant", "content": "Yo"}], "rwkv-world")
    assert out == "User: Hi\n\nAssistant:Yo\n\n"


def test_granite():
    out = apply_chat_template(SUA, "granite")
    assert out == ("<|start_of_role|>system<|end_of_role|>S<|end_of_text|>\n"
                   "<|start_of_role|>user<|end_of_role|>U<|end_of_text|>\n"
                   "<|start_of_role|>assistant<|end_of_role|>A<|end_of_text|>\n"
                   "<|start_of_role|>assistant<|end_of_role|>\n")


def test_gigachat():
    out = apply_chat_template(SUA, "gigachat")
    assert out == ("<s>S<|message_sep|>user<|role_sep|>U<|message_sep|>"
                   "available functions<|role_sep|>[]<|message_sep|>"
                   "assistant<|role_sep|>A<|message_sep|>assistant<|role_sep|>")


def test_megrez():
    out = apply_chat_template(U, "megrez")
    assert out == "<|role_start|>user<|role_end|>Hi<|turn_end|><|role_start|>assistant<|role_end|>"


def test_yandex():
    out = apply_chat_template(U, "yandex")
    assert out == "<s> Пользователь: Hi\n\n Ассистент:[SEP]"


def test_bailing():
    out = apply_chat_template(SUA, "bailing")
    assert out == "<role>SYSTEM</role>S<role>HUMAN</role>U<role>ASSISTANT</role>A<role>ASSISTANT</role>"


def test_detect_full_fingerprints():
    cases = {
        "<|im_start|>a<|im_sep|>": "phi4",
        "x [SYSTEM_PROMPT] [INST]": "mistral-v7",
        "{{' [INST] ' + system_message}} [INST]": "mistral-v1",
        '"[INST]" [AVAILABLE_TOOLS]': "mistral-v3-tekken",
        "[AVAILABLE_TOOLS][INST] hmm": "mistral-v3",
        "[INST] content.strip() x": "llama2-sys-strip",
        "bos_token + '[INST] more": "llama2-sys-bos",
        "<|assistant|> <|user|> </s>": "falcon3",
        "<|assistant|> <|user|>": "glmedge",
        "<|user|> <|endoftext|>": "zephyr",
        "bos_token + message['role']": "monarch",
        "'\\n\\nAssistant: ' + eos_token": "orion",
        "GPT4 Correct ": "openchat",
        "SYSTEM: USER: ASSISTANT: ": "vicuna-orca",
        "### Instruction: <|EOT|>": "deepseek",
        "<|START_OF_TURN_TOKEN|><|USER_TOKEN|>": "command-r",
        "[gMASK]sop": "chatglm3",
        "[gMASK]<sop>": "chatglm4",
        "<用户>": "minicpm",
        "'Assistant: ' + message['content'] + eos_token": "deepseek2",
        "[|system|] [|assistant|] [|endofturn|]": "exaone3",
        "rwkv-world": "rwkv-world",
        "<|start_of_role|>": "granite",
        "message['role'] + additional_special_tokens[0] + message['content'] + additional_special_tokens[1]": "gigachat",
        "<|role_start|>": "megrez",
        "x Ассистент: y": "yandex",
        "<role>ASSISTANT</role> 'HUMAN'": "bailing",
    }
    for src, want in cases.items():
        assert detect_template(src) == want, (src, detect_template(src), want)


def test_all_formatters_run():
    from ggml_hexagon_tpu.runtime.chat import FORMATTERS
    assert len(FORMATTERS) >= 36
    for name in FORMATTERS:
        out = apply_chat_template(SUA, name)
        assert isinstance(out, str) and "U" in out, name
