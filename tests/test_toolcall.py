"""Tool-call format parsing — the common/chat.cpp (test-chat.cpp) analog.

Cases mirror the reference's per-format parse tests: each dialect's marker
syntax must produce structured tool calls, reasoning must be extracted, and
plain content must survive untouched."""
import json

from ggml_hexagon_tpu.runtime.toolcall import (
    detect_format, parse_chat_output, render_tools_prompt, tool_calls_json)

WEATHER = [{"type": "function", "function": {
    "name": "get_weather",
    "parameters": {"type": "object",
                   "properties": {"city": {"type": "string"}}}}}]


def test_detect_format():
    assert detect_format("{% if x %}<tool_call>{% endif %}") == "hermes_2_pro"
    assert detect_format("... [TOOL_CALLS] ...") == "mistral_nemo"
    assert detect_format("<|START_ACTION|>") == "command_r7b"
    assert detect_format("functools[") == "firefunction"
    assert detect_format("<|python_tag|>... ipython") == "llama_3x"
    assert detect_format("plain template") == "generic"
    assert detect_format(None) == "generic"


def test_hermes_parse():
    txt = ('Sure, checking.\n<tool_call>\n'
           '{"name": "get_weather", "arguments": {"city": "Paris"}}\n'
           '</tool_call>')
    p = parse_chat_output(txt, "hermes_2_pro")
    assert len(p.tool_calls) == 1
    tc = p.tool_calls[0]
    assert tc.name == "get_weather"
    assert json.loads(tc.arguments) == {"city": "Paris"}
    assert p.content == "Sure, checking."


def test_mistral_nemo_parse():
    txt = ('[TOOL_CALLS][{"name": "get_weather", '
           '"arguments": {"city": "Oslo"}, "id": "123456789"}]')
    p = parse_chat_output(txt, "mistral_nemo")
    assert len(p.tool_calls) == 1
    assert p.tool_calls[0].id == "123456789"
    assert p.content == ""


def test_llama3_builtin_and_generic():
    txt = '{"name": "get_weather", "parameters": {"city": "Lima"}}'
    p = parse_chat_output(txt, "llama_3x")
    assert p.tool_calls and json.loads(p.tool_calls[0].arguments) == {
        "city": "Lima"}
    p2 = parse_chat_output(
        'ok {"tool_call": {"name": "f", "arguments": {}}} done', "generic")
    assert p2.tool_calls[0].name == "f"
    assert p2.content == "ok  done"


def test_command_r7b_thinking_and_action():
    txt = ("<|START_THINKING|>I should call the tool<|END_THINKING|>"
           '<|START_ACTION|>[{"tool_name": "get_weather", '
           '"parameters": {"city": "Rome"}}]<|END_ACTION|>')
    p = parse_chat_output(txt, "command_r7b")
    assert p.reasoning == "I should call the tool"
    assert p.tool_calls[0].name == "get_weather"


def test_deepseek_r1_reasoning_extraction():
    txt = "<think>chain of thought here</think>The answer is 4."
    p = parse_chat_output(txt, "deepseek_r1")
    assert p.reasoning == "chain of thought here"
    assert p.content == "The answer is 4."
    assert not p.tool_calls


def test_firefunction_parse():
    txt = 'functools[{"name": "a", "arguments": {"x": 1}}]'
    p = parse_chat_output(txt, "firefunction")
    assert [t.name for t in p.tool_calls] == ["a"]


def test_plain_content_untouched():
    p = parse_chat_output("Just a normal answer with no calls.", "generic")
    assert p.content == "Just a normal answer with no calls."
    assert not p.tool_calls and not p.reasoning


def test_render_and_wire_shape():
    block = render_tools_prompt(WEATHER, "hermes_2_pro")
    assert "<tools>" in block and "get_weather" in block
    p = parse_chat_output(
        '<tool_call>{"name": "get_weather", "arguments": {}}</tool_call>',
        "hermes_2_pro")
    wire = tool_calls_json(p)
    assert wire[0]["type"] == "function"
    assert wire[0]["id"].startswith("call_")
    assert wire[0]["function"]["name"] == "get_weather"


def test_server_chat_tools_integration():
    """tools flow through /v1/chat/completions: prompt injection + parse."""
    from ggml_hexagon_tpu.server.http_server import InferenceServer

    class FakeBatchEngine:
        tokenizer = None
        template = "chatml"
        template_src = "<tool_call>"

    srv = InferenceServer.__new__(InferenceServer)
    srv.template = "chatml"
    srv.template_src = "{% if tools %}<tool_call>{% endif %}"
    captured = {}

    def fake_completion(sub):
        captured.update(sub)
        return iter([])

    srv.completion = fake_completion
    list(srv.chat_completion({
        "messages": [{"role": "user", "content": "weather in Paris?"}],
        "tools": WEATHER}))
    assert "get_weather" in captured["prompt"]
    assert "<tools>" in captured["prompt"]
    assert srv.chat_format() == "hermes_2_pro"


# --- functionary v3.1/v3.2 + llama-3.x builtin tools (common/chat.cpp) ---

def test_functionary_v3_2_sections():
    from ggml_hexagon_tpu.runtime.toolcall import parse_chat_output
    text = 'all\nLet me check.>>>get_weather\n{"city": "Oslo"}>>>get_time\n{"tz": "CET"}'
    p = parse_chat_output(text, "functionary_v3_2")
    assert p.content == "Let me check."
    assert [(t.name, t.arguments) for t in p.tool_calls] == [
        ("get_weather", '{"city": "Oslo"}'), ("get_time", '{"tz": "CET"}')]


def test_functionary_v3_2_plain_content():
    from ggml_hexagon_tpu.runtime.toolcall import parse_chat_output
    p = parse_chat_output("all\nJust text, no calls.", "functionary_v3_2")
    assert p.content == "Just text, no calls." and not p.tool_calls


def test_functionary_v3_1_function_tags():
    from ggml_hexagon_tpu.runtime.toolcall import parse_chat_output
    text = 'ok <function=add>{"a": 1, "b": 2}</function>'
    p = parse_chat_output(text, "functionary_v3_1")
    assert p.tool_calls[0].name == "add"
    assert p.tool_calls[0].arguments == '{"a": 1, "b": 2}'
    assert p.content == "ok"


def test_functionary_v3_1_python_tag():
    from ggml_hexagon_tpu.runtime.toolcall import parse_chat_output
    import json
    p = parse_chat_output("<|python_tag|>print(1+1)", "functionary_v3_1")
    assert p.tool_calls[0].name == "python"
    assert json.loads(p.tool_calls[0].arguments) == {"code": "print(1+1)"}


def test_llama3x_builtin_call():
    from ggml_hexagon_tpu.runtime.toolcall import parse_chat_output
    import json
    p = parse_chat_output(
        '<|python_tag|>brave_search.call(query="llama 3")', "llama_3x_builtin")
    assert p.tool_calls[0].name == "brave_search"
    assert json.loads(p.tool_calls[0].arguments) == {"query": "llama 3"}
    assert p.content == ""


def test_llama3x_builtin_falls_back_to_json():
    from ggml_hexagon_tpu.runtime.toolcall import parse_chat_output
    p = parse_chat_output(
        '{"name": "f", "parameters": {"x": 1}}', "llama_3x_builtin")
    assert p.tool_calls[0].name == "f"


def test_detect_new_formats():
    from ggml_hexagon_tpu.runtime.toolcall import detect_format
    assert detect_format("blah >>>all more") == "functionary_v3_2"
    assert detect_format("<|start_header_id|> <function=") == "functionary_v3_1"
    assert detect_format(
        "<|start_header_id|>ipython<|end_header_id|> <|python_tag|>"
    ) == "llama_3x_builtin"
    assert detect_format(
        "<|start_header_id|>ipython<|end_header_id|>") == "llama_3x"


def test_render_tools_prompt_new_formats():
    from ggml_hexagon_tpu.runtime.toolcall import render_tools_prompt
    tools = [{"type": "function", "function": {"name": "f", "parameters": {}}}]
    assert ">>>function_name" in render_tools_prompt(tools, "functionary_v3_2")
    assert "<function=" in render_tools_prompt(tools, "functionary_v3_1")
