"""Tool-call parsing (role of reference tool_parsers tests)."""

import json

from vllm_pq_tpu.entrypoints.openai.tool_parsers import (
    parse_tool_calls, render_tools_prompt)


def test_hermes_format():
    text = ('I will check the weather. <tool_call>{"name": '
            '"get_weather", "arguments": {"city": "Paris"}}</tool_call>')
    content, calls = parse_tool_calls(text)
    assert len(calls) == 1
    assert calls[0]["function"]["name"] == "get_weather"
    assert json.loads(calls[0]["function"]["arguments"]) == {
        "city": "Paris"}
    assert "tool_call" not in content
    assert "weather" in content


def test_multiple_hermes_calls():
    text = ('<tool_call>{"name": "a", "arguments": {}}</tool_call>'
            '<tool_call>{"name": "b", "arguments": {"x": 1}}</tool_call>')
    content, calls = parse_tool_calls(text)
    assert [c["function"]["name"] for c in calls] == ["a", "b"]
    assert content == ""


def test_bare_json_format():
    text = '{"name": "lookup", "arguments": {"q": "tpu"}}'
    content, calls = parse_tool_calls(text)
    assert len(calls) == 1
    assert calls[0]["function"]["name"] == "lookup"


def test_plain_text_no_calls():
    content, calls = parse_tool_calls("just a normal answer")
    assert calls == []
    assert content == "just a normal answer"


def test_malformed_json_ignored():
    content, calls = parse_tool_calls(
        "<tool_call>{not json}</tool_call>")
    assert calls == []


def test_render_tools_prompt():
    tools = [{"type": "function",
              "function": {"name": "f", "description": "does f",
                           "parameters": {"type": "object"}}}]
    s = render_tools_prompt(tools, {"function": {"name": "f"}})
    assert '"name": "f"' in s
    assert "MUST call" in s
