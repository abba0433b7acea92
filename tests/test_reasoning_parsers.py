"""Reasoning parsers (deepseek_r1 / qwen3 / granite) + mistral /
llama3_json tool parsers (role of reference reasoning_parsers/ and
tool_parsers/ test suites)."""

import json

from vllm_pq_tpu.entrypoints.openai.reasoning_parsers import (
    StreamingReasoningSplitter, extract_reasoning)
from vllm_pq_tpu.entrypoints.openai.tool_parsers import parse_tool_calls


def test_r1_full_extract():
    r, c = extract_reasoning(
        "<think>step 1\nstep 2</think>\nThe answer is 4.",
        "deepseek_r1")
    assert r == "step 1\nstep 2"
    assert c == "The answer is 4."


def test_r1_implicit_open():
    # R1 templates often inject <think>, so the model output begins
    # mid-reasoning
    r, c = extract_reasoning("pondering...</think>42", "deepseek_r1")
    assert r == "pondering..."
    assert c == "42"


def test_r1_never_closed():
    r, c = extract_reasoning("all reasoning no answer", "deepseek_r1")
    assert r == "all reasoning no answer"
    assert c == ""


def test_qwen3_requires_tag():
    r, c = extract_reasoning("no tags here", "qwen3")
    assert r is None and c == "no tags here"
    r, c = extract_reasoning("<think>hm</think>ok", "qwen3")
    assert r == "hm" and c == "ok"


def test_granite():
    r, c = extract_reasoning(
        "Here is my thought process: hmm Here is my response: hi",
        "granite")
    assert r == "hmm" and c.strip() == "hi"


def test_streaming_splitter_tag_across_deltas():
    sp = StreamingReasoningSplitter("deepseek_r1")
    deltas = ["<think>a", "bc</th", "ink>de", "f"]
    r_all, c_all = "", ""
    for d in deltas:
        r, c = sp.feed(d)
        r_all += r
        c_all += c
    r, c = sp.flush()
    r_all += r
    c_all += c
    assert r_all == "abc"
    assert c_all == "def"


def test_streaming_splitter_unclosed_flush():
    sp = StreamingReasoningSplitter("qwen3")
    r1, c1 = sp.feed("<think>partial reason")
    r2, c2 = sp.flush()
    assert (r1 + r2) == "partial reason"
    assert c1 + c2 == ""


def test_mistral_tool_parser():
    text = ('[TOOL_CALLS] [{"name": "get_weather", '
            '"arguments": {"city": "Paris"}}]')
    content, calls = parse_tool_calls(text, "mistral")
    assert content == ""
    assert len(calls) == 1
    assert calls[0]["function"]["name"] == "get_weather"
    assert json.loads(calls[0]["function"]["arguments"]) == {
        "city": "Paris"}


def test_llama3_json_tool_parser():
    text = ('{"name": "a", "parameters": {"x": 1}}; '
            '{"name": "b", "parameters": {}}')
    content, calls = parse_tool_calls(text, "llama3_json")
    assert content == ""
    assert [c["function"]["name"] for c in calls] == ["a", "b"]


def test_llama3_python_tag():
    text = 'sure!<|python_tag|>{"name": "f", "parameters": {"k": 2}}'
    content, calls = parse_tool_calls(text, "llama3_json")
    assert content == "sure!"
    assert calls[0]["function"]["name"] == "f"


def test_plain_text_untouched():
    content, calls = parse_tool_calls("just words", "auto")
    assert content == "just words" and calls == []
