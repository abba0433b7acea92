"""Tool-call output parsers (role of reference
``entrypoints/openai/tool_parsers/`` — 10 model-specific parsers):

- hermes: ``<tool_call>{"name": ..., "arguments": {...}}</tool_call>``
  (Qwen2, Hermes finetunes)
- mistral: ``[TOOL_CALLS] [{"name": ..., "arguments": {...}}, ...]``
- llama3_json: bare ``{"name": ..., "parameters": {...}}`` objects,
  optionally behind ``<|python_tag|>``, ``;``-separated for parallel
  calls (reference llama3_json parser)
- json: the whole completion is one JSON object (or array of objects)
  with name/arguments — the guided-decoding format.

``parse_tool_calls(text, parser)`` returns (content, tool_calls) where
tool_calls is a list of OpenAI tool_call dicts, empty when none found.
"""

import json
import re
import uuid
from typing import List, Optional, Tuple

_HERMES_RE = re.compile(r"<tool_call>\s*(\{.*?\})\s*</tool_call>",
                        re.DOTALL)
_MISTRAL_RE = re.compile(r"\[TOOL_CALLS\]\s*(\[.*\])", re.DOTALL)
_PYTHON_TAG = "<|python_tag|>"


def tool_parser_names():
    return ["auto", "hermes", "mistral", "llama3_json", "json"]


def _mk_call(name: str, arguments) -> dict:
    if not isinstance(arguments, str):
        arguments = json.dumps(arguments)
    return {
        "id": f"chatcmpl-tool-{uuid.uuid4().hex[:24]}",
        "type": "function",
        "function": {"name": name, "arguments": arguments},
    }


def _from_obj(obj) -> Optional[dict]:
    if isinstance(obj, dict) and "name" in obj:
        args = obj.get("arguments", obj.get("parameters", {}))
        return _mk_call(obj["name"], args)
    return None


def _parse_json_objects(text: str) -> Optional[List[dict]]:
    """One or more ';'-separated JSON tool objects (llama3_json)."""
    calls = []
    for part in text.split(";"):
        part = part.strip()
        if not part:
            continue
        try:
            call = _from_obj(json.loads(part))
        except json.JSONDecodeError:
            return None
        if call is None:
            return None
        calls.append(call)
    return calls or None


def parse_tool_calls(text: str, parser: str = "auto"
                     ) -> Tuple[str, List[dict]]:
    calls: List[dict] = []
    content = text

    if parser in ("hermes", "auto"):
        found = _HERMES_RE.findall(text)
        for raw in found:
            try:
                call = _from_obj(json.loads(raw))
            except json.JSONDecodeError:
                call = None
            if call:
                calls.append(call)
        if calls:
            content = _HERMES_RE.sub("", text).strip()
            return content, calls

    if parser in ("mistral", "auto"):
        m = _MISTRAL_RE.search(text)
        if m:
            try:
                arr = json.loads(m.group(1))
            except json.JSONDecodeError:
                arr = None
            if isinstance(arr, list):
                parsed = [_from_obj(o) for o in arr]
                if parsed and all(parsed):
                    content = (text[:m.start()] +
                               text[m.end():]).strip()
                    return content, parsed

    if parser in ("llama3_json", "auto"):
        body = text.strip()
        if _PYTHON_TAG in body:
            pre, _, body = body.partition(_PYTHON_TAG)
        else:
            pre = ""
        body = body.strip()
        if body.startswith("{"):
            parsed = _parse_json_objects(body)
            if parsed:
                return pre.strip(), parsed

    if parser in ("json", "auto"):
        stripped = text.strip()
        if stripped.startswith("{") or stripped.startswith("["):
            try:
                obj = json.loads(stripped)
            except json.JSONDecodeError:
                obj = None
            if isinstance(obj, dict):
                call = _from_obj(obj)
                if call:
                    return "", [call]
            elif isinstance(obj, list):
                parsed = [_from_obj(o) for o in obj]
                if parsed and all(parsed):
                    return "", parsed

    return content, calls


def render_tools_prompt(tools: List[dict],
                        tool_choice) -> str:
    """System-prompt preamble describing the tools (used when the
    tokenizer's chat template has no native tools support)."""
    lines = ["You have access to the following tools. To call a tool, "
             "reply with <tool_call>{\"name\": ..., \"arguments\": "
             "{...}}</tool_call>."]
    for t in tools:
        fn = t.get("function", t)
        lines.append(json.dumps({
            "name": fn.get("name"),
            "description": fn.get("description", ""),
            "parameters": fn.get("parameters", {}),
        }))
    if isinstance(tool_choice, dict):
        name = tool_choice.get("function", {}).get("name")
        if name:
            lines.append(f"You MUST call the tool {name!r}.")
    return "\n".join(lines)
