"""Reasoning-content parsers (role of reference
``entrypoints/openai/reasoning_parsers/`` — deepseek_r1 et al.): split a
model's chain-of-thought block out of the chat response into the
OpenAI-style ``reasoning_content`` field, for both full responses and
streaming deltas.
"""

from typing import Optional, Tuple

_PARSERS = {
    # parser -> (opening tag, closing tag, open_implicit)
    # open_implicit: R1 often starts thinking WITHOUT emitting <think>
    # (the template injects it), so an unopened stream counts as open.
    "deepseek_r1": ("<think>", "</think>", True),
    "qwen3": ("<think>", "</think>", False),
    "granite": ("Here is my thought process:", "Here is my response:",
                False),
}


def reasoning_parser_names():
    return sorted(_PARSERS)


def extract_reasoning(text: str, parser: str
                      ) -> Tuple[Optional[str], str]:
    """Full-response split -> (reasoning_content | None, content)."""
    spec = _PARSERS.get(parser)
    if spec is None:
        return None, text
    open_t, close_t, implicit = spec
    start = text.find(open_t)
    end = text.find(close_t)
    if end < 0:
        if implicit or start >= 0:
            # whole (remaining) text is reasoning that never closed
            r = text[start + len(open_t):] if start >= 0 else text
            return r.strip() or None, ""
        return None, text
    r_begin = start + len(open_t) if (0 <= start < end) else 0
    reasoning = text[r_begin:end].strip()
    content = text[end + len(close_t):].lstrip("\n")
    return reasoning or None, content


class StreamingReasoningSplitter:
    """Incremental delta router: feed text deltas, receive
    (reasoning_delta, content_delta) pairs. Buffers partial tags so a
    tag split across two deltas is never leaked into output."""

    def __init__(self, parser: str):
        self.open_t, self.close_t, self.implicit = _PARSERS[parser]
        self._buf = ""
        self._state = "start"  # start -> reasoning -> content

    def feed(self, delta: str) -> Tuple[str, str]:
        self._buf += delta
        r_out, c_out = "", ""
        while True:
            if self._state == "start":
                if self.implicit:
                    self._state = "reasoning"
                    continue
                i = self._buf.find(self.open_t)
                if i >= 0:
                    c_out += self._buf[:i]
                    self._buf = self._buf[i + len(self.open_t):]
                    self._state = "reasoning"
                    continue
                keep = self._longest_tag_suffix(self.open_t)
                c_out += self._buf[:len(self._buf) - keep]
                self._buf = self._buf[len(self._buf) - keep:]
                break
            if self._state == "reasoning":
                # strip an explicit opening tag arriving under implicit
                if self.implicit and self._buf.startswith(self.open_t):
                    self._buf = self._buf[len(self.open_t):]
                i = self._buf.find(self.close_t)
                if i >= 0:
                    r_out += self._buf[:i]
                    self._buf = self._buf[i + len(self.close_t):]
                    self._buf = self._buf.lstrip("\n")
                    self._state = "content"
                    continue
                keep = max(self._longest_tag_suffix(self.close_t),
                           self._longest_tag_suffix(self.open_t)
                           if self.implicit else 0)
                r_out += self._buf[:len(self._buf) - keep]
                self._buf = self._buf[len(self._buf) - keep:]
                break
            # content
            c_out += self._buf
            self._buf = ""
            break
        return r_out, c_out

    def _longest_tag_suffix(self, tag: str) -> int:
        """Length of the longest buffer suffix that is a tag prefix."""
        for n in range(min(len(tag) - 1, len(self._buf)), 0, -1):
            if self._buf.endswith(tag[:n]):
                return n
        return 0

    def flush(self) -> Tuple[str, str]:
        """End of stream: emit whatever is buffered (an unfinished tag
        is literal text)."""
        b, self._buf = self._buf, ""
        if self._state == "reasoning":
            return b, ""
        return "", b
