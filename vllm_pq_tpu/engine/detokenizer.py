"""Incremental detokenization (role of reference
``v1/engine/detokenizer.py:87``).

Uses the standard two-offset scheme: tokens in [prefix_offset,
read_offset) were already surfaced; new text is the decode of
[prefix_offset, n) minus the decode of [prefix_offset, read_offset),
withheld while it ends in a replacement char (incomplete UTF-8 /
byte-fallback sequences).
"""

from typing import List, Optional, Tuple


class IncrementalDetokenizer:

    def __init__(self, tokenizer, skip_special_tokens: bool = True):
        self.tokenizer = tokenizer
        self.skip = skip_special_tokens
        self.token_ids: List[int] = []
        self.prefix_offset = 0
        self.read_offset = 0
        self.output_text = ""

    def update(self, new_token_ids: List[int]) -> str:
        """Append tokens; returns newly decoded text (may be '')."""
        self.token_ids.extend(new_token_ids)
        prefix = self.tokenizer.decode(
            self.token_ids[self.prefix_offset:self.read_offset],
            skip_special_tokens=self.skip)
        full = self.tokenizer.decode(
            self.token_ids[self.prefix_offset:],
            skip_special_tokens=self.skip)
        if len(full) > len(prefix) and not full.endswith("�"):
            new_text = full[len(prefix):]
            self.prefix_offset = self.read_offset
            self.read_offset = len(self.token_ids)
            self.output_text += new_text
            return new_text
        return ""


def check_stop_strings(output_text: str, stop: List[str],
                       include_in_output: bool) -> Optional[Tuple[str, int]]:
    """Returns (stop_string, truncate_to_len) when a stop string is found
    (role of reference stop-string checks in the output processor)."""
    for s in stop:
        idx = output_text.find(s)
        if idx != -1:
            if include_in_output:
                return s, idx + len(s)
            return s, idx
    return None
