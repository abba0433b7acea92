"""Ngram (prompt-lookup) draft proposer.

Role of the reference's ``vllm/v1/spec_decode/ngram_proposer.py``: find
the most recent occurrence of the request's trailing n-gram earlier in
its token history and propose the tokens that followed it. Host-side
numpy only — drafts are verified on device by the runner's verification
sampler (``layers/rejection.py``).
"""

from typing import List, Optional

import numpy as np


class NgramProposer:

    def __init__(self, min_n: int, max_n: int, num_spec_tokens: int):
        assert 1 <= min_n <= max_n
        self.min_n = min_n
        self.max_n = max_n
        self.k = num_spec_tokens

    def propose(self, token_ids: List[int]) -> Optional[List[int]]:
        """Returns up to k draft tokens, or None if no n-gram match.

        Tries the longest window first (more context = higher acceptance),
        matching the most recent prior occurrence.
        """
        total = len(token_ids)
        if total < self.min_n + 1:
            return None
        arr = np.asarray(token_ids, dtype=np.int64)
        for n in range(min(self.max_n, total - 1), self.min_n - 1, -1):
            tail = arr[total - n:]
            # candidate start positions of the n-gram in the history
            # (excluding the tail occurrence itself)
            window = arr[:total - 1]  # allow overlap up to the last token
            if len(window) < n:
                continue
            # vectorized sliding-window comparison
            sw = np.lib.stride_tricks.sliding_window_view(window, n)
            matches = np.nonzero((sw == tail).all(axis=1))[0]
            # a match must leave at least one token to propose
            matches = matches[matches + n < total]
            if len(matches) == 0:
                continue
            start = int(matches[-1]) + n  # most recent occurrence
            draft = arr[start:start + self.k]
            if len(draft) == 0:
                continue
            return [int(t) for t in draft]
        return None
