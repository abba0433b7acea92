"""Small shared utilities."""

import time
import uuid
from collections import OrderedDict
from typing import Any, Generic, Optional, TypeVar

_T = TypeVar("_T")


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def next_power_of_2(x: int) -> int:
    if x <= 1:
        return 1
    return 1 << (x - 1).bit_length()


def random_uuid() -> str:
    return str(uuid.uuid4().hex)


def now() -> float:
    return time.monotonic()


class LRUCache(Generic[_T]):
    """Minimal LRU cache keyed by hashables (used for mm-input and
    tokenizer caches)."""

    def __init__(self, capacity: int):
        self.capacity = capacity
        self._d: "OrderedDict[Any, _T]" = OrderedDict()

    def get(self, key: Any) -> Optional[_T]:
        if key not in self._d:
            return None
        self._d.move_to_end(key)
        return self._d[key]

    def put(self, key: Any, value: _T) -> None:
        self._d[key] = value
        self._d.move_to_end(key)
        if len(self._d) > self.capacity:
            self._d.popitem(last=False)

    def __contains__(self, key: Any) -> bool:
        return key in self._d

    def __len__(self) -> int:
        return len(self._d)
