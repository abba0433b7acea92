"""Guided-decoding FSMs over the token vocabulary.

Role of the reference's guided-decoding logits processors
(``model_executor/guided_decoding/__init__.py:106`` — outlines /
xgrammar / lm-format-enforcer): compile a constraint (choice list, regex
subset, JSON schema subset) into a host-side automaton whose state
advances with each emitted token and yields the set of allowed next
tokens. The engine ships that set to the on-device sampler as a vocab
bitmask each step (no third-party constraint libs in this image, so the
regex engine is a small built-in Thompson NFA).

Supported regex subset: literals, ``.``, character classes
``[a-z0-9_^-]``, escapes ``\\d \\w \\s \\. ...``, grouping ``( )``,
alternation ``|``, quantifiers ``* + ? {m} {m,n}``, anchors implicit
(patterns are fully anchored like outlines).
"""

from typing import Dict, FrozenSet, List, Optional, Sequence, Set, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# Thompson NFA for the regex subset


class _NFA:
    """States are ints; transitions: state -> list of (matcher, next)
    where matcher is None (epsilon) or a frozenset of chars / predicate
    marker. Terminal state = self.accept."""

    def __init__(self):
        self.eps: List[List[int]] = []
        self.edges: List[List[Tuple[FrozenSet[str], int]]] = []

    def new_state(self) -> int:
        self.eps.append([])
        self.edges.append([])
        return len(self.eps) - 1


_CLASSES = {
    "d": set("0123456789"),
    "w": set("abcdefghijklmnopqrstuvwxyz"
             "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_"),
    "s": set(" \t\n\r\f\v"),
}
# printable ASCII universe for '.', negations
_ANY = frozenset(chr(c) for c in range(32, 127)) | {"\n", "\t"}


def _parse_class(pat: str, i: int) -> Tuple[FrozenSet[str], int]:
    """Parse a [...] class starting after '['; returns (chars, next_i)."""
    neg = False
    if i < len(pat) and pat[i] == "^":
        neg = True
        i += 1
    chars: Set[str] = set()
    first = True
    while i < len(pat) and (pat[i] != "]" or first):
        first = False
        c = pat[i]
        if c == "\\" and i + 1 < len(pat):
            nxt = pat[i + 1]
            if nxt in _CLASSES:
                chars |= _CLASSES[nxt]
                i += 2
                continue
            c = nxt
            i += 2
        else:
            i += 1
        if i < len(pat) and pat[i] == "-" and i + 1 < len(pat) \
                and pat[i + 1] != "]":
            hi = pat[i + 1]
            chars |= {chr(x) for x in range(ord(c), ord(hi) + 1)}
            i += 2
        else:
            chars.add(c)
    if i >= len(pat):
        raise ValueError("unterminated character class")
    i += 1  # skip ']'
    if neg:
        chars = set(_ANY) - chars
    return frozenset(chars), i


def _compile(pat: str) -> Tuple[_NFA, int, int]:
    """Recursive-descent regex -> NFA. Returns (nfa, start, accept)."""
    nfa = _NFA()

    def parse_alt(i: int) -> Tuple[int, int, int]:
        s0, a0, i = parse_concat(i)
        starts, accepts = [s0], [a0]
        while i < len(pat) and pat[i] == "|":
            s1, a1, i = parse_concat(i + 1)
            starts.append(s1)
            accepts.append(a1)
        if len(starts) == 1:
            return s0, a0, i
        s = nfa.new_state()
        a = nfa.new_state()
        for st, ac in zip(starts, accepts):
            nfa.eps[s].append(st)
            nfa.eps[ac].append(a)
        return s, a, i

    def parse_concat(i: int) -> Tuple[int, int, int]:
        s = nfa.new_state()
        a = s
        while i < len(pat) and pat[i] not in "|)":
            s1, a1, i = parse_piece(i)
            nfa.eps[a].append(s1)
            a = a1
        return s, a, i

    def parse_piece(i: int) -> Tuple[int, int, int]:
        s, a, i = parse_atom(i)
        while i < len(pat) and pat[i] in "*+?{":
            op = pat[i]
            if op == "{":
                j = pat.index("}", i)
                body = pat[i + 1:j]
                if "," in body:
                    lo_s, hi_s = body.split(",", 1)
                    lo = int(lo_s or 0)
                    hi = int(hi_s) if hi_s else None
                else:
                    lo = hi = int(body)
                s, a = _repeat(nfa, s, a, lo, hi)
                i = j + 1
            else:
                if op == "*":
                    ns, na = nfa.new_state(), nfa.new_state()
                    nfa.eps[ns] += [s, na]
                    nfa.eps[a] += [s, na]
                    s, a = ns, na
                elif op == "+":
                    na = nfa.new_state()
                    nfa.eps[a] += [s, na]
                    a = na
                elif op == "?":
                    ns, na = nfa.new_state(), nfa.new_state()
                    nfa.eps[ns] += [s, na]
                    nfa.eps[a].append(na)
                    s, a = ns, na
                i += 1
        return s, a, i

    def _atom_edge(chars: FrozenSet[str]) -> Tuple[int, int]:
        s, a = nfa.new_state(), nfa.new_state()
        nfa.edges[s].append((chars, a))
        return s, a

    def parse_atom(i: int) -> Tuple[int, int, int]:
        c = pat[i]
        if c == "(":
            s, a, i = parse_alt(i + 1)
            if i >= len(pat) or pat[i] != ")":
                raise ValueError("unbalanced parens")
            return s, a, i + 1
        if c == "[":
            chars, i = _parse_class(pat, i + 1)
            s, a = _atom_edge(chars)
            return s, a, i
        if c == ".":
            s, a = _atom_edge(_ANY)
            return s, a, i + 1
        if c == "\\" and i + 1 < len(pat):
            nxt = pat[i + 1]
            if nxt in _CLASSES:
                s, a = _atom_edge(frozenset(_CLASSES[nxt]))
            elif nxt in ("D", "W", "S"):
                s, a = _atom_edge(frozenset(
                    set(_ANY) - _CLASSES[nxt.lower()]))
            else:
                s, a = _atom_edge(frozenset(nxt))
            return s, a, i + 2
        s, a = _atom_edge(frozenset(c))
        return s, a, i + 1

    def _repeat(nfa, s, a, lo, hi):
        # expand {lo,hi} by duplication via subgraph cloning is complex;
        # approximate with chained optional copies using the same
        # parse — instead, rebuild by concatenating fresh parses is not
        # possible here, so use epsilon tricks: {m} and {m,n} handled by
        # the caller re-parsing is avoided — implement by linking copies
        # of the (s, a) subgraph via state duplication.
        clones = []
        mapping_cache = {}

        def clone(s0, a0):
            mapping: Dict[int, int] = {}

            def get(x):
                if x not in mapping:
                    mapping[x] = nfa.new_state()
                return mapping[x]

            stack = [s0]
            seen = set()
            while stack:
                x = stack.pop()
                if x in seen:
                    continue
                seen.add(x)
                for y in nfa.eps[x]:
                    nfa.eps[get(x)].append(get(y))
                    if y not in mapping or y not in seen:
                        stack.append(y)
                for chars, y in nfa.edges[x]:
                    nfa.edges[get(x)].append((chars, get(y)))
                    if y not in seen:
                        stack.append(y)
            return get(s0), get(a0)

        start = nfa.new_state()
        cur = start
        for k in range(lo):
            cs, ca = clone(s, a)
            nfa.eps[cur].append(cs)
            cur = ca
        accept = nfa.new_state()
        if hi is None:  # {m,}: trailing star
            cs, ca = clone(s, a)
            nfa.eps[cur] += [cs, accept]
            nfa.eps[ca] += [cs, accept]
        else:
            nfa.eps[cur].append(accept)
            for k in range(hi - lo):
                cs, ca = clone(s, a)
                nfa.eps[cur].append(cs)
                cur = ca
                nfa.eps[cur].append(accept)
        return start, accept

    s, a, i = parse_alt(0)
    if i != len(pat):
        raise ValueError(f"trailing regex input at {i}: {pat[i:]!r}")
    return nfa, s, a


def _eps_closure(nfa: _NFA, states: FrozenSet[int]) -> FrozenSet[int]:
    out = set(states)
    stack = list(states)
    while stack:
        x = stack.pop()
        for y in nfa.eps[x]:
            if y not in out:
                out.add(y)
                stack.append(y)
    return frozenset(out)


def _advance_chars(nfa: _NFA, states: FrozenSet[int],
                   text: str) -> FrozenSet[int]:
    cur = states
    for ch in text:
        nxt = set()
        for x in cur:
            for chars, y in nfa.edges[x]:
                if ch in chars:
                    nxt.add(y)
        if not nxt:
            return frozenset()
        cur = _eps_closure(nfa, frozenset(nxt))
    return cur


class RegexFSM:
    """Token-level automaton over a char NFA. Per-(fsm-state) allowed
    token sets are memoized; vocab token strings are decoded once."""

    def __init__(self, pattern: str, token_strs: Sequence[Optional[str]],
                 eos_token_id: Optional[int]):
        self.nfa, start, self.accept = _compile(pattern)
        self.start = _eps_closure(self.nfa, frozenset([start]))
        self.token_strs = token_strs
        self.eos_token_id = eos_token_id
        self._allowed_cache: Dict[FrozenSet[int], Tuple[np.ndarray, dict]] \
            = {}
        self.state = self.start

    @classmethod
    def from_nfa(cls, nfa: "_NFA", start: int, accept: int,
                 token_strs: Sequence[Optional[str]],
                 eos_token_id: Optional[int]) -> "RegexFSM":
        """Token FSM over a prebuilt NFA (guided/grammar.py EBNF path)."""
        self = cls.__new__(cls)
        self.nfa = nfa
        self.accept = accept
        self.start = _eps_closure(nfa, frozenset([start]))
        self.token_strs = token_strs
        self.eos_token_id = eos_token_id
        self._allowed_cache = {}
        self.state = self.start
        return self

    def _allowed(self, state: FrozenSet[int]):
        hit = self._allowed_cache.get(state)
        if hit is not None:
            return hit
        v = len(self.token_strs)
        mask = np.zeros(v, bool)
        nexts: Dict[int, FrozenSet[int]] = {}
        for tid, ts in enumerate(self.token_strs):
            if not ts:
                continue
            nxt = _advance_chars(self.nfa, state, ts)
            if nxt:
                mask[tid] = True
                nexts[tid] = nxt
        if self.accept in state and self.eos_token_id is not None:
            mask[self.eos_token_id] = True
        self._allowed_cache[state] = (mask, nexts)
        return mask, nexts

    # -- per-request API --------------------------------------------------

    def allowed_mask(self) -> Optional[np.ndarray]:
        if self.state is None:
            return None
        mask, _ = self._allowed(self.state)
        return mask

    def advance(self, token_id: int) -> None:
        if self.state is None:
            return
        if token_id == self.eos_token_id:
            self.state = None
            return
        _, nexts = self._allowed(self.state)
        self.state = nexts.get(token_id)  # None => dead (shouldn't happen)

    @property
    def is_terminated(self) -> bool:
        return self.state is None

    def copy(self) -> "RegexFSM":
        import copy as _c
        new = _c.copy(self)
        new.state = self.state
        return new


# ---------------------------------------------------------------------------


def _json_schema_to_regex(schema) -> str:
    """JSON-schema subset -> regex (reference delegates to outlines'
    build_regex_from_schema; this covers the common cases: nested
    objects/arrays of typed values, string/integer/number/boolean/enum,
    anyOf/oneOf alternation, $defs/$ref with bounded recursion,
    optional (non-required) properties)."""
    ws = r"[ ]?"
    root = schema if isinstance(schema, dict) else {}
    defs = {}
    for key in ("$defs", "definitions"):
        defs.update(root.get(key, {}) if isinstance(root, dict) else {})
    depth_budget = [48]  # $ref expansion budget (bounded recursion)

    def value_re(s) -> str:
        if s is True or s is None or s == {}:
            return (r'("([^"\\]|\\.){0,64}"|-?\d+(\.\d+)?'
                    r'|true|false|null)')
        if "$ref" in s:
            name = s["$ref"].split("/")[-1]
            sub = defs.get(name)
            if sub is None:
                raise ValueError(f"unresolvable $ref {s['$ref']!r}")
            depth_budget[0] -= 1
            if depth_budget[0] < 0:
                # beyond the budget the reference becomes ungeneratable
                # depth — fall back to a scalar leaf
                return r'("([^"\\]|\\.){0,64}"|-?\d+|true|false|null)'
            return value_re(sub)
        alts = s.get("anyOf") or s.get("oneOf")
        if alts:
            return "(" + "|".join(value_re(a) for a in alts) + ")"
        t = s.get("type")
        if isinstance(t, list):
            return "(" + "|".join(value_re(dict(s, type=x))
                                  for x in t) + ")"
        if "enum" in s:
            import re as _re
            opts = []
            for v in s["enum"]:
                if isinstance(v, str):
                    opts.append('"' + _re.escape(v) + '"')
                else:
                    opts.append(_re.escape(str(v).lower()))
            return "(" + "|".join(opts) + ")"
        if t == "string":
            return r'"([^"\\]|\\.){0,256}"'
        if t == "integer":
            return r"-?\d{1,12}"
        if t == "number":
            return r"-?\d{1,12}(\.\d{1,8})?"
        if t == "boolean":
            return r"(true|false)"
        if t == "null":
            return r"null"
        if t == "array":
            item = value_re(s.get("items", True))
            return (r"\[" + ws + "(" + item + "(," + ws + item +
                    r"){0,16})?" + ws + r"\]")
        if t == "object":
            props = s.get("properties", {})
            if not props:
                return r"\{[^{}]{0,256}\}"
            required = set(s.get("required", list(props)))
            names = list(props)
            # optional properties are supported when they trail the
            # required ones (outlines emits property order too); mixed
            # order falls back to all-required
            last_req = max((i for i, n in enumerate(names)
                            if n in required), default=-1)
            if any(n not in required for n in names[:last_req + 1]):
                required = set(names)
            import re as _re
            parts = []
            emitted_req = False
            for name in names:
                piece = ('"' + _re.escape(name) + '":' + ws +
                         value_re(props[name]))
                if name in required:
                    if emitted_req:
                        piece = "," + ws + piece
                    parts.append(piece)
                    emitted_req = True
                else:
                    piece2 = (("," + ws) if emitted_req else "") + piece
                    parts.append("(" + piece2 + ")?")
            return (r"\{" + ws + "".join(parts) + ws + r"\}")
        raise ValueError(f"unsupported schema: {s!r}")

    return value_re(schema)


def _vocab_token_strs(tokenizer) -> List[Optional[str]]:
    vocab = getattr(tokenizer, "vocab_size", None) or 259
    token_strs: List[Optional[str]] = []
    for tid in range(vocab):
        try:
            s = tokenizer.decode([tid])
        except Exception:  # noqa: BLE001
            s = None
        # skip specials / undecodable
        if s in (None, ""):
            s = None
        token_strs.append(s)
    return token_strs


def build_guided_fsm(params, tokenizer) -> RegexFSM:
    """Compile GuidedDecodingParams into a token FSM for this vocab."""
    import re as _re
    token_strs = _vocab_token_strs(tokenizer)
    eos = getattr(tokenizer, "eos_token_id", None)
    if getattr(params, "grammar", None) is not None:
        from vllm_pq_tpu.guided.grammar import build_grammar_fsm
        return build_grammar_fsm(params.grammar, token_strs, eos)
    if params.choice is not None:
        pattern = "(" + "|".join(_re.escape(c) for c in params.choice) + ")"
    elif params.regex is not None:
        pattern = params.regex
    elif params.json is not None:
        schema = params.json
        if isinstance(schema, str):
            import json as _json
            schema = _json.loads(schema)
        pattern = _json_schema_to_regex(schema)
    else:
        raise ValueError("unsupported guided decoding params")
    return RegexFSM(pattern, token_strs, eos)
