"""EBNF grammar-guided decoding.

Role of the reference's grammar routing
(``model_executor/guided_decoding/__init__.py:106`` — xgrammar/outlines
CFG support for ``GuidedDecodingParams.grammar``). The grammar is
compiled onto the same Thompson-NFA machinery as the regex FSM
(``guided/fsm.py``) by inlining nonterminal references up to a bounded
recursion depth: nesting deeper than ``max_depth`` is simply not
generatable, which is the right behavior for *guided generation* (the
model is steered toward valid strings; the automaton never accepts an
invalid one).

Accepted syntax (both GBNF-style ``::=`` and lark-style ``:`` rules):

    root ::= object
    object ::= "{" ws (pair ("," ws pair)*)? ws "}"
    pair ::= string ":" ws value
    value ::= string | number | object | "true" | "false" | "null"
    string ::= "\"" [a-zA-Z0-9 _-]* "\""
    number ::= "-"? [0-9]+ ("." [0-9]+)?
    ws ::= [ \t\n]*

Terminals: double- or single-quoted strings (with \\n \\t \\\\ escapes),
character classes ``[a-z0-9-]`` (same subset as the regex engine);
operators: ``|`` alternation, ``( )`` grouping, ``* + ?`` repetition.
The start symbol is ``root`` if present, else the first rule.
"""

from typing import Dict, List, Tuple

from vllm_pq_tpu.guided.fsm import _NFA, _parse_class

_DEFAULT_MAX_DEPTH = 24


class _Tok:
    def __init__(self, kind: str, val: str):
        self.kind = kind  # ref | lit | cls | op
        self.val = val

    def __repr__(self):
        return f"{self.kind}:{self.val!r}"


_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "\\": "\\", '"': '"',
            "'": "'", "0": "\0"}


def _lex_rhs(src: str) -> List[_Tok]:
    toks: List[_Tok] = []
    i = 0
    while i < len(src):
        c = src[i]
        if c in " \t":
            i += 1
            continue
        if c in "|()*+?":
            toks.append(_Tok("op", c))
            i += 1
            continue
        if c in "\"'":
            quote = c
            i += 1
            buf = []
            while i < len(src) and src[i] != quote:
                if src[i] == "\\" and i + 1 < len(src):
                    buf.append(_ESCAPES.get(src[i + 1], src[i + 1]))
                    i += 2
                else:
                    buf.append(src[i])
                    i += 1
            if i >= len(src):
                raise ValueError(f"unterminated string in rule: {src!r}")
            i += 1
            toks.append(_Tok("lit", "".join(buf)))
            continue
        if c == "[":
            depth_i = i + 1
            chars, j = _parse_class(src, depth_i)
            toks.append(_Tok("cls", chars))
            i = j
            continue
        if c.isalnum() or c in "_-":
            j = i
            while j < len(src) and (src[j].isalnum() or src[j] in "_-"):
                j += 1
            toks.append(_Tok("ref", src[i:j]))
            i = j
            continue
        raise ValueError(f"unexpected character {c!r} in grammar rule")
    return toks


def _parse_rules(grammar: str) -> Dict[str, List[_Tok]]:
    """Split the grammar into name -> rhs token list. Rules may span
    lines (a continuation line does not contain '::=' or ':=' or a
    leading name followed by ':')."""
    import re
    lines = [ln.rstrip() for ln in grammar.splitlines()]
    rules: Dict[str, str] = {}
    cur = None
    rule_re = re.compile(r"^\s*([A-Za-z_][\w-]*)\s*(::=|:=|:)\s*(.*)$")
    for ln in lines:
        stripped = ln.strip()
        if not stripped or stripped.startswith(("#", "//")):
            continue
        m = rule_re.match(ln)
        if m:
            cur = m.group(1)
            rules[cur] = m.group(3)
        elif cur is not None:
            rules[cur] += " " + stripped
        else:
            raise ValueError(f"grammar text before first rule: {ln!r}")
    if not rules:
        raise ValueError("empty grammar")
    return {k: _lex_rhs(v) for k, v in rules.items()}


class GrammarNFA:
    """Compiles the rule set into one NFA with bounded recursion."""

    def __init__(self, grammar: str, max_depth: int = _DEFAULT_MAX_DEPTH):
        self.rules = _parse_rules(grammar)
        self.max_depth = max_depth
        self.root = "root" if "root" in self.rules else \
            next(iter(self.rules))
        self.nfa = _NFA()
        # dead state: no out edges — expansion beyond max_depth
        self.dead = self.nfa.new_state()
        self.start, self.accept = self._build(self.root, 0)

    # recursive-descent over the token list of one rule, inlining refs
    def _build(self, name: str, depth: int) -> Tuple[int, int]:
        if depth > self.max_depth:
            d2 = self.nfa.new_state()
            return self.dead, d2
        toks = self.rules.get(name)
        if toks is None:
            raise ValueError(f"undefined grammar rule {name!r}")
        s, a, i = self._alt(toks, 0, depth)
        if i != len(toks):
            raise ValueError(f"trailing tokens in rule {name!r}: "
                             f"{toks[i:]}")
        return s, a

    def _alt(self, toks, i, depth):
        s0, a0, i = self._concat(toks, i, depth)
        starts, accepts = [s0], [a0]
        while i < len(toks) and toks[i].kind == "op" and \
                toks[i].val == "|":
            s1, a1, i = self._concat(toks, i + 1, depth)
            starts.append(s1)
            accepts.append(a1)
        if len(starts) == 1:
            return s0, a0, i
        s = self.nfa.new_state()
        a = self.nfa.new_state()
        for st, ac in zip(starts, accepts):
            self.nfa.eps[s].append(st)
            self.nfa.eps[ac].append(a)
        return s, a, i

    def _concat(self, toks, i, depth):
        s = self.nfa.new_state()
        a = s
        while i < len(toks) and not (
                toks[i].kind == "op" and toks[i].val in "|)"):
            s1, a1, i = self._piece(toks, i, depth)
            self.nfa.eps[a].append(s1)
            a = a1
        return s, a, i

    def _piece(self, toks, i, depth):
        s, a, i = self._atom(toks, i, depth)
        while i < len(toks) and toks[i].kind == "op" and \
                toks[i].val in "*+?":
            op = toks[i].val
            i += 1
            s2 = self.nfa.new_state()
            a2 = self.nfa.new_state()
            self.nfa.eps[s2].append(s)
            self.nfa.eps[a].append(a2)
            if op in "*?":
                self.nfa.eps[s2].append(a2)
            if op in "*+":
                self.nfa.eps[a].append(s)
            s, a = s2, a2
        return s, a, i

    def _atom(self, toks, i, depth):
        t = toks[i]
        if t.kind == "op" and t.val == "(":
            s, a, i = self._alt(toks, i + 1, depth)
            if i >= len(toks) or toks[i].kind != "op" or \
                    toks[i].val != ")":
                raise ValueError("unbalanced parentheses in grammar")
            return s, a, i + 1
        if t.kind == "lit":
            s = self.nfa.new_state()
            a = s
            for ch in t.val:
                nxt = self.nfa.new_state()
                self.nfa.edges[a].append((frozenset([ch]), nxt))
                a = nxt
            return s, a, i + 1
        if t.kind == "cls":
            s = self.nfa.new_state()
            a = self.nfa.new_state()
            self.nfa.edges[s].append((t.val, a))
            return s, a, i + 1
        if t.kind == "ref":
            s, a = self._build(t.val, depth + 1)
            return s, a, i + 1
        raise ValueError(f"unexpected token {t!r} in grammar")


def build_grammar_fsm(grammar: str, token_strs, eos_token_id,
                      max_depth: int = _DEFAULT_MAX_DEPTH):
    """Token-level FSM for an EBNF grammar (plugs into the same engine
    path as RegexFSM)."""
    from vllm_pq_tpu.guided.fsm import RegexFSM
    g = GrammarNFA(grammar, max_depth=max_depth)
    return RegexFSM.from_nfa(g.nfa, g.start, g.accept, token_strs,
                             eos_token_id)
