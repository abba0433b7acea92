"""Guided decoding: regex NFA engine, choice/json FSMs, and e2e
constrained generation incl. logit_bias / allowed_token_ids / bad_words
(role of reference tests/model_executor/test_guided_processors.py)."""

import json

import numpy as np
import pytest

from vllm_pq_tpu.guided.fsm import RegexFSM, _advance_chars, _compile, \
    _eps_closure, _json_schema_to_regex


def _matches(pattern: str, text: str) -> bool:
    nfa, start, accept = _compile(pattern)
    state = _eps_closure(nfa, frozenset([start]))
    state = _advance_chars(nfa, state, text)
    return bool(state) and accept in state


@pytest.mark.parametrize("pat,yes,no", [
    ("abc", ["abc"], ["ab", "abcd", "abx"]),
    ("a+b*", ["a", "aab", "abbb"], ["", "b", "ba"]),
    ("(cat|dog)", ["cat", "dog"], ["ca", "catdog", "cow"]),
    (r"\d{2,4}", ["12", "123", "1234"], ["1", "12345", "ab"]),
    ("[a-c]x?", ["a", "bx", "c"], ["d", "axx"]),
    (r'"[^"]*"', ['""', '"hi"'], ['"', 'hi']),
    (r"-?\d+(\.\d+)?", ["5", "-3.25", "100"], ["-", "3.", ".5"]),
])
def test_regex_engine(pat, yes, no):
    for t in yes:
        assert _matches(pat, t), (pat, t)
    for t in no:
        assert not _matches(pat, t), (pat, t)


def test_json_schema_regex():
    pat = _json_schema_to_regex(
        {"type": "object",
         "properties": {"name": {"type": "string"},
                        "age": {"type": "integer"}}})
    assert _matches(pat, '{"name": "bob","age": 33}'.replace(", ", ","))
    assert not _matches(pat, '{"name": 3,"age": 33}'.replace(", ", ","))


class _CharTok:
    """1 char = 1 token toy tokenizer for FSM unit tests."""
    vocab_size = 128
    eos_token_id = 0

    def decode(self, ids):
        return "".join(chr(i) for i in ids if 32 <= i < 127)

    def encode(self, s):
        return [ord(c) for c in s]


def test_choice_fsm_walk():
    from vllm_pq_tpu.guided import build_guided_fsm
    from vllm_pq_tpu.sampling_params import GuidedDecodingParams
    fsm = build_guided_fsm(GuidedDecodingParams(choice=["yes", "no"]),
                           _CharTok())
    m = fsm.allowed_mask()
    assert m[ord("y")] and m[ord("n")]
    assert not m[ord("x")] and not m[0]
    fsm.advance(ord("y"))
    m = fsm.allowed_mask()
    assert m[ord("e")] and not m[ord("o")]
    fsm.advance(ord("e"))
    fsm.advance(ord("s"))
    m = fsm.allowed_mask()
    assert m[0]  # eos allowed at accept state
    assert not m[ord("y")]


# ---------------------------------------------------------------------------
# e2e with the engine (byte-fallback tokenizer: 1 byte = 1 token + 3)

TINY = {
    "architectures": ["LlamaForCausalLM"],
    "vocab_size": 512,
    "hidden_size": 128,
    "intermediate_size": 256,
    "num_hidden_layers": 2,
    "num_attention_heads": 2,
    "num_key_value_heads": 2,
    "max_position_embeddings": 512,
}


@pytest.fixture(scope="module")
def llm(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_guided_model")
    with open(d / "config.json", "w") as f:
        json.dump(TINY, f)
    from vllm_pq_tpu import LLM
    return LLM(model=str(d), load_format="dummy", dtype="float32",
               max_model_len=128, max_num_seqs=8,
               max_num_batched_tokens=128, block_size=16, num_kv_blocks=64)


def test_e2e_guided_choice(llm):
    from vllm_pq_tpu import SamplingParams
    from vllm_pq_tpu.sampling_params import GuidedDecodingParams
    sp = SamplingParams(
        temperature=0.0, max_tokens=16,
        guided_decoding=GuidedDecodingParams(choice=["apple", "banana"]))
    outs = llm.generate(["pick a fruit:"], sp)
    text = outs[0].outputs[0].text
    assert text in ("apple", "banana"), text


def test_e2e_guided_regex(llm):
    from vllm_pq_tpu import SamplingParams
    from vllm_pq_tpu.sampling_params import GuidedDecodingParams
    sp = SamplingParams(
        temperature=0.0, max_tokens=8,
        guided_decoding=GuidedDecodingParams(regex=r"[ab]{3}"))
    text = llm.generate(["x"], sp)[0].outputs[0].text
    assert len(text) == 3 and set(text) <= {"a", "b"}, text


def test_e2e_allowed_token_ids(llm):
    from vllm_pq_tpu import SamplingParams
    allowed = [65, 66, 67]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True,
                        allowed_token_ids=allowed)
    toks = llm.generate(["q"], sp)[0].outputs[0].token_ids
    eos = llm.get_tokenizer().eos_token_id
    assert all(t in allowed + [eos] for t in toks), toks


def test_e2e_logit_bias_forces_token(llm):
    from vllm_pq_tpu import SamplingParams
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True,
                        logit_bias={100: 1000.0})
    toks = llm.generate(["q"], sp)[0].outputs[0].token_ids
    assert toks == [100, 100, 100, 100], toks


def test_e2e_bad_words_bans_continuation(llm):
    from vllm_pq_tpu import SamplingParams
    # byte-fallback tokenizer: "C" <-> token 70 roundtrips exactly.
    # Bias token 70 to be the runaway argmax, then ban the word "C":
    # generation must pick something else despite the bias.
    bias = {70: 1000.0}
    base = llm.generate(["w"], SamplingParams(
        temperature=0.0, max_tokens=1, ignore_eos=True,
        logit_bias=bias))[0]
    assert base.outputs[0].token_ids[0] == 70
    sp = SamplingParams(temperature=0.0, max_tokens=1, ignore_eos=True,
                        logit_bias=bias, bad_words=["C"])
    got = llm.generate(["w"], sp)[0].outputs[0].token_ids[0]
    assert got != 70


# ---------------------------------------------------------------------------
# EBNF grammar-guided decoding (round 2; reference
# guided_decoding/__init__.py:106 grammar routing via xgrammar)

JSON_GRAMMAR = r'''
root ::= object
object ::= "{" ws (pair ("," ws pair)*)? ws "}"
pair ::= string ":" ws value
value ::= string | number | object | "true" | "false" | "null"
string ::= "\"" [a-zA-Z0-9 _-]* "\""
number ::= "-"? [0-9]+ ("." [0-9]+)?
ws ::= [ ]*
'''


def _grammar_matches(grammar, text):
    from vllm_pq_tpu.guided.grammar import GrammarNFA
    from vllm_pq_tpu.guided.fsm import _advance_chars, _eps_closure
    g = GrammarNFA(grammar)
    state = _eps_closure(g.nfa, frozenset([g.start]))
    state = _advance_chars(g.nfa, state, text)
    return bool(state) and g.accept in state


def test_grammar_nfa_json():
    ok = ['{}', '{"a":1}', '{"a":"x", "b":2}', '{"a":{"b":{"c":3}}}',
          '{"n":-3.25}']
    bad = ['{', '{"a":}', '{"a":1,}', '{a:1}', '{"a":1}}']
    for t in ok:
        assert _grammar_matches(JSON_GRAMMAR, t), t
    for t in bad:
        assert not _grammar_matches(JSON_GRAMMAR, t), t


def test_grammar_recursion_bounded():
    # nesting beyond max_depth is not generatable (guided generation
    # steers the model away from it) but never accepts invalid strings
    deep = '{"a":' * 30 + '1' + '}' * 30
    assert not _grammar_matches(JSON_GRAMMAR, deep)


def test_grammar_fsm_token_walk():
    from vllm_pq_tpu.guided.grammar import build_grammar_fsm
    tok = _CharTok()
    strs = [tok.decode([i]) or None for i in range(tok.vocab_size)]
    fsm = build_grammar_fsm(JSON_GRAMMAR, strs, tok.eos_token_id)
    text = '{"k":"v"}'
    for ch in text:
        mask = fsm.allowed_mask()
        assert mask[ord(ch)], ch
        fsm.advance(ord(ch))
    assert fsm.allowed_mask()[tok.eos_token_id]


def test_e2e_guided_grammar(llm):
    """A nontrivial grammar drives generation to a valid string."""
    from vllm_pq_tpu import SamplingParams
    from vllm_pq_tpu.sampling_params import GuidedDecodingParams
    grammar = r'''
root ::= "move " direction " " steps
direction ::= "north" | "south" | "east" | "west"
steps ::= [1-9] [0-9]?
'''
    sp = SamplingParams(
        temperature=0.0, max_tokens=24,
        guided_decoding=GuidedDecodingParams(grammar=grammar))
    outs = llm.generate(["go:"], sp)
    text = outs[0].outputs[0].text
    import re
    assert re.fullmatch(r"move (north|south|east|west) [1-9][0-9]?",
                        text), text


def test_json_schema_nested_anyof_optional():
    pat = _json_schema_to_regex({
        "type": "object",
        "properties": {
            "user": {"type": "object",
                     "properties": {"id": {"type": "integer"}}},
            "tags": {"type": "array", "items": {"type": "string"}},
            "note": {"anyOf": [{"type": "string"}, {"type": "null"}]},
        },
        "required": ["user", "tags"],
    })
    ok = '{"user": {"id": 7},"tags": ["a","b"],"note": null}'
    assert _matches(pat, ok.replace(", ", ","))
    ok2 = '{"user": {"id": 7},"tags": []}'
    assert _matches(pat, ok2.replace(", ", ","))
    bad = '{"tags": ["a"]}'
    assert not _matches(pat, bad)


def test_json_schema_ref():
    pat = _json_schema_to_regex({
        "$defs": {"pt": {"type": "object",
                         "properties": {"x": {"type": "integer"},
                                        "y": {"type": "integer"}}}},
        "type": "object",
        "properties": {"a": {"$ref": "#/$defs/pt"},
                       "b": {"$ref": "#/$defs/pt"}},
    })
    assert _matches(pat, '{"a": {"x":1,"y":2},"b": {"x":3,"y":4}}'
                    .replace(", ", ","))
