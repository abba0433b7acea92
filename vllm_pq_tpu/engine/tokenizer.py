"""Tokenizer access (role of reference ``transformers_utils/tokenizer``).

Tries a local HF tokenizer; falls back to a self-contained byte-level
tokenizer so the engine runs in air-gapped environments (this image has
zero egress) and with dummy models.
"""

from typing import List, Optional

from vllm_pq_tpu.logger import init_logger

logger = init_logger(__name__)


class ByteTokenizer:
    """Trivial byte-level tokenizer: token = byte + 3 (0=pad, 1=bos,
    2=eos). Deterministic, reversible, vocab 259."""

    vocab_size = 259
    bos_token_id = 1
    eos_token_id = 2
    pad_token_id = 0

    def encode(self, text: str, add_special_tokens: bool = True):
        ids = [b + 3 for b in text.encode("utf-8")]
        return ([self.bos_token_id] + ids) if add_special_tokens else ids

    def decode(self, ids, skip_special_tokens: bool = True):
        # ids beyond the byte range (model vocab > 259) map to '?'
        data = bytes(min(i - 3, 255) for i in ids if i >= 3)
        text = data.decode("utf-8", errors="replace")
        if not skip_special_tokens:
            out = []
            for i in ids:
                if i == self.bos_token_id:
                    out.append("<s>")
                elif i == self.eos_token_id:
                    out.append("</s>")
                elif i >= 3:
                    out.append(chr(i - 3) if i - 3 < 128 else "?")
            return "".join(out)
        return text

    def convert_ids_to_tokens(self, ids):
        return [self.decode([i]) for i in ids]

    def apply_chat_template(self, messages, tokenize=False,
                            add_generation_prompt=True, **kw):
        text = "".join(f"<|{m['role']}|>{m['content']}\n" for m in messages)
        if add_generation_prompt:
            text += "<|assistant|>"
        return self.encode(text) if tokenize else text

    def __call__(self, text, **kw):
        return {"input_ids": self.encode(text)}


def get_tokenizer(name_or_path: str, trust_remote_code: bool = False,
                  revision: Optional[str] = None):
    try:
        from transformers import AutoTokenizer
        return AutoTokenizer.from_pretrained(
            name_or_path, trust_remote_code=trust_remote_code,
            revision=revision, local_files_only=True)
    except Exception as e:
        logger.warning(
            "No local HF tokenizer for %r (%s); using byte-level "
            "fallback tokenizer", name_or_path, type(e).__name__)
        return ByteTokenizer()
