"""Byte-level fallback tokenizer.

The real deployment uses the HF Qwen2 tokenizer (AutoTokenizer at
model.qwen_path, reference train_calm.py:426). This minimal byte tokenizer
exists so the full pipeline can run in tokenizer-less environments (smoke
tests, CI): ids = bytes + 2, with 0 = pad and 1 = <|im_end|> marker.
"""

from __future__ import annotations

from typing import List


class ByteTokenizer:
    pad_token_id = 0
    eos_token_id = 1
    vocab_size = 258

    def encode(self, text: str, add_special_tokens: bool = False) -> List[int]:
        ids: List[int] = []
        # honor the ChatML end marker used in prompts/labels
        for chunk in text.split("<|im_end|>"):
            ids.extend(b + 2 for b in chunk.encode("utf-8"))
            ids.append(self.eos_token_id)
        return ids[:-1]

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        out = bytearray()
        for t in ids:
            t = int(t)
            if 2 <= t < 258:
                out.append(t - 2)
            elif not skip_special_tokens and t == self.eos_token_id:
                out.extend(b"<|im_end|>")
        return out.decode("utf-8", errors="replace")
