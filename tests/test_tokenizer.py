"""TiktokenTokenizer: offline Qwen2 BPE from a tiktoken rank file.

Covers the file reader, greedy-merge BPE (pure-Python path), the fast
tiktoken path when the wheel is present (both must agree), ChatML special
tokens, and the load_tokenizer selection policy. The real 151k-rank Qwen
file is exercised when present on disk (skipped otherwise — the repo
stays standalone)."""

import base64
import os

import pytest

from audio_calm_tpu.config import CALMModelConfig
from audio_calm_tpu.data.tokenizer import (
    ByteTokenizer, TiktokenTokenizer, load_tokenizer,
)

pytestmark = pytest.mark.fast

REAL_VOCAB = "/root/reference/models/qwen.tiktoken"


def _write_tiny_vocab(path):
    """256 byte tokens + a few valid merges (each multi-byte token is the
    concatenation of two earlier tokens)."""
    lines = []
    rank = 0
    for b in range(256):
        lines.append(f"{base64.b64encode(bytes([b])).decode()} {rank}")
        rank += 1
    for tok in (b"ab", b"abc", b"he", b"ll", b"llo", b"hello"):
        lines.append(f"{base64.b64encode(tok).decode()} {rank}")
        rank += 1
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return rank


def test_tiny_vocab_roundtrip_and_merges(tmp_path):
    p = str(tmp_path / "tiny.tiktoken")
    n = _write_tiny_vocab(p)
    tok = TiktokenTokenizer(p)
    assert len(tok._ranks) == n

    ids = tok.encode("hello")
    # greedy lowest-rank merging must find the single "hello" token
    assert ids == [tok._ranks[b"hello"]]
    assert tok.decode(ids) == "hello"

    # unknown text falls back through merges to single bytes
    ids2 = tok.encode("abcx")
    assert tok.decode(ids2) == "abcx"
    assert tok._ranks[b"abc"] in ids2

    # pure-Python path agrees with whatever path the instance chose
    for text in ("hello", "abc abc", "xyz!", "ababab"):
        assert tok._encode_py(text) == tok.encode(text) or tok._enc is None


def test_special_tokens(tmp_path):
    p = str(tmp_path / "tiny.tiktoken")
    _write_tiny_vocab(p)
    tok = TiktokenTokenizer(p)
    ids = tok.encode("<|im_start|>hello<|im_end|>")
    assert ids[0] == 151644 and ids[-1] == 151645
    assert tok.decode(ids) == "hello"  # specials skipped by default
    assert tok.decode(ids, skip_special_tokens=False) == (
        "<|im_start|>hello<|im_end|>"
    )
    assert tok.pad_token_id == 151643
    assert tok.eos_token_id == 151645
    assert tok.vocab_size == 151936


def test_load_tokenizer_policy(tmp_path):
    p = str(tmp_path / "tiny.tiktoken")
    _write_tiny_vocab(p)
    assert isinstance(
        load_tokenizer(CALMModelConfig(), byte_fallback=True), ByteTokenizer
    )
    cfg = CALMModelConfig(tokenizer_path=p)
    assert isinstance(load_tokenizer(cfg), TiktokenTokenizer)


@pytest.mark.skipif(not os.path.isfile(REAL_VOCAB),
                    reason="real Qwen rank file not on disk")
def test_real_qwen_vocab():
    tok = TiktokenTokenizer(REAL_VOCAB)
    assert len(tok._ranks) == 151643
    samples = [
        "Hello, world!",
        "The quick brown fox jumps over the lazy dog.",
        "<|im_start|>user\nRead this text: nineteen Reicher'd\n"
        "<|im_end|>\n<|im_start|>assistant\n",
        "numbers 1234567890 and punctuation -- ...",
    ]
    for s in samples:
        ids = tok.encode(s)
        assert all(0 <= i < tok.vocab_size for i in ids)
        assert tok.decode(ids, skip_special_tokens=False) == s
        # realistic compression: words tokenize to ~1 token each, far
        # denser than bytes (the byte fallback costs ~34% of the mix —
        # BASELINE round 4)
        assert len(ids) < len(s.encode()) / 2 + 12
    if tok._enc is not None:
        # pure-Python greedy merge == the Rust BPE on the real ranks
        for s in samples:
            assert tok._encode_py(s) == tok.encode(s)
