"""WER / CER metrics (self-contained; the reference uses HF `evaluate`).

Standard Levenshtein edit distance over words (WER) / characters (CER), with
the reference's normalization: lowercase + strip punctuation
(eval/eval_calm.py:62-63).
"""

from __future__ import annotations

import re
from typing import List, Sequence

try:
    import audio_calm_native as _native
except ImportError:
    _native = None


def normalize_text(text: str) -> str:
    text = text.lower()
    text = re.sub(r"[^\w\s']", "", text)
    return " ".join(text.split())


def edit_distance(ref: Sequence, hyp: Sequence) -> int:
    """Levenshtein distance with O(min(len)) memory.

    Uses the C extension over int32 buffers when available (symbols are
    interned to ids first); falls back to pure Python."""
    n, m = len(ref), len(hyp)
    if n == 0:
        return m
    if m == 0:
        return n
    if _native is not None:
        import array

        ids = {}
        a = array.array("i", (ids.setdefault(s, len(ids)) for s in ref))
        b = array.array("i", (ids.setdefault(s, len(ids)) for s in hyp))
        return _native.edit_distance_i32(a.tobytes(), b.tobytes())
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        ri = ref[i - 1]
        for j in range(1, m + 1):
            cost = 0 if ri == hyp[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return prev[m]


def wer(references: List[str], predictions: List[str]) -> float:
    """Corpus-level word error rate."""
    errs, total = 0, 0
    for r, p in zip(references, predictions):
        rw, pw = r.split(), p.split()
        errs += edit_distance(rw, pw)
        total += len(rw)
    return errs / max(total, 1)


def cer(references: List[str], predictions: List[str]) -> float:
    """Corpus-level character error rate."""
    errs, total = 0, 0
    for r, p in zip(references, predictions):
        errs += edit_distance(list(r), list(p))
        total += len(r)
    return errs / max(total, 1)
