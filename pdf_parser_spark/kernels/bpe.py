"""Byte-pair-encoding tokenizer kernel — pure Python, Spark-free.

Classic BPE (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units", public algorithm): learn a merge table from
a word-frequency table by repeatedly fusing the most frequent adjacent
symbol pair; encode by applying merges lowest-rank-first (the GPT-2
``bpe()`` loop shape).

Shared-derivation contract (the repo's byte-identity pattern, see
CLAUDE.md): BOTH the Spark operators (functions/tokenize.py, via Arrow
``mapInPandas`` kernels) and the VALUES-oracle replica
(tools/gen_values_oracles.py) call these exact functions, including the
pre-tokenizer regex — so there is no Java-vs-Python regex semantic gap
(Java's ``\\s`` is ASCII-only, Python's is Unicode) and no forked merge
logic. Everything here is deterministic: exact integer counts, total
tie-break orders, no RNG.
"""

from __future__ import annotations

import hashlib
import re

# Pre-tokenizer: one token per CJK codepoint, then letter runs / digit
# runs / punctuation runs (the same class structure as
# quality.BPE_PATTERN, applied with Python `re` on both engines — the
# CJK ranges here are the Python-syntax twin of textseg.CJK_RANGES).
# No lookaheads, no case folding. Without the CJK branch an unspaced
# zh run is ONE punctuation-run "word", so BPE merges learn nothing
# from it; per-char pretokens are the standard fix.
_CJK = "㐀-䶿一-鿿豈-﫿぀-ヿㇰ-ㇿ"
PRETOKEN_RE = re.compile(
    f"[{_CJK}]|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s{_CJK}]+"
)


def pretokenize(text: str) -> list[str]:
    return PRETOKEN_RE.findall(text or "")


def h60(s: str) -> int:
    """Top 60 bits of md5 — the repo's cross-engine 64-bit text hash
    (same derivation as functions/hashing.hash64(fn='md5'))."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def _merge_word(syms: tuple, pair: tuple) -> tuple:
    """Fuse every (left-to-right, non-overlapping) occurrence of
    ``pair`` in ``syms``."""
    a, b = pair
    out: list = []
    i = 0
    n = len(syms)
    while i < n:
        if i < n - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def learn_merges(
    word_freqs: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a word->count table.

    Deterministic: each round picks the adjacent pair with the highest
    total count, ties broken to the lexicographically SMALLEST pair.
    Stops early when no adjacent pair remains (all words fully fused).
    """
    vocab: dict[tuple, int] = {}
    for w, f in word_freqs.items():
        if w:
            t = tuple(w)
            vocab[t] = vocab.get(t, 0) + int(f)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for j in range(len(syms) - 1):
                p = (syms[j], syms[j + 1])
                pairs[p] = pairs.get(p, 0) + f
        if not pairs:
            break
        best_count = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == best_count)
        merges.append(best)
        new_vocab: dict[tuple, int] = {}
        for syms, f in vocab.items():
            m = _merge_word(syms, best)
            new_vocab[m] = new_vocab.get(m, 0) + f
        vocab = new_vocab

    return merges


def apply_merges(
    word: str, ranks: dict[tuple[str, str], int]
) -> tuple[str, ...]:
    """Encode one pre-token: repeatedly fuse the lowest-rank adjacent
    pair present (all its occurrences per round) until none applies —
    the GPT-2 ``bpe()`` loop, which is equivalent to applying the merge
    list in learned order."""
    syms: tuple = tuple(word)
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        for j in range(len(syms) - 1):
            r = ranks.get((syms[j], syms[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_pair = (syms[j], syms[j + 1])
        if best_pair is None:
            break
        syms = _merge_word(syms, best_pair)
    return syms


def encode(
    text: str,
    ranks: dict[tuple[str, str], int],
    memo: dict[str, tuple] | None = None,
) -> list[str]:
    """Tokenize a document: pretokenize, BPE-encode each pre-token
    (memoized by word — corpora repeat words heavily)."""
    if memo is None:
        memo = {}
    out: list[str] = []
    for w in pretokenize(text):
        t = memo.get(w)
        if t is None:
            t = apply_merges(w, ranks)
            memo[w] = t
        out.extend(t)
    return out
