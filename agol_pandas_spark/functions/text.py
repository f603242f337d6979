"""Text primitives: tokenization, shingling, portable hashing.

Design constraint: every primitive must be reproducible in ANSI-ish SQL so
the DuckDB oracle can verify it value-for-value. That rules out engine
hashes (Spark murmur3 ``F.hash`` / xxhash64 vs DuckDB's hash) for checked
paths — instead :func:`portable_hash60` derives a 60-bit integer from md5
hex (both engines implement md5 identically). Spark's native ``xxhash64``
remains the right choice for non-checked internal paths (it's cheaper);
the operators take the hash as a pluggable expression.

Everything is array-valued per row (``split`` / ``transform`` /
``aggregate`` higher-order fns): tokenize→shingle→hash runs inside
whole-stage codegen with zero shuffles and zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Whitespace tokens, empties dropped (mirrors SQL
    ``list_filter(string_split_regex(text,'\\s+'), x -> x <> '')``)."""
    return F.filter(F.split(_c(col), r"\s+"), lambda x: x != "")


def distinct_tokens(col: Column | str) -> Column:
    return F.array_distinct(tokens(col))


def word_shingles(toks: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles from a token array.

    ``transform(sequence(1, size-n+1), i -> concat_ws(' ', slice(toks,i,n)))``
    — empty array when the doc has fewer than ``n`` tokens.

    The token array is let-bound via a 1-element ``transform`` lambda:
    referencing the raw ``toks`` subtree inside the per-index lambda would
    re-evaluate it (regex split included) once per shingle — O(tokens ×
    shingles) per row in interpreted higher-order-function eval.
    """
    t = _c(toks)

    def shingle(tt: Column) -> Column:
        count = F.greatest(F.size(tt) - F.lit(n - 1), F.lit(0))
        return F.when(count == 0, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(1), count),
                lambda i: F.concat_ws(" ", F.slice(tt, i, n)),
            )
        )

    return F.flatten(F.transform(F.array(t), shingle))


def portable_hash60(col: Column) -> Column:
    """60-bit integer hash = first 15 hex chars of md5, engine-portable.

    DuckDB twin: ``CAST(('0x' || substring(md5(x),1,15)) AS BIGINT)``.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def count_tokens_in(toks: Column | str, vocab: tuple[str, ...]) -> Column:
    """How many tokens fall in a fixed vocabulary (stopword-hit counter)."""
    arr = F.array(*[F.lit(v) for v in vocab])
    return F.size(F.filter(_c(toks), lambda x: F.array_contains(arr, x)))


# --- Python twins of the SQL primitives (Arrow signature kernels, r11) ---
#
# The md5 signature operators (MinHash / SimHash / winnowing / ExactSubstr
# grams) moved their per-row hashing into Arrow pandas UDFs (guide §4.2:
# batch the rows, do the per-row work in native/stdlib code). These twins
# MUST stay bit-identical to the SQL expressions above — the operators'
# oracles pin the hash values. Every twin is module-level (importable, so
# reused Python workers cache the module and the compiled regex).

import hashlib as _hashlib  # noqa: E402
import re as _re  # noqa: E402

#: Java's default ``\s`` charset — ``F.split(col, r"\s+")`` runs Java
#: regex WITHOUT UNICODE_CHARACTER_CLASS, so ``\s`` is exactly these five
#: ASCII separators + space. Python's ``\s`` would additionally match
#: Unicode whitespace (NBSP etc.) and silently drift the token stream.
_JAVA_WS = _re.compile("[ \t\n\x0b\f\r]+")


def py_tokens(text: str) -> list:
    """Python twin of :func:`tokens` (whitespace split, empties dropped)."""
    return [t for t in _JAVA_WS.split(text) if t]


def py_hash60(s: str) -> int:
    """Python twin of :func:`portable_hash60` (md5 hex → first 15 nibbles
    as a 60-bit non-negative int — both engines implement md5 identically
    over the UTF-8 bytes)."""
    return int(_hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def py_shingle_hash60s(toks: list, n: int) -> list:
    """60-bit hashes of word ``n``-gram shingles — the Python twin of
    ``transform(word_shingles(toks, n), portable_hash60)``: shingle i is
    ``" ".join(toks[i:i+n])``, empty when the doc has < n tokens."""
    m = len(toks) - (n - 1)
    if m <= 0:
        return []
    md5 = _hashlib.md5
    join = " ".join
    return [
        int(md5(join(toks[i : i + n]).encode("utf-8")).hexdigest()[:15], 16)
        for i in range(m)
    ]
