"""Shared word-n-gram construction, tuned for Spark's interpreted
higher-order functions.

Higher-order functions (transform/zip_with/filter) are NOT part of
whole-stage codegen — each lambda application is an interpreted
expression eval. The cost therefore scales with per-element WORK, and
the obvious ``transform(sequence(1, n), i -> concat_ws(' ', slice(toks,
i, k)))`` pays an array allocation (slice) plus a varargs join
(concat_ws) per element. Building the k-grams by k-1 pairwise
``zip_with`` passes over the token array does the same job with one
binary string concat per element per pass — measured 4.7× faster at
bench scale (0.60 s vs 2.81 s for bigrams over sf0.1 documents).

``zip_with`` pads the shorter side with null and ``concat`` propagates
null, so after k-1 passes the last k-1 slots are null — ``filter``
drops them, which also makes sub-k-word documents yield an empty array
(the naive ``sequence(1, size-k+1)`` form DESCENDS for short docs —
sequence(1, 0) == [1, 0] — and crashes in slice()).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def word_ngrams(text_col: Column, n: int, lowercase: bool = False) -> Column:
    """Array of space-joined word ``n``-grams of ``text_col``.

    Tokenization is a plain single-space split (the corpus contract used
    by every oracle); ``lowercase`` folds case before splitting. Short
    documents (< n words) yield an empty array.
    """
    src = F.lower(text_col) if lowercase else text_col
    toks = F.split(src, " ")
    out = toks
    for off in range(1, n):
        shifted = F.slice(
            toks, off + 1, F.greatest(F.size(toks) - off, F.lit(0))
        )
        out = F.zip_with(out, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    if n > 1:
        out = F.filter(out, lambda x: x.isNotNull())
    return out


def char_ngrams(text_col: Column, n: int, lowercase: bool = False) -> Column:
    """Array of character ``n``-grams of ``text_col`` — the same k-1
    pairwise ``zip_with`` device as :func:`word_ngrams` over the
    per-character array (``split(t, '')``, one linear pass).

    Replaces the ``transform(sequence(1, length(t) - n + 1), i ->
    substring(t, i, n))`` formulation, which paid O(position) per UTF8
    substring — O(len^2) byte-walking per document inside INTERPRETED
    HigherOrderFunction eval (the winnow lesson, search.py; r11
    interpreted-eval audit). Texts shorter than ``n`` chars (including
    empty) yield an empty array, so callers need no length guard.
    """
    src = F.lower(text_col) if lowercase else text_col
    cs = F.split(src, "")
    out = cs
    for off in range(1, n):
        shifted = F.slice(
            cs, off + 1, F.greatest(F.size(cs) - off, F.lit(0))
        )
        out = F.zip_with(out, shifted, lambda a, b: F.concat(a, b))
    if n > 1:
        out = F.filter(out, lambda x: x.isNotNull())
    return out
