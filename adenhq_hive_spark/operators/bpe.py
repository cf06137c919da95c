"""Byte-pair-encoding merge training over a distributed corpus — the
tokenizer-building step of an LLM data pipeline, Spark-first.

Classic BPE (Sennrich et al. 2016, public) greedily merges the most
frequent adjacent symbol pair for N rounds. The distributed formulation
here:

- pair counting is one zip_with bigram explode + hash aggregation over
  the whole corpus (the same shuffle shape as any groupBy — scales);
- the per-round argmax is a 1-row driver fetch (bounded by construction:
  one (pair, count) row per round, never data);
- applying a merge is a WITHIN-ROW sequential fold: zip each token with
  its successor and F.aggregate a (out, skip) accumulator across the
  pairs — the "can't express sequential logic in SQL" step, expressed
  in Catalyst higher-order functions with zero Python in the executor;
- lineage is cut every few rounds (localCheckpoint / reliable
  checkpoint via dedup._cut_lineage) so N rounds of plan growth don't
  drown Catalyst re-analysis — same pattern as the connected-components
  loop.

Token-level merges (phrase-BPE over the whitespace token stream — the
corpus contract used by every oracle); character-level BPE is the same
algebra with a split-to-chars initial state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _cut_lineage

# module-level pandas alias so pandas_udf's stringified type hints
# (from __future__ import annotations) resolve in module globals
import pandas as pd  # noqa: E402

MERGE_SEP = " "


def _adjacent_pairs(toks_col: str) -> F.Column:
    """Array of (t, n) structs for each adjacent token pair; the final
    (last, null) struct is filtered by the null test on n."""
    shifted = F.expr(f"slice({toks_col}, 2, size({toks_col}))")
    return F.filter(
        F.zip_with(
            F.col(toks_col),
            shifted,
            lambda t, n: F.struct(t.alias("t"), n.alias("n")),
        ),
        lambda p: p["n"].isNotNull(),
    )


def _apply_merge(toks_col: str, left: str, right: str) -> F.Column:
    """Merge every adjacent (left, right) token pair into one token —
    a left-to-right sequential fold over (token, next) pairs with a
    skip flag, entirely within the row."""
    merged_tok = left + MERGE_SEP + right
    shifted = F.expr(f"slice({toks_col}, 2, size({toks_col}))")
    pairs = F.zip_with(
        F.col(toks_col),
        shifted,
        lambda t, n: F.struct(t.alias("t"), n.alias("n")),
    )
    return F.aggregate(
        pairs,
        F.struct(
            F.array().cast("array<string>").alias("out"),
            F.lit(False).alias("skip"),
        ),
        lambda acc, p: F.when(
            acc["skip"],
            F.struct(acc["out"].alias("out"), F.lit(False).alias("skip")),
        )
        .when(
            (p["t"] == left) & (p["n"] == right),
            F.struct(
                F.concat(acc["out"], F.array(F.lit(merged_tok))).alias("out"),
                F.lit(True).alias("skip"),
            ),
        )
        .otherwise(
            F.struct(
                F.concat(acc["out"], F.array(p["t"])).alias("out"),
                F.lit(False).alias("skip"),
            )
        ),
        lambda acc: F.when(
            # a 1-token document never enters the fold (no pairs) —
            # keep its single token
            F.size(F.col(toks_col)) == 1, F.col(toks_col)
        ).otherwise(acc["out"]),
    )


END_OF_WORD = "</w>"


def bpe_train(
    df: DataFrame,
    n_merges: int = 10,
    min_freq: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoint_every: int = 4,
    char_level: bool = False,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges over the corpus token stream.

    Returns (merges, tokenized): merges as (left, right, corpus_freq)
    in learned order — deterministic via the (freq desc, left, right)
    tie-break — and the corpus with a ``toks`` column in the final
    merged state. Stops early when no pair reaches ``min_freq``.

    ``char_level=True`` is the classic tokenizer-training mode: the
    initial symbol stream is every word split to characters with an
    END_OF_WORD marker appended, and pairs whose LEFT symbol is the
    marker are excluded from counting — merges therefore never cross a
    word boundary (Sennrich et al.'s formulation); token-level
    (default) learns phrase merges over whitespace tokens.
    """
    base_toks = F.filter(
        F.split(F.lower(F.col(text_col)), " "), lambda t: t != ""
    )
    if char_level:
        toks_col = F.flatten(
            F.transform(
                base_toks,
                lambda w: F.concat(
                    F.split(w, ""), F.array(F.lit(END_OF_WORD))
                ),
            )
        )
    else:
        toks_col = base_toks
    work = df.select(F.col(id_col), toks_col.alias("toks"))
    merges: list[tuple[str, str, int]] = []
    for r in range(n_merges):
        pair_rows = work.select(
            F.explode(_adjacent_pairs("toks")).alias("p")
        )
        if char_level:
            pair_rows = pair_rows.filter(
                F.col("p.t") != END_OF_WORD
            )
        top = (
            pair_rows.groupBy("p.t", "p.n")
            .agg(F.count("*").alias("c"))
            .orderBy(F.desc("c"), "t", "n")
            .limit(1)
            .collect()
        )
        if not top or top[0]["c"] < min_freq:
            break
        left, right, freq = top[0]["t"], top[0]["n"], top[0]["c"]
        merges.append((left, right, freq))
        work = work.withColumn("toks", _apply_merge("toks", left, right))
        if (r + 1) % checkpoint_every == 0:
            work = _cut_lineage(work)
    return merges, work


def bpe_merge_table(
    spark, merges: list[tuple[str, str, int]]
) -> DataFrame:
    """The learned merge list as a (rank, left, right, freq) DataFrame —
    the artifact a tokenizer builds from (tiny; driver-local by
    nature)."""
    rows = [
        (i + 1, left, right, freq)
        for i, (left, right, freq) in enumerate(merges)
    ]
    return spark.createDataFrame(rows, ["rank", "left", "right", "freq"])


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
    char_level: bool = False,
    out_col: str = "toks",
) -> DataFrame:
    """Apply a trained merge list to a corpus — the tokenizer-APPLY step
    (``bpe_train`` is the build step; this encodes new text with the
    frozen artifact, the shape every training pipeline runs at much
    larger scale than training the tokenizer itself).

    Classic greedy BPE encoding: repeatedly merge the adjacent pair with
    the lowest merge rank until none applies. Merging the lowest rank
    first is equivalent to replaying the merges in learned order, so the
    output state matches ``bpe_train``'s final ``toks`` exactly (pinned
    in tests).

    The merge table is driver-small by construction (vocab-sized); it
    ships to executors once via the UDF closure (broadcast semantics)
    and each document encodes independently — embarrassingly parallel,
    zero shuffle. The per-doc merge loop is inherently sequential
    data-dependent rewriting — exactly the "genuinely can't express in
    built-ins" case for an Arrow-batched pandas UDF (the documented
    slow path; bpe.py's within-row fold covers the one-merge-at-a-time
    form, but N merges of plan growth would drown Catalyst where a
    closure loop is O(1) plan).
    """
    from pyspark.sql.functions import pandas_udf

    ranks: dict[tuple[str, str], int] = {
        (left, right): i for i, (left, right, _f) in enumerate(merges)
    }
    sep = MERGE_SEP
    eow = END_OF_WORD
    is_char = char_level

    def _encode_one(text: str | None) -> list[str] | None:
        if text is None:
            return None
        words = [w for w in text.lower().split(" ") if w != ""]
        if is_char:
            toks: list[str] = []
            for w in words:
                toks.extend(list(w))
                toks.append(eow)
        else:
            toks = words
        while len(toks) > 1:
            best_rank = None
            best_pair = None
            for a, b in zip(toks, toks[1:]):
                r = ranks.get((a, b))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_pair = r, (a, b)
            if best_pair is None:
                break
            left, right = best_pair
            merged = left + sep + right
            out: list[str] = []
            i = 0
            while i < len(toks):
                if (
                    i + 1 < len(toks)
                    and toks[i] == left
                    and toks[i + 1] == right
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            toks = out
        return toks

    @pandas_udf("array<string>")
    def encode(col: pd.Series) -> pd.Series:
        return col.map(_encode_one)

    return df.select(
        F.col(id_col),
        encode(F.col(text_col)).alias(out_col),
    ).withColumn("n_tokens", F.size(F.col(out_col)))
