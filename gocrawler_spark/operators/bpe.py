"""Distributed BPE tokenizer training (Sennrich et al. 2016).

Training a byte-pair-encoding vocabulary is the canonical pretraining-
prep step the reference stack has no analogue for. The distributed
shape that makes it work at 100 TB:

 - **Corpus-scale work is ONE aggregation.** `word_counts` reduces the
   corpus to a (word, count) table — the only pass that touches every
   byte. Everything after runs over the *distinct-word* table, which is
   vocabulary-scale (10^7-ish rows for a web corpus), not corpus-scale.
 - **Each merge is one vocab-table pass.** Per merge: count adjacent
   symbol pairs weighted by word frequency (explode + groupBy,
   map-side partial), take the argmax pair (one TakeOrdered driver
   scalar — the same bounded-metadata pattern as the robots probe),
   and rewrite the symbol arrays with a JVM `aggregate` fold that
   merges left-to-right non-overlapping — Sennrich's exact greedy
   semantics, no regex quoting hazards, no UDF. The table is
   localCheckpoint'd per merge so Catalyst never sees nested folds.
 - **Applying the tokenizer is a broadcast-join lookup.** A word's BPE
   segmentation depends only on the word, so `bpe_segment` joins each
   document's words against the trained vocab and falls back to
   character symbols for OOV words — zero per-token Python.

Determinism: ties on pair count break (count desc, left asc, right asc)
and the fold is order-exact, so the merge sequence is reproducible on
any cluster size — the pure-Python reference in tests must produce the
identical sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import tokens

__all__ = ["word_counts", "learn_bpe", "bpe_segment"]

_EOW = "</w>"


def _char_syms(word_col):
    """Character symbols of a word + the end-of-word marker. split on
    the empty pattern runs with Java's limit=-1, which KEEPS a trailing
    zero-width match as an empty string — filter it, or every word
    trains a phantom '' symbol."""
    chars = F.filter(F.split(word_col, ""), lambda c: c != "")
    return F.concat(chars, F.array(F.lit(_EOW)))


def word_counts(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) over the lowercase whitespace tokens — the single
    corpus-scale pass of BPE training."""
    return (
        corpus.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def _merge_fold(sym_col, a: str, b: str):
    """Rewrite a symbol array merging adjacent (a, b) -> a+b, greedy
    left-to-right non-overlapping (a merged symbol never re-merges with
    the next element in the same pass) — Sennrich's update rule."""
    return F.aggregate(
        sym_col,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def learn_bpe(
    words: DataFrame,
    n_merges: int,
    min_pair_count: int = 2,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn up to `n_merges` BPE merges from a (word, count) table.

    Returns (merges, vocab): the ordered merge list and the word table
    with its final symbol segmentation (word, sym: array<string>,
    count). Stops early when no pair reaches `min_pair_count`.

    Each iteration runs one argmax action over the vocab-sized pair
    table; the symbol rewrite is a JVM fold and the table is
    localCheckpoint'd so lineage stays depth-1 across merges.
    """
    if n_merges < 0:
        raise ValueError("n_merges must be >= 0")
    vocab = words.select(
        "word",
        _char_syms(F.col("word")).alias("sym"),
        F.col("count").cast("long").alias("count"),
    ).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        n = F.greatest(F.size("sym") - 1, F.lit(0))
        pair_rows = (
            vocab.select(
                "count",
                F.explode(
                    F.zip_with(
                        F.slice("sym", 1, n),
                        F.slice("sym", 2, n),
                        lambda x, y: F.struct(x.alias("x"), y.alias("y")),
                    )
                ).alias("p"),
            )
            .groupBy("p.x", "p.y")
            .agg(F.sum("count").alias("c"))
            .orderBy(F.col("c").desc(), F.col("x").asc(), F.col("y").asc())
            .limit(1)
            .collect()
        )
        if not pair_rows or pair_rows[0]["c"] < min_pair_count:
            break
        a, b = pair_rows[0]["x"], pair_rows[0]["y"]
        merges.append((a, b))
        vocab = vocab.select(
            "word", _merge_fold(F.col("sym"), a, b).alias("sym"), "count"
        ).localCheckpoint()
    return merges, vocab


def bpe_segment(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize documents with a trained vocab: (id_col, bpe_tokens,
    n_bpe_tokens), token order preserved.

    Seen words take their trained segmentation via a broadcast join;
    OOV words fall back to character symbols + '</w>' (the untrained
    state — correct for any word no merge ever touched). Documents with
    no tokens keep their row with an empty token array.
    """
    pos_words = docs.select(
        F.col(id_col),
        F.posexplode_outer(tokens(F.col(text_col))).alias("pos", "word"),
    )
    fallback = _char_syms(F.col("word"))
    seg = pos_words.join(
        F.broadcast(vocab.select("word", "sym")), "word", "left"
    ).select(
        id_col,
        "pos",
        F.when(F.col("word").isNotNull(), F.coalesce("sym", fallback)).alias(
            "toks"
        ),
    )
    return seg.groupBy(id_col).agg(
        F.coalesce(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("toks").isNotNull(),
                                F.struct("pos", "toks"),
                            )
                        )
                    ),
                    lambda s: s["toks"],
                )
            ),
            F.array().cast("array<string>"),
        ).alias("bpe_tokens")
    ).withColumn("n_bpe_tokens", F.size("bpe_tokens"))
