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


def _merge_fold(sym_col, pairs: list[tuple[str, str]]):
    """Rewrite a symbol array merging adjacent (a, b) -> a+b for every
    pair in ``pairs``, greedy left-to-right non-overlapping (a merged
    symbol never re-merges with the next element in the same pass) —
    Sennrich's update rule. With multiple pairs the single pass equals
    applying them sequentially BECAUSE the batch selector only admits
    symbol-disjoint pairs (no shared members, no produced-symbol
    collisions), so no two pairs' merge sites can overlap or abut."""

    def step(acc, s):
        branch = None
        for a, b in pairs:
            cond = (
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(a))
                & (s == F.lit(b))
            )
            merged = F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
            )
            branch = (
                F.when(cond, merged) if branch is None else branch.when(cond, merged)
            )
        return branch.otherwise(F.concat(acc, F.array(s)))

    return F.aggregate(sym_col, F.array().cast("array<string>"), step)


def _select_batch(
    rows: list, list_exhausted: bool, min_pair_count: int
) -> list[tuple[str, str]]:
    """Pick the longest prefix of the total-ordered pair list (count
    desc, left asc, right asc) that provably yields the IDENTICAL merge
    sequence as one-at-a-time greedy — the fastBPE batching trick made
    exact. Driver-side over ≤ top-K collected rows (bounded metadata).

    Admission: a candidate is rejected (ending the prefix) if it shares
    a symbol with an accepted pair, if one of its symbols equals an
    accepted pair's concatenation (that merge could boost or create it
    mid-batch), or if its concatenation equals an accepted symbol (its
    own application could feed an earlier pair's sites in the shared
    fold pass).

    Why the kept prefix equals sequential greedy, case by case, at
    sequential step j (merges 1..j-1 applied):
    - old pairs disjoint from the batch: counts invariant; they sort
      after p_j (the scan accepted everything before the break), so
      p_j wins even on count ties (tie-break order is preserved).
    - old pairs sharing a symbol with an applied merge: merges only
      DECREASE their counts, and they sorted after p_j to begin with.
    - NEW pairs (prev, a_i b_i), (a_i b_i, next), (a_i b_i, a_i b_i)
      (and multi-merge variants like (a_1 b_1, a_2 b_2)): every
      occurrence comes from an occurrence of a PROGENITOR adjacency —
      a pair r with r.y == a_i (site "...prev a_i b_i") or
      r.x == b_i (site "a_i b_i next..."), which conflicts with merge
      i — so its count is bounded by conf_i = the max original count
      among such progenitors. A new pair's tie-break name vs p_j is
      unpredictable, so p_j is kept only if c_j > max_{i<j} conf_i —
      strictly, killing ties. Pairs merely SHARING a symbol without
      being progenitors ((a_i, next), (prev, b_i)) create nothing and
      don't enter conf_i.
    conf_i scans the sorted non-accepted rows; when the collected list
    was truncated, the last seen count bounds every unseen progenitor
    the same way."""
    accepted: list[tuple[str, str, int]] = []
    syms: set[str] = set()
    produced: set[str] = set()
    brk = len(rows)
    for idx, r in enumerate(rows):
        x, y, c = r["x"], r["y"], int(r["c"])
        if (
            c < min_pair_count
            or x in syms or y in syms
            or x in produced or y in produced
            or (x + y) in syms
        ):
            brk = idx
            break
        accepted.append((x, y, c))
        syms.update((x, y))
        produced.add(x + y)
    tail = rows[brk:]
    unseen = int(rows[-1]["c"]) if (rows and not list_exhausted) else -1
    kept: list[tuple[str, str]] = []
    running = -1  # max conf_i over already-kept pairs
    for x, y, c in accepted:
        if c <= running:
            break
        kept.append((x, y))
        conf = unseen
        for r in tail:  # sorted desc: first progenitor hit is the max
            if r["y"] == x or r["x"] == y:
                conf = max(conf, int(r["c"]))
                break
        running = max(running, conf)
    return kept if kept else [(rows[0]["x"], rows[0]["y"])]


def learn_bpe(
    words: DataFrame,
    n_merges: int,
    min_pair_count: int = 2,
    batch_max: int = 16,
    stats: dict | None = None,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn up to `n_merges` BPE merges from a (word, count) table.

    Returns (merges, vocab): the ordered merge list and the word table
    with its final symbol segmentation (word, sym: array<string>,
    count). Stops early when no pair reaches `min_pair_count`.

    Each PASS runs one top-K action over the vocab-sized pair table and
    applies up to ``batch_max`` merges in a single fold rewrite — only
    pairs whose one-at-a-time greedy selection is provable from the
    collected counts (see :func:`_select_batch`), so the merge sequence
    is bit-identical to ``batch_max=1`` while the driver-synchronous
    job count drops from O(n_merges) toward O(n_merges / batch). A
    production 30-50k-merge vocab is driver-latency-bound without this.
    The symbol rewrite is a JVM fold and the table is localCheckpoint'd
    so lineage stays depth-1 across passes. Pass ``stats={}`` to get
    the pass count back (``stats['passes']``).
    """
    if n_merges < 0:
        raise ValueError("n_merges must be >= 0")
    if batch_max < 1:
        raise ValueError("batch_max must be >= 1")
    vocab = words.select(
        "word",
        _char_syms(F.col("word")).alias("sym"),
        F.col("count").cast("long").alias("count"),
    ).localCheckpoint()
    merges: list[tuple[str, str]] = []
    passes = 0
    while len(merges) < n_merges:
        top_k = max(4 * batch_max, batch_max + 8)
        n = F.greatest(F.size("sym") - 1, F.lit(0))
        pair_df = (
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
        )
        pair_rows = (
            pair_df
            .orderBy(F.col("c").desc(), F.col("x").asc(), F.col("y").asc())
            .limit(top_k)
            .collect()
        )
        if not pair_rows or pair_rows[0]["c"] < min_pair_count:
            break
        batch = _select_batch(
            pair_rows, len(pair_rows) < top_k, min_pair_count
        )[: min(batch_max, n_merges - len(merges))]
        if len(batch) > 1:
            # airtight collision probe against the FULL pair table (the
            # top-K window can't see it): if a batch pair's produced
            # string a+b already exists as a symbol adjacent to anything
            # (possible when two historic merges concatenate to the same
            # string), applying the batch could BOOST that old pair's
            # count mid-batch and sequential greedy might pick it — so
            # the batch is cut before the first such pair. One
            # metadata-scale job per pass, only when batching.
            concats = [a + b for a, b in batch]
            colliding = {
                s
                for r in pair_df.where(
                    F.col("x").isin(concats) | F.col("y").isin(concats)
                )
                .select("x", "y")
                .collect()
                for s in (r["x"], r["y"])
                if s in set(concats)
            }
            if colliding:
                cut = next(
                    i for i, (a, b) in enumerate(batch) if a + b in colliding
                )
                batch = batch[:cut] if cut > 0 else batch[:1]
        merges.extend((a, b) for a, b in batch)
        vocab = vocab.select(
            "word", _merge_fold(F.col("sym"), list(batch)).alias("sym"), "count"
        ).localCheckpoint()
        passes += 1
    if stats is not None:
        stats["passes"] = passes
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
