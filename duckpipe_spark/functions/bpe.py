"""Distributed BPE (byte-pair-encoding) merge learning + encoding
(SURVEY.md §2.14 training-data family; beyond-reference — the reference
engine has no tokenizer training surface).

Design for 100 TB — the word-frequency formulation every industrial BPE
trainer uses (Sennrich et al. 2016's own implementation does this):

* The corpus collapses to a **(word, frequency) table once** — one
  map-side-combinable aggregate whose output is corpus-VOCABULARY-sized
  (Heaps' law: ~10M rows at web scale), not corpus-sized. Every merge
  round after that touches only this bounded table.
* Each round is: adjacent-pair frequencies (explode over the symbol
  array, one aggregate, output bounded by distinct symbol pairs), the
  argmax pair (``TakeOrderedAndProject`` top-1 — a one-ROW driver
  collect, which is how every BPE trainer holds its merge list), and a
  single JVM ``replace`` rewriting the vocabulary's symbol strings.
  No Python in any per-row path.
* Encoding is a pure projection: per document, a higher-order fold over
  the token array applies the N learned replaces per token and sums
  symbol counts — no explode, no shuffle beyond the caller's.

Determinism / cross-engine exactness:

* A word's symbol sequence is ONE STRING with every symbol wrapped in
  its own separator pair: ``␟a␟␟b␟␟c␟`` (SEP = ``\\x1f``). A merge of
  (a, b) is ``replace(s, '␟a␟␟b␟', '␟ab␟')``. Wrapping each symbol
  individually (``␟a␟␟b␟``, not ``␟a␟b␟``) makes occurrences DISJOINT —
  with shared boundary separators, "a b a b" would contain two
  overlapping matches and left-to-right ``replace`` would miss every
  second one. With disjoint occurrences, Spark's and DuckDB's standard
  left-to-right non-overlapping ``replace`` semantics agree exactly,
  and both match reference BPE's "merge all occurrences, leftmost
  first" rule (e.g. "aaa" + merge(a,a) → [aa, a]).
* Ties in pair frequency break on (freq DESC, lhs ASC, rhs ASC) —
  binary collation in both engines, so the whole merge table (and every
  downstream token count) is reproducible across engines, partitionings
  and reruns.
* Words containing SEP itself are excluded from training (both engines
  apply the same rule); at encode time such tokens fall back to their
  character count. \\x1f is not Java/DuckDB ``\\s`` whitespace, so the
  rule is well-defined, and no real tokenizer corpus contains it.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from duckpipe_spark.functions.text import tokens_col

SEP = "\x1f"

MERGE_SCHEMA = "merge_rank bigint, lhs string, rhs string, pair_freq bigint"


def wrapped_symbols_col(word: Column) -> Column:
    """word → its initial BPE state: each character wrapped in its own
    separator pair, ``␟c1␟␟c2␟…␟cn␟``."""
    chars = F.filter(F.split(word, ""), lambda c: c != "")
    return F.concat(F.lit(SEP), F.array_join(chars, SEP + SEP), F.lit(SEP))


def symbols_col(s: Column) -> Column:
    """Wrapped symbol string → array of symbols (inverse of the wrap)."""
    return F.filter(F.split(s, SEP), lambda x: x != "")


def _merge_pattern(lhs: str, rhs: str) -> tuple[str, str]:
    return (SEP + lhs + SEP + SEP + rhs + SEP, SEP + lhs + rhs + SEP)


def learn_bpe_merges(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus → DataFrame
    (merge_rank, lhs, rhs, pair_freq), merge_rank 1..n (stops early if
    the vocabulary runs out of adjacent pairs).

    Iterative like ``pagerank``/``kmeans_cells``: each round launches one
    bounded aggregate job whose argmax row is collected (a single row —
    the merge table is driver-state in every real BPE trainer). The
    (word, freq) base is cached once; ``localCheckpoint`` every 4 rounds
    cuts the replace-chain lineage."""
    spark = docs.sparkSession
    words = (
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("w"))
        .where((F.col("w") != "") & ~F.col("w").contains(SEP))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wf"))
    )
    base = words.select(wrapped_symbols_col(F.col("w")).alias("s"), "wf").cache()
    cur = base
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        syms = symbols_col(F.col("s"))
        n = F.size(syms)
        # conditionally-empty index sequence — same InferFiltersFromGenerate
        # guard as dedup.shingle_hash_array
        idx = F.when(n >= 2, F.sequence(F.lit(0), n - 2)).otherwise(
            F.array().cast("array<int>")
        )
        pairs = cur.select(
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.struct(
                        F.element_at(syms, (i + 1).cast("int")).alias("lhs"),
                        F.element_at(syms, (i + 2).cast("int")).alias("rhs"),
                    ),
                )
            ).alias("p"),
            "wf",
        )
        top = (
            pairs.groupBy("p.lhs", "p.rhs")
            .agg(F.sum("wf").alias("pf"))
            .orderBy(F.col("pf").desc(), F.col("lhs").asc(), F.col("rhs").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        lhs, rhs, pf = top[0].lhs, top[0].rhs, int(top[0].pf)
        merges.append((rank, lhs, rhs, pf))
        pat, rep = _merge_pattern(lhs, rhs)
        cur = cur.withColumn("s", F.replace("s", F.lit(pat), F.lit(rep)))
        if rank % 4 == 0 and rank < n_merges:
            cur = cur.localCheckpoint()
    base.unpersist()
    return spark.createDataFrame(merges, MERGE_SCHEMA)


def bpe_symbols_of_token_col(token: Column, merges: list[tuple[str, str]]) -> Column:
    """Symbol array of one token after applying ``merges`` in order.
    Tokens containing SEP (unrepresentable) fall back to their character
    list (those characters map to OOV at id time)."""
    s = wrapped_symbols_col(token)
    for lhs, rhs in merges:
        pat, rep = _merge_pattern(lhs, rhs)
        s = F.replace(s, F.lit(pat), F.lit(rep))
    chars = F.filter(F.split(token, ""), lambda c: c != "")
    return F.when(token.contains(SEP), chars).otherwise(symbols_col(s))


def bpe_symbol_count_col(token: Column, merges: list[tuple[str, str]]) -> Column:
    """Symbol count of one token after applying ``merges`` in order."""
    return F.size(bpe_symbols_of_token_col(token, merges))


def bpe_token_counts(
    docs: DataFrame,
    merges: DataFrame | list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Per-document BPE token count under a learned merge table →
    (id_col, *keep_cols, n_bpe_tokens). A pure projection: a higher-order
    fold over the token array applies the replace chain per token and sums
    symbol counts — no explode, no shuffle. ``merges`` may be the
    ``learn_bpe_merges`` output (collected here — it is n_merges rows,
    driver-bounded by construction) or an already-collected list;
    ``keep_cols`` ride along for downstream stream keys (e.g. the
    language column sequence packing partitions on)."""
    merges = _collect_merges(merges)
    toks = tokens_col(F.col(text_col))
    total = F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + bpe_symbol_count_col(t, merges).cast("bigint"),
    )
    return docs.select(
        F.col(id_col), *[F.col(c) for c in (keep_cols or [])], total.alias("n_bpe_tokens")
    )


def _collect_merges(merges: DataFrame | list[tuple[str, str]]) -> list[tuple[str, str]]:
    if isinstance(merges, DataFrame):
        return [(r.lhs, r.rhs) for r in merges.orderBy("merge_rank").collect()]
    return list(merges)


def bpe_vocab_ids(
    docs: DataFrame,
    merges: DataFrame | list[tuple[str, str]],
    text_col: str = "text",
) -> dict[str, int]:
    """The subword vocabulary a merge table induces: alphabet characters
    (distinct chars of the clean training words, binary-sorted) get ids
    1..A, merge products get A + merge_rank, id 0 is OOV. When two merge
    rounds produce the SAME surface string (e.g. (a, bc) then (ab, c)),
    the FIRST id wins — mirrored in the oracle by a MIN(id) group.
    Driver-bounded by construction: |charset| + n_merges entries."""
    merges = _collect_merges(merges)
    toks = tokens_col(F.col(text_col))
    chars = (
        docs.select(F.explode(toks).alias("w"))
        .where((F.col("w") != "") & ~F.col("w").contains(SEP))
        .select(F.explode(F.filter(F.split("w", ""), lambda c: c != "")).alias("c"))
        .distinct()
        .orderBy("c")
        .collect()
    )
    vocab = {r.c: i + 1 for i, r in enumerate(chars)}
    a = len(vocab)
    for rank, (lhs, rhs) in enumerate(merges, start=1):
        vocab.setdefault(lhs + rhs, a + rank)
    return vocab


def bpe_encode_ids(
    docs: DataFrame,
    merges: DataFrame | list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab: dict[str, int] | None = None,
) -> DataFrame:
    """Encode documents to BPE token-id sequences → (id_col, pos,
    token_id): the id streams a training pipeline feeds to
    ``chunk_documents``/``pack_sequences``/``shard_and_order``. pos is the
    0-based symbol position across the whole document; OOV symbols (chars
    unseen in training — only possible inside SEP-bearing tokens) map
    to 0, the same convention as ``encode_docs``.

    Scale shape: the merge chain and the vocabulary are driver-bounded
    (n_merges rows; |charset|+n_merges map entries) and ride into the
    expression as literals — a broadcast in all but name — so encoding is
    a flatten + posexplode PROJECTION: no join, no shuffle, no Python."""
    merges = _collect_merges(merges)
    if vocab is None:
        vocab = bpe_vocab_ids(docs, merges, text_col)
    toks = tokens_col(F.col(text_col))
    all_syms = F.flatten(
        F.transform(toks, lambda t: bpe_symbols_of_token_col(t, merges))
    )
    exploded = docs.select(
        F.col(id_col), F.posexplode(all_syms).alias("pos", "sym")
    )
    id_map = F.create_map(
        *[F.lit(x) for kv in vocab.items() for x in kv]
    )
    return exploded.select(
        id_col,
        F.col("pos").cast("bigint").alias("pos"),
        F.coalesce(F.element_at(id_map, F.col("sym")), F.lit(0))
        .cast("bigint")
        .alias("token_id"),
    )
