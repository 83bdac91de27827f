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
BATCH_MERGE_SCHEMA = (
    "merge_rank bigint, round bigint, lhs string, rhs string, pair_freq bigint"
)


def local_rows_df(spark, rows: list[tuple], schema: str) -> DataFrame:
    """Driver-built bounded model rows → DataFrame via the pandas/Arrow
    path (optimization r14, guide §6 "Arrow for driver transfers"): the
    plain list path pickles the rows into defaultParallelism RDD slices
    and every downstream action pays a row-path deserialize — measured
    ~0.41 s per collect for a 12-row merge table at 32 cores, vs ~0.04 s
    through Arrow (10x). Values and schema are identical (pinned by the
    trainer-equivalence tests); the empty case keeps the plain path (no
    pandas dtype inference to get wrong on zero rows)."""
    if not rows:
        return spark.createDataFrame([], schema)
    import pandas as pd

    return spark.createDataFrame(pd.DataFrame(rows), schema=schema)


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


def _clean_words(docs: DataFrame, text_col: str) -> DataFrame:
    """(w, wf) word-frequency table of the trainable words: non-empty,
    SEP-free. One map-side-combinable aggregate; output is
    vocabulary-bounded (Heaps' law), not corpus-sized."""
    return (
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("w"))
        .where((F.col("w") != "") & ~F.col("w").contains(SEP))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wf"))
    )


def _pair_counts(cur: DataFrame) -> DataFrame:
    """Adjacent-symbol pair frequencies of a (s, wf[, ...]) vocabulary
    state → (lhs, rhs, pf). Output is bounded by distinct symbol pairs."""
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
    return pairs.groupBy("p.lhs", "p.rhs").agg(F.sum("wf").alias("pf"))


_DRIVER_WORDS_CAP = 65536  # max word-table rows the driver fast path holds
_DRIVER_WORK_BUDGET = 1 << 22  # max (rows x n_merges) Python sym-ops budget


def _merge_syms(syms: list[str], lhs: str, rhs: str) -> list[str]:
    """Apply one merge to a symbol list, leftmost-first non-overlapping —
    the exact semantics of the distributed path's disjoint-occurrence
    string ``replace`` (e.g. [a,a,a] + merge(a,a) -> [aa, a])."""
    res: list[str] = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == lhs and syms[i + 1] == rhs:
            res.append(lhs + rhs)
            i += 2
        else:
            res.append(syms[i])
            i += 1
    return res


def _driver_words(base: DataFrame, cap: int) -> list[tuple[list[str], int]] | None:
    """ONE bounded action (the connected-components fast-path pattern):
    ``limit(cap+1)`` decides driver-vs-distributed AND carries the data.
    Returns the (symbols, freq) word list when the table fits, else None
    (the caller falls through to the distributed loop — base is already
    localCheckpoint-materialized, so nothing is recomputed)."""
    pdf = base.limit(cap + 1).toPandas()
    if len(pdf) > cap:
        return None
    return [
        ([x for x in s.split(SEP) if x], int(wf))
        for s, wf in zip(pdf["s"], pdf["wf"])
    ]


def _driver_rounds(
    words: list[tuple[list[str], int]],
    n_merges: int,
    k_per_round: int,
    cand_m: int,
) -> list[tuple[int, int, str, str, int]]:
    """The batched merge rounds run driver-side over a bounded word list —
    bit-exact mirror of the distributed loop: per round, exact integer
    adjacent-pair counts (sum over words weighted by freq), candidates
    ranked (pf DESC, lhs ASC, rhs ASC) — Python's code-point string order
    equals Spark/DuckDB binary UTF-8 order — top ``cand_m`` kept, the
    shared ``_select_noninteracting`` acceptance rule, and the selected
    merges applied leftmost-first to every word. pair_freq is recorded
    from the pre-round counts exactly like the distributed collect."""
    out: list[tuple[int, int, str, str, int]] = []
    rnd = 0
    while len(out) < n_merges:
        rnd += 1
        counts: dict[tuple[str, str], int] = {}
        for syms, wf in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + wf
        if not counts:
            break
        top = sorted(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[:cand_m]
        cands = [(l, r, pf) for (l, r), pf in top]
        sel = _select_noninteracting(cands, min(k_per_round, n_merges - len(out)))
        for lhs, rhs, pf in sel:
            out.append((len(out) + 1, rnd, lhs, rhs, pf))
            words = [(_merge_syms(syms, lhs, rhs), wf) for syms, wf in words]
    return out


def _driver_cap(n_merges: int, driver_cap: int | None) -> int:
    """Row cap for the driver fast path: the static row bound AND a
    work-budget bound (rows x n_merges), so a 32k-merge training on a
    large-but-under-row-cap vocabulary still takes the distributed loop
    (driver rounds cost O(rounds x total symbols) in Python)."""
    if driver_cap is not None:
        return driver_cap
    return min(_DRIVER_WORDS_CAP, _DRIVER_WORK_BUDGET // max(1, n_merges))


def learn_bpe_merges(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    driver_cap: int | None = None,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus → DataFrame
    (merge_rank, lhs, rhs, pair_freq), merge_rank 1..n (stops early if
    the vocabulary runs out of adjacent pairs).

    The (word, freq) base is built distributed (one map-side-combinable
    corpus aggregate) and ``localCheckpoint``-materialized — measured
    faster than ``cache()`` at optimization r15 (lineage truncation makes
    every per-round plan an ExistingRDD scan instead of a deep
    InMemoryRelation match). When the vocabulary fits the bounded driver
    cap, the merge rounds run driver-side with zero further jobs (the
    merge table is driver-state in every real BPE trainer; Sennrich-style
    trainers all count words distributed and merge in memory) — exact
    same algorithm, pinned equal by tests and the SQL oracle. Over-cap
    vocabularies take the distributed loop: each round launches one
    bounded aggregate job whose argmax row is collected (a single row);
    ``localCheckpoint`` every 4 rounds cuts the replace-chain lineage.
    ``driver_cap=0`` forces the distributed loop (tests pin equality)."""
    spark = docs.sparkSession
    base = _clean_words(docs, text_col).select(
        wrapped_symbols_col(F.col("w")).alias("s"), "wf"
    ).localCheckpoint()
    words = _driver_words(base, _driver_cap(n_merges, driver_cap))
    if words is not None:
        rows = _driver_rounds(words, n_merges, k_per_round=1, cand_m=1)
        merges = [(rank, lhs, rhs, pf) for rank, _rnd, lhs, rhs, pf in rows]
        return local_rows_df(spark, merges, MERGE_SCHEMA)
    cur = base
    merges = []
    for rank in range(1, n_merges + 1):
        top = (
            _pair_counts(cur)
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
    return local_rows_df(spark, merges, MERGE_SCHEMA)


def _select_noninteracting(
    cands: list[tuple[str, str, int]], k: int
) -> list[tuple[str, str, int]]:
    """The batched-round acceptance rule, shared verbatim with the SQL
    oracle (queries/bpe_q.py): candidate j (in (pf DESC, lhs, rhs) rank
    order) is *compatible* iff NO higher-ranked candidate — accepted or
    not — interacts with it; the round takes the first ``k`` compatible
    candidates. Checking against all higher-ranked candidates (rather
    than only accepted ones) keeps the rule non-recursive, so one window
    + one anti-self-join expresses it exactly in SQL.

    Interaction is tested on each candidate's {lhs, rhs, lhs+rhs} set —
    the PRODUCT is included because a pair sharing no raw symbol can
    still consume symbols another same-round merge CREATES (e.g.
    ('xy','z') then ('xyz','w'): the first manufactures 'xyz' symbols the
    second's pattern matches, so its recorded pair_freq would be stale
    and the replaces would no longer commute). Product-product collisions
    are rejected too — conservative, but the rule is a selection policy:
    rejecting more candidates costs a round, never correctness."""
    def syms(lhs: str, rhs: str) -> tuple[str, str, str]:
        return (lhs, rhs, lhs + rhs)

    ok_rows: list[tuple[str, str, int]] = []
    for j, (lhs, rhs, pf) in enumerate(cands):
        mine = syms(lhs, rhs)
        if not any(set(syms(hl, hr)) & set(mine) for hl, hr, _ in cands[:j]):
            ok_rows.append((lhs, rhs, pf))
    return ok_rows[:k]


def learn_bpe_merges_batched(
    docs: DataFrame,
    n_merges: int = 16,
    k_per_round: int = 4,
    cand_m: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    driver_cap: int | None = None,
) -> DataFrame:
    """BPE merge learning with TOP-K BATCHED rounds → DataFrame
    (merge_rank, round, lhs, rhs, pair_freq): per round, accept up to
    ``k_per_round`` pairwise NON-INTERACTING pairs (no shared symbol) from
    the ``cand_m`` highest-frequency candidates, and apply them together.
    Non-interacting merges have disjoint pattern matches, so their
    replaces commute and one vocabulary rewrite per ROUND replaces one per
    MERGE — the driver round-trips drop from ``n_merges`` to
    ``~n_merges / k_per_round``, which is what makes a realistic 32k-merge
    vocabulary trainable (the sequential trainer's per-round job floor is
    the binding cost at scale, BASELINE §18).

    The frequency of a pair that shares no symbol with an applied merge
    is invariant under that merge, so every accepted pair's pair_freq is
    exactly what the sequential trainer would have recorded had it picked
    that pair next; with ``k_per_round=1, cand_m=1`` the trainer IS the
    sequential one (pytest pins this on 3 corpus seeds). For k>1 the
    curriculum can diverge from strict-sequential (a merge's PRODUCT can
    out-rank a lower candidate next round) — the standard parallel-BPE
    trade, deterministic here by the (pf DESC, lhs, rhs) rank and the
    all-higher-ranked interaction rule (``_select_noninteracting``)."""
    if cand_m is None:
        cand_m = 2 * k_per_round
    spark = docs.sparkSession
    base = _clean_words(docs, text_col).select(
        wrapped_symbols_col(F.col("w")).alias("s"), "wf"
    ).localCheckpoint()
    # bounded driver fast path (optimization r15, the CC fast-path
    # pattern): the per-round aggregate jobs are pure scheduling overhead
    # once the vocabulary fits in driver memory — one limit-bounded
    # action, then the exact same rounds in Python (see _driver_rounds;
    # equality pinned by tests + the unrolled SQL oracle). Over-cap
    # vocabularies fall through to the distributed loop below with the
    # base already materialized by the checkpoint.
    words = _driver_words(base, _driver_cap(n_merges, driver_cap))
    if words is not None:
        return local_rows_df(
            spark,
            _driver_rounds(words, n_merges, k_per_round, cand_m),
            BATCH_MERGE_SCHEMA,
        )
    cur = base
    out: list[tuple[int, int, str, str, int]] = []
    rnd = 0
    # lineage bound: checkpoint by PENDING-REPLACE count, not round count —
    # at k_per_round=256 a 4-round cadence would stack ~1k nested replace()
    # expressions in one segment (Catalyst analysis/codegen depth cliff,
    # the same wall the encode chain impl hit); 64 keeps every segment's
    # expression tree shallow regardless of k
    ckpt_every = 64
    pending = 0
    while len(out) < n_merges:
        rnd += 1
        cands = [
            (r.lhs, r.rhs, int(r.pf))
            for r in _pair_counts(cur)
            .orderBy(F.col("pf").desc(), F.col("lhs").asc(), F.col("rhs").asc())
            .limit(cand_m)
            .collect()
        ]
        if not cands:
            break
        sel = _select_noninteracting(cands, min(k_per_round, n_merges - len(out)))
        for lhs, rhs, pf in sel:
            out.append((len(out) + 1, rnd, lhs, rhs, pf))
            pat, rep = _merge_pattern(lhs, rhs)
            cur = cur.withColumn("s", F.replace("s", F.lit(pat), F.lit(rep)))
            pending += 1
            if pending >= ckpt_every and len(out) < n_merges:
                cur = cur.localCheckpoint()
                pending = 0
        if pending and rnd % 4 == 0 and len(out) < n_merges:
            cur = cur.localCheckpoint()
            pending = 0
    return local_rows_df(spark, out, BATCH_MERGE_SCHEMA)


def bpe_word_symbols_table(
    docs: DataFrame,
    merges: DataFrame | list[tuple[str, str]],
    text_col: str = "text",
    fold_every: int = 64,
) -> DataFrame:
    """(w, s): every distinct trainable word of ``docs`` → its wrapped
    symbol string after the full merge chain. This is the word-level
    encode cache every production BPE encoder keeps (fastBPE/HF do the
    same driver-side): VOCABULARY-bounded, so a 32k-merge chain runs over
    ~10M rows once instead of per corpus token.

    The chain is applied in ``fold_every``-sized chunks with a
    ``localCheckpoint`` between chunks, bounding the Catalyst expression
    depth at ``fold_every`` replaces regardless of merge count — the fix
    for the O(n_merges)-deep single-expression tree that capped the old
    encode at toy vocabularies (VERDICT r7 item 2)."""
    merges = _collect_merges(merges)
    cur = _clean_words(docs, text_col).select(
        "w", wrapped_symbols_col(F.col("w")).alias("s")
    )
    for start in range(0, len(merges), fold_every):
        for lhs, rhs in merges[start : start + fold_every]:
            pat, rep = _merge_pattern(lhs, rhs)
            cur = cur.withColumn("s", F.replace("s", F.lit(pat), F.lit(rep)))
        if start + fold_every < len(merges):
            cur = cur.localCheckpoint()
    return cur


def bpe_word_ids_table(
    docs: DataFrame,
    merges: DataFrame | list[tuple[str, str]],
    text_col: str = "text",
    vocab: dict[str, int] | None = None,
) -> DataFrame:
    """(w, ids, n_syms): every distinct trainable word of ``docs`` → its
    BPE token-id array under ``merges`` + ``vocab``. Built from
    ``bpe_word_symbols_table`` by one posexplode + broadcast vocab join +
    regroup — all over the vocabulary-bounded word table, never the
    corpus — so neither the merge chain nor the vocabulary ever enters a
    per-corpus-token expression."""
    merges = _collect_merges(merges)
    if vocab is None:
        vocab = bpe_vocab_ids(docs, merges, text_col)
    spark = docs.sparkSession
    vocab_df = local_rows_df(
        spark, [(s, i) for s, i in vocab.items()], "sym string, id bigint"
    )
    wt = bpe_word_symbols_table(docs, merges, text_col)
    exploded = wt.select("w", F.posexplode(symbols_col(F.col("s"))).alias("p", "sym"))
    return (
        exploded.join(F.broadcast(vocab_df), "sym", "left")
        .groupBy("w")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("p", F.coalesce("id", F.lit(0)).alias("id"))
                    )
                ),
                lambda s: s["id"],
            ).alias("ids")
        )
        .withColumn("n_syms", F.size("ids").cast("bigint"))
    )


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
    impl: str = "join",
) -> DataFrame:
    """Per-document BPE token count under a learned merge table →
    (id_col, *keep_cols, n_bpe_tokens). ``merges`` may be the
    ``learn_bpe_merges`` output (collected here — it is n_merges rows,
    driver-bounded by construction) or an already-collected list;
    ``keep_cols`` ride along for downstream stream keys (e.g. the
    language column sequence packing partitions on).

    Two bit-identical impls:

    * ``impl="join"`` (default, the scale path): the merge chain runs
      ONCE over the vocabulary-bounded word table
      (``bpe_word_symbols_table``); the corpus side is explode → broadcast
      word-join → per-doc sum. Cost is flat in merge count — a 32k-merge
      tokenizer costs the same corpus pass as an 8-merge one.
    * ``impl="chain"``: a higher-order fold applies the replace chain per
      corpus token — shuffle-free, but the expression tree is
      O(n_merges) deep and re-evaluated per token; viable only for toy
      merge counts (kept for the zero-shuffle property tests)."""
    merges = _collect_merges(merges)
    keep = list(keep_cols or [])
    if impl == "join" and docs.isStreaming:
        # the word table aggregates the corpus, which a streaming append
        # sink cannot do — route streams through the bit-identical
        # projection twin (streams carry pre-trained merges, whose count
        # is a config choice; the O(n_merges) depth caveat still applies)
        impl = "chain"
    if impl == "chain":
        toks = tokens_col(F.col(text_col))
        total = F.aggregate(
            toks,
            F.lit(0).cast("bigint"),
            lambda acc, t: acc + bpe_symbol_count_col(t, merges).cast("bigint"),
        )
        return docs.select(
            F.col(id_col),
            *[F.col(c) for c in keep],
            # coalesce: a NULL text row folds to NULL here but counts 0 on
            # the join path (explode_outer emits one null-w row) — the
            # bit-identity contract needs both impls to agree on 0
            F.coalesce(total, F.lit(0).cast("bigint")).alias("n_bpe_tokens"),
        )
    if impl != "join":
        raise ValueError(f"impl must be 'join' or 'chain', got {impl!r}")
    wt = bpe_word_symbols_table(docs, merges, text_col).select(
        "w", F.size(symbols_col(F.col("s"))).cast("bigint").alias("_n")
    )
    t = docs.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        F.explode_outer(tokens_col(F.col(text_col))).alias("w"),
    )
    # misses: '' tokens (0 symbols) and SEP-bearing tokens (char fallback,
    # same contract as bpe_symbols_of_token_col); null w = null text row
    char_n = F.size(F.filter(F.split("w", ""), lambda c: c != "")).cast("bigint")
    n = F.when(F.col("w").isNull(), F.lit(0)).otherwise(
        F.coalesce(F.col("_n"), char_n)
    )
    return (
        t.join(F.broadcast(wt), "w", "left")
        .groupBy(id_col, *keep)
        .agg(F.sum(n).cast("bigint").alias("n_bpe_tokens"))
    )


def maxmatch_word_ids_table(
    docs: DataFrame,
    vocab: dict[str, int],
    text_col: str = "text",
) -> DataFrame:
    """Greedy longest-match (MaxMatch / WordPiece-inference-style)
    segmentation of every distinct trainable word against a symbol
    inventory → (w, ids: array<bigint>). At each position the longest
    vocab symbol matching the remaining suffix is taken; a position with
    no match emits OOV id 0 and advances one char (so segmentation always
    terminates and covers the word).

    Fully declarative — no recursion, no Python: the per-(word, position)
    longest match is an explode × candidate-length grid broadcast-joined
    against the vocab and arg-maxed; the sequential position walk is a
    bounded higher-order fold (≤ len(w) steps) over the per-word
    longest-match arrays, with a (pos, ids) struct accumulator. Both
    shapes mirror exactly into SQL (the oracle's list_reduce twin).

    Scale: every table here is vocabulary-bounded (distinct words ×
    ≤ max word length positions), never corpus-sized; the corpus touches
    the result only through a broadcast join on the word."""
    spark = docs.sparkSession
    max_sym_len = max((len(s) for s in vocab), default=1)
    vt = local_rows_df(
        spark, [(s, i, len(s)) for s, i in vocab.items()], "sym string, vid bigint, vl int"
    )
    words = _clean_words(docs, text_col).select("w")
    # candidate grid: every (word, pos, length<=max_sym_len) substring
    grid = words.select(
        "w", F.explode(F.sequence(F.lit(0), F.length("w") - 1)).alias("pos")
    )
    cand = (
        grid.select(
            "w",
            "pos",
            F.explode(F.sequence(F.lit(1), F.lit(max_sym_len))).alias("l"),
        )
        .withColumn("sub", F.col("w").substr(F.col("pos") + 1, F.col("l")))
        .where(F.length("sub") == F.col("l"))
        .join(F.broadcast(vt), (F.col("sub") == F.col("sym")) & (F.col("vl") == F.col("l")))
        .select("w", "pos", F.col("l").alias("ml"), "vid")
    )
    lm = cand.groupBy("w", "pos").agg(F.max(F.struct("ml", "vid")).alias("m"))
    # full per-position arrays with the OOV default (len 1, id 0)
    arrays = (
        grid.join(lm, ["w", "pos"], "left")
        .groupBy("w")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "pos",
                        F.coalesce(F.col("m.ml"), F.lit(1)).cast("int").alias("ml"),
                        F.coalesce(F.col("m.vid"), F.lit(0)).cast("bigint").alias("vid"),
                    )
                )
            ).alias("ps")
        )
        .select(
            "w",
            F.transform("ps", lambda s: s["ml"]).alias("lens"),
            F.transform("ps", lambda s: s["vid"]).alias("vids"),
        )
    )
    # sequential walk as a bounded fold: state (pos, ids); step i is a
    # no-op once pos has passed the end
    init = F.struct(
        F.lit(0).cast("int").alias("pos"),
        F.array().cast("array<bigint>").alias("ids"),
    )
    step = lambda acc, _i: F.when(  # noqa: E731
        acc["pos"] < F.size("lens"),
        F.struct(
            (acc["pos"] + F.element_at("lens", acc["pos"] + 1)).cast("int").alias("pos"),
            F.concat(
                acc["ids"], F.array(F.element_at("vids", acc["pos"] + 1))
            ).alias("ids"),
        ),
    ).otherwise(acc)
    walked = F.aggregate(
        F.sequence(F.lit(1), F.size("lens")), init, step, lambda acc: acc["ids"]
    )
    return arrays.select("w", walked.alias("ids"))


def maxmatch_encode_ids(
    docs: DataFrame,
    vocab: dict[str, int],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode documents with greedy longest-match against ``vocab`` →
    (id_col, pos, token_id). Same corpus shape as ``bpe_encode_ids``
    impl='join': posexplode tokens → broadcast word-table join → one
    doc-key window for global positions → posexplode. Tokens the word
    table misses ('' and SEP-bearing) fall back to per-char ids, OOV 0 —
    the same contract as the BPE encoder (shared ``_encode_with_word_table``
    stitch)."""
    wt = maxmatch_word_ids_table(docs, vocab, text_col)
    return _encode_with_word_table(docs, wt, vocab, text_col, id_col)


def bpe_decode_ids(
    encoded: DataFrame,
    vocab: dict[str, int],
    id_col: str = "doc_id",
) -> DataFrame:
    """Inverse of ``bpe_encode_ids``: (id_col, pos, token_id) → (id_col,
    pos, sym) via the reverse vocabulary map as a broadcast join (the
    vocabulary is driver-bounded by construction — |charset| + n_merges
    rows). Ids are unique per symbol (``bpe_vocab_ids`` first-win
    semantics), so the inversion is a function; id 0 (OOV) decodes to
    NULL — the caller decides the replacement glyph.

    Scale shape: one broadcast join, no shuffle — the id stream keeps its
    partitioning, which is what lets decode run inline in a
    detokenization/inspection pass over sharded training data."""
    spark = encoded.sparkSession
    vt = local_rows_df(
        spark, [(i, s) for s, i in vocab.items()], "token_id bigint, sym string"
    )
    return encoded.join(F.broadcast(vt), "token_id", "left").select(
        F.col(id_col), F.col("pos"), F.col("sym")
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
    impl: str = "join",
) -> DataFrame:
    """Encode documents to BPE token-id sequences → (id_col, pos,
    token_id): the id streams a training pipeline feeds to
    ``chunk_documents``/``pack_sequences``/``shard_and_order``. pos is the
    0-based symbol position across the whole document; OOV symbols (chars
    unseen in training — only possible inside SEP-bearing tokens) map
    to 0, the same convention as ``encode_docs``.

    Two bit-identical impls (pytest pins equality):

    * ``impl="join"`` (default, the VOCABULARY-SCALABLE path): the merge
      chain runs once over the word table (``bpe_word_ids_table``, word →
      id array, vocabulary-bounded); the corpus side is posexplode →
      broadcast word-join → one window on the doc key for global symbol
      positions → posexplode of the id arrays. Zero Python, flat in merge
      count (BASELINE §18 measures a 1,000-merge encode at chain-8 cost).
    * ``impl="chain"``: merge chain + vocab map ride into one projection
      as literals — zero-shuffle, but O(n_merges) expression depth per
      token caps it at toy vocabularies (VERDICT r7 item 2)."""
    merges = _collect_merges(merges)
    if impl == "join" and docs.isStreaming:
        impl = "chain"  # same streaming fallback as bpe_token_counts
    if vocab is None:
        if docs.isStreaming:
            raise ValueError(
                "bpe_encode_ids on a stream needs an explicit vocab= "
                "(deriving it scans the corpus, which a stream cannot)"
            )
        vocab = bpe_vocab_ids(docs, merges, text_col)
    if impl == "chain":
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
    if impl != "join":
        raise ValueError(f"impl must be 'join' or 'chain', got {impl!r}")
    from pyspark.sql import Window

    wt = bpe_word_ids_table(docs, merges, text_col, vocab).select("w", "ids")
    return _encode_with_word_table(docs, wt, vocab, text_col, id_col)


def _encode_with_word_table(
    docs: DataFrame,
    wt: DataFrame,
    vocab: dict[str, int],
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Shared corpus stitch for every word-table encoder (BPE join path,
    MaxMatch): posexplode tokens → broadcast (w → ids) join → one doc-key
    window for global symbol positions → posexplode of the id arrays.
    Join misses ('' and SEP-bearing tokens) fall back to per-char ids —
    single-char vocab entries are exactly the alphabet, so this matches
    the chain impl's char path bit-for-bit."""
    char_map = {s: i for s, i in vocab.items() if len(s) == 1}
    if char_map:
        cmap = F.create_map(*[F.lit(x) for kv in char_map.items() for x in kv])
        char_ids = F.transform(
            F.filter(F.split("w", ""), lambda c: c != ""),
            lambda c: F.coalesce(F.element_at(cmap, c), F.lit(0)).cast("bigint"),
        )
    else:  # degenerate corpus: no trainable words at all
        char_ids = F.transform(
            F.filter(F.split("w", ""), lambda c: c != ""),
            lambda c: F.lit(0).cast("bigint"),
        )
    return _stitch_word_ids(docs, wt, char_ids, text_col, id_col)


def _stitch_word_ids(
    docs: DataFrame,
    wt: DataFrame,
    char_ids: Column,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """The corpus half of a word-table encode: token posexplode →
    broadcast (w → ids) join (misses take the caller's ``char_ids``
    fallback array built from column ``w``) → one doc-key window for
    global symbol offsets → posexplode to (id, pos, token_id)."""
    from pyspark.sql import Window

    t = docs.select(
        F.col(id_col), F.posexplode(tokens_col(F.col(text_col))).alias("wpos", "w")
    )
    step = t.join(F.broadcast(wt), "w", "left").select(
        id_col, "wpos", F.coalesce(F.col("ids"), char_ids).alias("_ids")
    )
    win = (
        Window.partitionBy(id_col)
        .orderBy("wpos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    step = step.withColumn(
        "_off", F.coalesce(F.sum(F.size("_ids")).over(win), F.lit(0))
    )
    return step.select(
        id_col, F.col("_off"), F.posexplode("_ids").alias("i", "tid")
    ).select(
        id_col,
        (F.col("_off") + F.col("i")).cast("bigint").alias("pos"),
        F.col("tid").cast("bigint").alias("token_id"),
    )


def utf8_byte_ids_col(s: Column) -> Column:
    """UTF-8 byte ids of a string column: byte value + 1, so the ids
    occupy 1..256 (id 0 stays unused — nothing is OOV under byte
    fallback). Hex-pair decomposition, pure column math, no UDF; ''
    yields an empty array (the descending-sequence guard)."""
    h = F.hex(F.encode(s, "UTF-8"))
    n = (F.length(h) / 2).cast("int")
    idx = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: (
            F.conv(F.substring(h, i * 2 - 1, F.lit(2)), 16, 10).cast("bigint") + 1
        ),
    )


def bpe_vocab_ids_bytes(
    docs: DataFrame,
    merges: DataFrame | list[tuple[str, str]],
    text_col: str = "text",
) -> dict[str, int]:
    """Byte-fallback vocabulary: ids 1..256 are reserved for the raw
    UTF-8 bytes (byte b → id b+1), alphabet chars and merge products
    shift up by 256 — the convention real tokenizers ship (GPT-2/BPE
    vocabularies carry 256 byte tokens) so EVERY input encodes
    losslessly: a character outside the training alphabet becomes its
    byte ids instead of a lossy OOV 0."""
    return {s: i + 256 for s, i in bpe_vocab_ids(docs, merges, text_col).items()}


def bpe_encode_ids_bytes(
    docs: DataFrame,
    merges: DataFrame | list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab: dict[str, int] | None = None,
) -> DataFrame:
    """Byte-fallback BPE encode → (id_col, pos, token_id): the join-impl
    word-table encode (vocabulary-bounded merge replay, broadcast word
    join, one doc-key window — same scale shape as ``bpe_encode_ids``)
    except that a symbol missing from ``vocab`` expands into its UTF-8
    byte ids (1..256) instead of collapsing to OOV 0, so the id stream
    is lossless for ANY input text. ``vocab`` should come from
    ``bpe_vocab_ids_bytes`` on the TRAINING corpus; serving data may
    contain arbitrary unseen characters."""
    merges = _collect_merges(merges)
    if vocab is None:
        vocab = bpe_vocab_ids_bytes(docs, merges, text_col)
    spark = docs.sparkSession
    vocab_df = local_rows_df(
        spark, [(s, i) for s, i in vocab.items()], "sym string, id bigint"
    )
    wt0 = bpe_word_symbols_table(docs, merges, text_col)
    exploded = wt0.select("w", F.posexplode(symbols_col(F.col("s"))).alias("p", "sym"))
    per_sym = F.when(F.col("id").isNotNull(), F.array(F.col("id"))).otherwise(
        utf8_byte_ids_col(F.col("sym"))
    )
    wt = (
        exploded.join(F.broadcast(vocab_df), "sym", "left")
        .select("w", "p", per_sym.alias("sids"))
        .groupBy("w")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "sids"))),
                    lambda s: s["sids"],
                )
            ).alias("ids")
        )
    )
    char_map = {s: i for s, i in vocab.items() if len(s) == 1}
    cmap = (
        F.create_map(*[F.lit(x) for kv in char_map.items() for x in kv])
        if char_map
        else F.create_map().cast("map<string,bigint>")
    )
    char_ids = F.flatten(
        F.transform(
            F.filter(F.split("w", ""), lambda c: c != ""),
            lambda c: F.coalesce(
                F.when(
                    F.element_at(cmap, c).isNotNull(),
                    F.array(F.element_at(cmap, c)),
                ),
                utf8_byte_ids_col(c),
            ),
        )
    )
    return _stitch_word_ids(docs, wt, char_ids, text_col, id_col)


def save_tokenizer(
    merges: DataFrame | list[tuple[str, str]],
    vocab: dict[str, int],
    path: str,
    spark=None,
) -> None:
    """Persist a trained tokenizer as a two-table parquet artifact:
    ``<path>/merges.parquet`` (merge_rank, lhs, rhs) and
    ``<path>/vocab.parquet`` (sym, id) — the durable form of the
    train/serve split (SCALE.md §8): train once on the cluster, ship the
    artifact, and every serving job (batch or readStream) loads it
    without touching the training corpus. Both tables are
    vocabulary-bounded; the write is a driver-side single file each."""
    if isinstance(merges, DataFrame):
        spark = spark or merges.sparkSession
        mrows = [(int(r.merge_rank), r.lhs, r.rhs) for r in merges.orderBy("merge_rank").collect()]
    else:
        if spark is None:
            raise ValueError("save_tokenizer needs spark= when merges is a list")
        mrows = [(i + 1, lhs, rhs) for i, (lhs, rhs) in enumerate(merges)]
    spark.createDataFrame(
        mrows, "merge_rank bigint, lhs string, rhs string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/merges.parquet")
    spark.createDataFrame(
        [(s, int(i)) for s, i in vocab.items()], "sym string, id bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/vocab.parquet")


def load_tokenizer(spark, path: str) -> tuple[list[tuple[str, str]], dict[str, int]]:
    """Load a ``save_tokenizer`` artifact → (merges list in rank order,
    vocab dict). Bounded driver collects (the artifact IS bounded); the
    returned values plug straight into ``bpe_encode_ids(…, vocab=…)`` /
    ``bpe_encode_ids_bytes`` / ``maxmatch_encode_ids`` — including on a
    streaming DataFrame, where deriving either from the stream is
    impossible by construction."""
    mrows = spark.read.parquet(f"{path}/merges.parquet").orderBy("merge_rank").collect()
    vrows = spark.read.parquet(f"{path}/vocab.parquet").collect()
    return [(r.lhs, r.rhs) for r in mrows], {r.sym: int(r.id) for r in vrows}
