"""BPE tokenizer-training queries with exact DuckDB oracles.

Like ``embedding_kmeans_cells``, these hash-check an ITERATIVE algorithm
exactly: the oracle unrolls every merge round into CTEs (pair counts →
deterministic argmax → separator-wrapped ``replace`` rewrite) so DuckDB
re-derives the same merge table — and, for the encode query, the same
per-document token counts — from first principles. Both engines rely on
identical left-to-right non-overlapping ``replace`` semantics over the
disjoint symbol-wrap representation (see functions/bpe.py's module doc
for why each symbol gets its own separator pair).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from duckpipe_spark.functions.bpe import (
    MERGE_SCHEMA,
    bpe_token_counts,
    learn_bpe_merges,
    local_rows_df,
)
from duckpipe_spark.queries.base import register
from duckpipe_spark.sources.tables import load_table

N_MERGES = 8

_S = "chr(31)"

# --- session-scoped trained-merge-table artifact (VERDICT r8 item 2) ---------
# Every tokenizer-CONSUMING query (encode, pack, vocab export, round-trip,
# fertility report, MaxMatch) used to retrain the merges inline, paying the
# sequential trainer's one-job-per-merge driver floor per query run — a
# report query measuring 8 training jobs instead of the report. Real
# pipelines train once and ship the merge table as an artifact; this memo is
# that artifact with session scope: first consumer trains (n_merges bounded
# rows collected once — the same bounded-collect contract as the trainer
# itself), everyone after reuses the literalized rows. Keyed by (session,
# corpus path, corpus mtime, n_merges) so a regenerated parquet invalidates
# it (the same mtime-keying as sources/tables.py's scan memo). The training
# COST stays attributed to the trainer rows (doc_bpe_merges/_batched), which
# always retrain — and refresh the memo as a side effect.
_MERGES_MEMO: dict[tuple, list[tuple]] = {}


def _memo_key(spark: SparkSession, sf_dir: str, n_merges: int) -> tuple:
    path = os.path.join(sf_dir, "documents.parquet")
    try:
        mt = os.stat(path).st_mtime_ns
    except OSError:
        mt = -1
    return (id(spark), os.path.abspath(sf_dir), n_merges, mt)


def trained_merges(
    spark: SparkSession, sf_dir: str, n_merges: int = N_MERGES
) -> DataFrame:
    """The merge-table artifact for ``sf_dir``'s documents corpus: train on
    first use, reuse the literalized rows afterwards (deterministic trainer
    -> identical table either way; pytest pins memo ≡ fresh)."""
    key = _memo_key(spark, sf_dir, n_merges)
    if key not in _MERGES_MEMO:
        rows = learn_bpe_merges(
            load_table(spark, sf_dir, "documents"), n_merges=n_merges
        ).collect()
        _MERGES_MEMO[key] = [tuple(r) for r in rows]
    return local_rows_df(spark, _MERGES_MEMO[key], MERGE_SCHEMA)


def _bpe_ctes(n_merges: int) -> str:
    """Shared CTE chain: word freqs → v0 … v{n} vocab states and
    top1 … top{n} argmax pairs."""
    parts = [
        f"""w AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS wf
  FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents)
  WHERE w <> '' AND NOT contains(w, {_S})
  GROUP BY w
)""",
        f"""v0 AS MATERIALIZED (
  SELECT {_S} || array_to_string(string_split(w, ''), {_S}||{_S}) || {_S} AS s, wf FROM w
)""",
    ]
    for r in range(1, n_merges + 1):
        parts.append(f"""p{r} AS (
  SELECT p['l'] AS lhs, p['r'] AS rhs, CAST(sum(wf) AS BIGINT) AS pf
  FROM (
    SELECT unnest(list_transform(range(1, len(syms)), i -> {{'l': syms[i], 'r': syms[i+1]}})) AS p, wf
    FROM (SELECT list_filter(string_split(s, {_S}), x -> x <> '') AS syms, wf FROM v{r-1})
  )
  GROUP BY 1, 2
)""")
        # aggregate-wrapped so top{r} is EXACTLY one row even when a round
        # has no pairs (degenerate corpus): the encode oracles cross-join
        # these CTEs, and an empty round would otherwise collapse the whole
        # result to zero rows while the Spark side just stops merging. The
        # sentinel ('', '') makes the replace pattern four consecutive
        # separators, which never occurs (symbols are non-empty, so runs of
        # SEP have length exactly 2) — a no-op, matching the early break.
        parts.append(f"""top{r} AS MATERIALIZED (
  SELECT coalesce(max(lhs), '') AS lhs, coalesce(max(rhs), '') AS rhs,
         coalesce(max(pf), 0) AS pf
  FROM (SELECT lhs, rhs, pf FROM p{r} ORDER BY pf DESC, lhs ASC, rhs ASC LIMIT 1)
)""")
        parts.append(f"""v{r} AS MATERIALIZED (
  SELECT replace(s, {_S}||lhs||{_S}||{_S}||rhs||{_S}, {_S}||lhs||rhs||{_S}) AS s, wf
  FROM v{r-1}, top{r}
)""")
    return ",\n".join(parts)


def _merges_oracle(n_merges: int) -> str:
    rows = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS merge_rank, lhs, rhs, CAST(pf AS BIGINT)"
        f" AS pair_freq FROM top{r} WHERE lhs <> ''"
        for r in range(1, n_merges + 1)
    )
    return f"WITH {_bpe_ctes(n_merges)}\n{rows}"


def _encode_oracle(n_merges: int) -> str:
    # the N argmax pairs ride in as cross-joined one-row columns (DuckDB
    # rejects subqueries inside lambdas); the replace chain applies them
    # in merge order to each token's wrapped representation
    tops = ", ".join(
        f"(SELECT lhs AS l{r}, rhs AS r{r} FROM top{r})" for r in range(1, n_merges + 1)
    )
    chain = f"{_S} || array_to_string(string_split(tk, ''), {_S}||{_S}) || {_S}"
    for r in range(1, n_merges + 1):
        chain = (
            f"replace({chain}, {_S}||l{r}||{_S}||{_S}||r{r}||{_S}, {_S}||l{r}||r{r}||{_S})"
        )
    return f"""WITH {_bpe_ctes(n_merges)}
SELECT doc_id,
  CAST(coalesce(list_sum(list_transform(t, tk ->
    CASE WHEN contains(tk, {_S}) THEN length(tk)
         ELSE len(list_filter(string_split({chain}, {_S}), x -> x <> '')) END
  )), 0) AS BIGINT) AS n_bpe_tokens
FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents), {tops}
"""


@register(
    "doc_bpe_merges",
    _merges_oracle(N_MERGES),
    "distributed BPE merge learning (word-frequency formulation, exact argmax rounds)",
    # NOT bench-tracked since r9 (VERDICT r8 item 3): the sequential trainer
    # is the parity/pinning path — its per-merge driver-round floor is by
    # construction (BASELINE §18), and doc_bpe_merges_batched is the
    # flagship BPE-training bench row (the path a real vocabulary uses).
)
def doc_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = learn_bpe_merges(load_table(spark, sf_dir, "documents"), n_merges=N_MERGES)
    # the trainer row always retrains (that IS what it measures); refresh the
    # session artifact so consumer queries get the fresh table for free
    _MERGES_MEMO[_memo_key(spark, sf_dir, N_MERGES)] = [tuple(r) for r in out.collect()]
    return local_rows_df(spark, _MERGES_MEMO[_memo_key(spark, sf_dir, N_MERGES)], MERGE_SCHEMA)


@register(
    "doc_bpe_token_counts",
    _encode_oracle(N_MERGES),
    "per-doc token counts under the learned BPE merges (pure-projection encode)",
)
def doc_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    merges = trained_merges(spark, sf_dir)
    return bpe_token_counts(docs, merges)


from duckpipe_spark.functions.bpe import bpe_encode_ids  # noqa: E402


def _vocab_enc_ctes(n_merges: int) -> str:
    """Merge rounds + vocabulary + per-position symbol stream as a shared
    CTE body (used by the encode oracle and the decode round-trip oracle).

    Vocabulary: alphabet chars (binary-sorted) get 1..A, merge products
    A + rank; MIN(id) resolves two rounds producing the same surface
    string (first id wins — mirrors bpe_vocab_ids's setdefault)."""
    # lhs <> '' drops the pairless-round sentinel rows (same filter as
    # _merges_oracle): without it a degenerate corpus with < n_merges
    # learnable merges injects a '' symbol the Spark vocab never has —
    # and the maxmatch oracle's substring join would treat that '' as a
    # length-0 always-matching candidate
    vocab_rows = "\nUNION ALL\n".join(
        f"SELECT lhs || rhs AS sym, (SELECT a FROM asize) + {r} AS id FROM top{r}"
        f" WHERE lhs <> ''"
        for r in range(1, n_merges + 1)
    )
    tops = ", ".join(
        f"(SELECT lhs AS l{r}, rhs AS r{r} FROM top{r})" for r in range(1, n_merges + 1)
    )
    chain = f"{_S} || array_to_string(string_split(tk, ''), {_S}||{_S}) || {_S}"
    for r in range(1, n_merges + 1):
        chain = (
            f"replace({chain}, {_S}||l{r}||{_S}||{_S}||r{r}||{_S}, {_S}||l{r}||r{r}||{_S})"
        )
    return f"""{_bpe_ctes(n_merges)},
alpha AS (
  SELECT c, CAST(row_number() OVER (ORDER BY c) AS BIGINT) AS id
  FROM (SELECT DISTINCT unnest(string_split(w, '')) AS c FROM w)
),
asize AS (SELECT count(*) AS a FROM alpha),
vocab AS (
  SELECT sym, MIN(id) AS id FROM (
    SELECT c AS sym, id FROM alpha
    UNION ALL
{vocab_rows}
  ) GROUP BY sym
),
enc AS (
  SELECT doc_id,
    flatten(list_transform(t, tk -> CASE WHEN contains(tk, {_S})
        THEN string_split(tk, '')
        ELSE list_filter(string_split({chain}, {_S}), x -> x <> '') END)) AS syms
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents), {tops}
),
e AS (
  SELECT doc_id, CAST(unnest(range(len(syms))) AS BIGINT) AS pos, unnest(syms) AS sym
  FROM enc
)"""


def _encode_ids_oracle(n_merges: int) -> str:
    return f"""WITH {_vocab_enc_ctes(n_merges)}
SELECT e.doc_id, e.pos, CAST(coalesce(v.id, 0) AS BIGINT) AS token_id
FROM e
LEFT JOIN vocab v ON e.sym = v.sym
"""


@register(
    "doc_bpe_encoded",
    _encode_ids_oracle(N_MERGES),
    "BPE id-sequence encoding (train -> vocab ids -> per-position tokens, shuffle-free)",
)
def doc_bpe_encoded(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    merges = trained_merges(spark, sf_dir)
    return bpe_encode_ids(docs, merges)


# --- encode through a DISK tokenizer artifact (VERDICT r9 item 6) -----------

_ARTIFACT_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".artifacts",
)


def _tokenizer_artifact(spark: SparkSession, sf_dir: str, n_merges: int = N_MERGES) -> str:
    """Write-once tokenizer artifact ON DISK for ``sf_dir``'s corpus —
    the cross-session serving contract the session memo can't prove.
    Path is keyed by (corpus basename, n_merges, corpus mtime), so a
    regenerated parquet trains a FRESH artifact instead of serving a
    stale one; the existence check is on vocab.parquet's _SUCCESS marker
    (written last by ``save_tokenizer``, so a half-written artifact
    retrains)."""
    from duckpipe_spark.functions.bpe import bpe_vocab_ids, save_tokenizer

    mtime = _memo_key(spark, sf_dir, n_merges)[-1]
    tag = f"{os.path.basename(os.path.abspath(sf_dir))}_m{n_merges}_{mtime}"
    path = os.path.join(_ARTIFACT_ROOT, f"bpe_tokenizer_{tag}")
    if not os.path.exists(os.path.join(path, "vocab.parquet", "_SUCCESS")):
        docs = load_table(spark, sf_dir, "documents")
        merges = trained_merges(spark, sf_dir, n_merges)
        save_tokenizer(merges, bpe_vocab_ids(docs, merges), path, spark=spark)
    return path


@register(
    "doc_bpe_artifact_encode",
    _encode_ids_oracle(N_MERGES),
    "encode through a tokenizer LOADED from a parquet disk artifact (serve contract)",
)
def doc_bpe_artifact_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VERDICT r9 item 6 — the serving story's last mile as a registered
    query: the tokenizer is trained + saved to a parquet artifact ONCE
    (write-once keyed by corpus mtime), then ``load_tokenizer`` reads the
    merge table and vocab back from DISK and the encode runs entirely off
    the loaded artifact — no session memo, no training lineage in the
    plan. Token ids must be bit-identical to ``doc_bpe_encoded`` (same
    oracle), which pins the save→load round trip as value-preserving on
    the full corpus, not just the pytest fixture."""
    from duckpipe_spark.functions.bpe import bpe_encode_ids, load_tokenizer

    path = _tokenizer_artifact(spark, sf_dir)
    merges, vocab = load_tokenizer(spark, path)
    docs = load_table(spark, sf_dir, "documents")
    return bpe_encode_ids(docs, merges, vocab=vocab)


# --- vocabulary export: the artifact a tokenizer ships ----------------------


def _vocab_oracle(n_merges: int) -> str:
    return f"""WITH {_vocab_enc_ctes(n_merges)}
SELECT sym, CAST(id AS BIGINT) AS token_id FROM vocab
"""


@register(
    "doc_bpe_vocab",
    _vocab_oracle(N_MERGES),
    "trained-tokenizer vocabulary export (symbol -> id, alphabet + merge products)",
)
def doc_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (symbol, id) table a trained tokenizer ships to the serving
    side: alphabet chars (binary-sorted) get 1..A, merge products
    A + rank, first id wins on surface collisions. Spark derives it
    through the distributed trainer + ``bpe_vocab_ids`` (alphabet scan is
    distributed, assembly is the driver-bounded |charset| + n_merges
    dict); the oracle re-derives it from the unrolled merge CTEs."""
    from duckpipe_spark.functions.bpe import bpe_vocab_ids

    docs = load_table(spark, sf_dir, "documents")
    merges = trained_merges(spark, sf_dir)
    vocab = bpe_vocab_ids(docs, merges)
    return local_rows_df(
        spark, [(s, i) for s, i in vocab.items()], "sym string, token_id bigint"
    )


# --- decode round-trip: ids -> symbols -> concatenation == original --------


def _roundtrip_oracle(n_merges: int) -> str:
    # the round trip goes THROUGH ids on both engines: syms -> id (forward
    # vocab join, OOV -> 0) -> sym (REVERSE join on id — exercises the
    # inversion, not a shortcut re-use of the symbol stream); word
    # boundaries are not carried by the id stream, so the recoverable
    # invariant is the whitespace-stripped text
    return f"""WITH {_vocab_enc_ctes(n_merges)},
ids AS (
  SELECT e.doc_id, e.pos, CAST(coalesce(v.id, 0) AS BIGINT) AS token_id
  FROM e LEFT JOIN vocab v ON e.sym = v.sym
),
dec AS (
  SELECT ids.doc_id, ids.pos, rv.sym
  FROM ids LEFT JOIN vocab rv ON ids.token_id = rv.id
),
perdoc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_syms,
         string_agg(sym, '' ORDER BY pos) AS decoded
  FROM dec GROUP BY doc_id
)
SELECT p.doc_id, p.n_syms,
       p.decoded = regexp_replace(trim(d.text), '\\s+', '', 'g') AS roundtrip_ok
FROM perdoc p JOIN documents d ON p.doc_id = d.doc_id
"""


@register(
    "doc_bpe_roundtrip",
    _roundtrip_oracle(N_MERGES),
    "BPE decode inversion: encode -> id stream -> decode == whitespace-stripped text",
)
def doc_bpe_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-checking tokenizer contract: every document's id sequence,
    decoded through the REVERSE vocabulary map, must re-concatenate
    (ordered fold by position) to the whitespace-stripped original text —
    the strongest invariant the id stream can carry (word boundaries are
    not encoded; a production tokenizer adds an end-of-word marker, which
    would make the invariant the full text). Both engines run the full
    encode -> decode chain, so a silent id collision or vocab drift on
    EITHER side breaks the hash."""
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.bpe import bpe_decode_ids, bpe_encode_ids, bpe_vocab_ids

    docs = load_table(spark, sf_dir, "documents")
    merges = trained_merges(spark, sf_dir)
    vocab = bpe_vocab_ids(docs, merges)
    dec = bpe_decode_ids(bpe_encode_ids(docs, merges, vocab=vocab), vocab)
    decoded = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "sym"))), lambda s: s["sym"]
        ),
        "",
    )
    perdoc = dec.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_syms"), decoded.alias("decoded")
    )
    stripped = F.regexp_replace(F.trim(F.col("text")), r"\s+", "")
    return perdoc.join(docs.select("doc_id", stripped.alias("_t")), "doc_id").select(
        "doc_id", "n_syms", (F.col("decoded") == F.col("_t")).alias("roundtrip_ok")
    )


from duckpipe_spark.functions.sampling import pack_sequences  # noqa: E402

_PACK_BUDGET = 512


def _bpe_pack_oracle(n_merges: int) -> str:
    tops = ", ".join(
        f"(SELECT lhs AS l{r}, rhs AS r{r} FROM top{r})" for r in range(1, n_merges + 1)
    )
    chain = f"{_S} || array_to_string(string_split(tk, ''), {_S}||{_S}) || {_S}"
    for r in range(1, n_merges + 1):
        chain = (
            f"replace({chain}, {_S}||l{r}||{_S}||{_S}||r{r}||{_S}, {_S}||l{r}||r{r}||{_S})"
        )
    return f"""WITH {_bpe_ctes(n_merges)},
counted AS (
  SELECT doc_id, lang,
    CAST(coalesce(list_sum(list_transform(t, tk ->
      CASE WHEN contains(tk, {_S}) THEN length(tk)
           ELSE len(list_filter(string_split({chain}, {_S}), x -> x <> '')) END
    )), 0) AS BIGINT) AS n_bpe_tokens
  FROM (SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS t FROM documents), {tops}
)
SELECT doc_id, lang, n_bpe_tokens,
  CAST(floor(
    coalesce(sum(n_bpe_tokens) OVER (
      PARTITION BY lang ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
    / {_PACK_BUDGET}) AS BIGINT) AS pack_id
FROM counted
"""


@register(
    "doc_bpe_pack",
    _bpe_pack_oracle(N_MERGES),
    "tokenizer-aware sequence packing: BPE counts feed per-language concat-and-chunk",
)
def doc_bpe_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integration shape: learned-tokenizer token counts drive the packing
    a pre-training run actually performs — merges trained on the corpus,
    counts as a shuffle-free fold, one window shuffle on the language
    stream key (the same scale story as doc_pack_sequences)."""
    docs = load_table(spark, sf_dir, "documents")
    merges = trained_merges(spark, sf_dir)
    counted = bpe_token_counts(docs, merges, keep_cols=["lang"])
    return pack_sequences(counted, "n_bpe_tokens", _PACK_BUDGET, "lang").select(
        "doc_id", "lang", "n_bpe_tokens", "pack_id"
    )


# --- batched merge rounds: top-K non-interacting pairs per round ------------

from duckpipe_spark.functions.bpe import learn_bpe_merges_batched  # noqa: E402

_BATCH_N = 12
_BATCH_K = 3
_BATCH_M = 6


def _batched_oracle(n_merges: int, k: int, m: int) -> str:
    """Unrolled oracle for the BATCHED trainer: per round, rank the pair
    frequencies, keep the top ``m`` candidates, accept the first ``k``
    whose symbols don't intersect ANY higher-ranked candidate (the
    non-recursive rule `_select_noninteracting` mirrors verbatim), and
    apply the accepted merges together (non-interacting ⇒ the replaces
    commute). ``n_merges`` rounds are unrolled — every round accepts ≥1
    merge while pairs exist, so that always covers the cap; extra rows
    fall to the final merge_rank filter exactly like the Spark side's
    early stop. Variable-size accept sets ride through fixed K one-row
    slot CTEs (aggregate-guarded), a non-accepted slot contributing a
    chr(30) never-matching pattern — chr(30) is not whitespace and no
    corpus word contains control chars, so the replace is a no-op."""
    parts = [
        f"""w AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS wf
  FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents)
  WHERE w <> '' AND NOT contains(w, {_S})
  GROUP BY w
)""",
        f"""v0 AS MATERIALIZED (
  SELECT {_S} || array_to_string(string_split(w, ''), {_S}||{_S}) || {_S} AS s, wf FROM w
)""",
    ]
    for r in range(1, n_merges + 1):
        parts.append(f"""p{r} AS (
  SELECT p['l'] AS lhs, p['r'] AS rhs, CAST(sum(wf) AS BIGINT) AS pf
  FROM (
    SELECT unnest(list_transform(range(1, len(syms)), i -> {{'l': syms[i], 'r': syms[i+1]}})) AS p, wf
    FROM (SELECT list_filter(string_split(s, {_S}), x -> x <> '') AS syms, wf FROM v{r-1})
  )
  GROUP BY 1, 2
)""")
        parts.append(f"""ranked{r} AS MATERIALIZED (
  SELECT lhs, rhs, pf, rk FROM (
    SELECT lhs, rhs, pf,
           row_number() OVER (ORDER BY pf DESC, lhs ASC, rhs ASC) AS rk
    FROM p{r}
  ) WHERE rk <= {m}
)""")
        parts.append(f"""acc{r} AS (
  SELECT c.lhs, c.rhs, c.pf, c.rk,
    NOT EXISTS (SELECT 1 FROM ranked{r} h
      WHERE h.rk < c.rk
        AND (h.lhs IN (c.lhs, c.rhs, c.lhs || c.rhs)
          OR h.rhs IN (c.lhs, c.rhs, c.lhs || c.rhs)
          OR h.lhs || h.rhs IN (c.lhs, c.rhs, c.lhs || c.rhs))) AS ok
  FROM ranked{r} c
)""")
        parts.append(f"""sel{r} AS MATERIALIZED (
  SELECT lhs, rhs, pf, rk FROM (
    SELECT lhs, rhs, pf, rk, ok,
      count(*) FILTER (ok) OVER (
        ORDER BY rk ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS nacc
    FROM acc{r}
  ) WHERE ok AND nacc < {k}
)""")
        for s in range(1, k + 1):
            parts.append(f"""m{r}_{s} AS (
  SELECT coalesce(max(lhs), '') AS l{s}, coalesce(max(rhs), '') AS r{s},
         count(*) > 0 AS k{s}
  FROM (SELECT lhs, rhs FROM sel{r} ORDER BY rk OFFSET {s-1} LIMIT 1)
)""")
        expr = "s"
        for s in range(1, k + 1):
            pat = f"CASE WHEN k{s} THEN {_S}||l{s}||{_S}||{_S}||r{s}||{_S} ELSE chr(30) END"
            rep = f"{_S}||l{s}||r{s}||{_S}"
            expr = f"replace({expr}, {pat}, {rep})"
        slots = ", ".join(f"m{r}_{s}" for s in range(1, k + 1))
        parts.append(f"v{r} AS MATERIALIZED (SELECT {expr} AS s, wf FROM v{r-1}, {slots})")
    union = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, lhs, rhs, pf, rk FROM sel{r}"
        for r in range(1, n_merges + 1)
    )
    ctes = ",\n".join(parts)
    return f"""WITH {ctes}
SELECT merge_rank, round, lhs, rhs, pair_freq FROM (
  SELECT CAST(row_number() OVER (ORDER BY round, rk) AS BIGINT) AS merge_rank,
         CAST(round AS BIGINT) AS round, lhs, rhs,
         CAST(pf AS BIGINT) AS pair_freq
  FROM ({union})
) WHERE merge_rank <= {n_merges}
"""


@register(
    "doc_bpe_merges_batched",
    _batched_oracle(_BATCH_N, _BATCH_K, _BATCH_M),
    "batched BPE training: top-K non-interacting merges per round (rounds/merge << 1)",
    bench=True,  # the vocab-size scale path: driver round-trips / merge ~ 1/K
)
def doc_bpe_merges_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VERDICT r7 item 3: the sequential trainer's one-job-per-merge floor
    caps practical vocabulary size; accepting the top-K NON-INTERACTING
    pairs per round (no shared symbol ⇒ counts invariant ⇒ commuting
    replaces) amortizes the job floor over K merges. Deterministic and
    exactly mirrored by the unrolled SQL above; k=1 degenerates to the
    sequential trainer (pytest pins 3-seed equivalence).

    Optimization r15: the merge rounds take the bounded driver fast path
    when the word table fits the cap (see learn_bpe_merges_batched) — the
    only Spark work left is the one word-frequency aggregate, whose
    single-task tokenize is CHEAPER unspread at this scale (paired A/B:
    plain min 0.42 s vs spread 0.86 s; the r14 spread paid for the
    per-round jobs that re-read the base, which the fast path removed).
    At 100 TB the scan has thousands of splits and the spread was a no-op
    there anyway; the over-cap distributed loop is unchanged."""
    return learn_bpe_merges_batched(
        load_table(spark, sf_dir, "documents"),
        n_merges=_BATCH_N,
        k_per_round=_BATCH_K,
        cand_m=_BATCH_M,
    )


# --- tokenizer fertility: per-language compression report --------------------

_FERTILITY_ORACLE = f"""WITH {_bpe_ctes(N_MERGES)},
counted AS (
  SELECT d.doc_id, d.lang,
         CAST(length(regexp_replace(trim(d.text), '\\s+', '', 'g')) AS BIGINT) AS n_chars,
         CAST(len(string_split_regex(trim(d.text), '\\s+')) AS BIGINT) AS n_words,
         c.n_bpe_tokens
  FROM documents d JOIN (
    SELECT doc_id,
      CAST(coalesce(list_sum(list_transform(t, tk ->
        CASE WHEN contains(tk, {_S}) THEN length(tk)
             ELSE len(list_filter(string_split({{chain}}, {_S}), x -> x <> '')) END
      )), 0) AS BIGINT) AS n_bpe_tokens
    FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents), {{tops}}
  ) c USING (doc_id)
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_bpe_tokens) AS BIGINT) AS total_bpe_tokens,
       CAST(sum(n_words) AS BIGINT) AS total_words,
       CAST(sum(n_chars) AS DOUBLE) / sum(n_bpe_tokens) AS chars_per_token,
       CAST(sum(n_bpe_tokens) AS DOUBLE) / sum(n_words) AS fertility
FROM counted GROUP BY lang
"""


def _fertility_oracle(n_merges: int) -> str:
    tops = ", ".join(
        f"(SELECT lhs AS l{r}, rhs AS r{r} FROM top{r})" for r in range(1, n_merges + 1)
    )
    chain = f"{_S} || array_to_string(string_split(tk, ''), {_S}||{_S}) || {_S}"
    for r in range(1, n_merges + 1):
        chain = (
            f"replace({chain}, {_S}||l{r}||{_S}||{_S}||r{r}||{_S}, {_S}||l{r}||r{r}||{_S})"
        )
    return _FERTILITY_ORACLE.replace("{chain}", chain).replace("{tops}", tops)


@register(
    "lang_tokenizer_fertility",
    _fertility_oracle(N_MERGES),
    "tokenizer-eval report: per-language fertility (tokens/word) and chars/token",
)
def lang_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standard tokenizer evaluation a multilingual pipeline publishes
    per candidate vocabulary: fertility (BPE tokens per whitespace word —
    high fertility = the language is being shredded) and compression
    (chars per token). Integer sums per language, two divisions at the
    end — engine-portable without rounding."""
    import pyspark.sql.functions as F

    docs = load_table(spark, sf_dir, "documents")
    merges = trained_merges(spark, sf_dir)
    counted = bpe_token_counts(docs, merges, keep_cols=["lang"])
    chars = docs.select(
        "doc_id",
        F.length(F.regexp_replace(F.trim("text"), r"\s+", "")).cast("bigint").alias("n_chars"),
        F.size(F.split(F.trim("text"), r"\s+")).cast("bigint").alias("n_words"),
    )
    return (
        counted.join(chars, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_bpe_tokens").cast("bigint").alias("total_bpe_tokens"),
            F.sum("n_words").cast("bigint").alias("total_words"),
            (F.sum("n_chars").cast("double") / F.sum("n_bpe_tokens")).alias("chars_per_token"),
            (F.sum("n_bpe_tokens").cast("double") / F.sum("n_words")).alias("fertility"),
        )
    )


# --- MaxMatch (WordPiece-inference-style) greedy longest-match encode --------


def _maxmatch_oracle(n_merges: int) -> str:
    # the sequential position walk is a RECURSIVE CTE over the per-word
    # longest-match arrays (state: (word, position, emit ordinal)).
    # Deliberately NOT a list_reduce fold: DuckDB 1.0's list_reduce is
    # unreliable with accumulating state (struct accumulators drop list
    # fields outright, and a packed-list accumulator produced
    # run-to-run-NONDETERMINISTIC walks inside the full query) — the
    # recursion is plain joins, which are deterministic.
    return f"""WITH RECURSIVE {_vocab_enc_ctes(n_merges)},
words AS (SELECT w FROM w),
grid AS (SELECT w, unnest(range(0, length(w))) AS pos FROM words),
cand AS (
  SELECT g.w, g.pos, CAST(length(v.sym) AS BIGINT) AS ml, v.id AS vid
  FROM grid g JOIN vocab v
    ON g.pos + length(v.sym) <= length(g.w)
   AND substr(g.w, CAST(g.pos + 1 AS INT), length(v.sym)) = v.sym
),
lm AS (
  SELECT w, pos, max(ml) AS ml, arg_max(vid, ml) AS vid FROM cand GROUP BY w, pos
),
arrays AS MATERIALIZED (
  SELECT g.w,
         list(coalesce(lm.ml, 1) ORDER BY g.pos) AS lens,
         list(CAST(coalesce(lm.vid, 0) AS BIGINT) ORDER BY g.pos) AS vids
  FROM grid g LEFT JOIN lm ON g.w = lm.w AND g.pos = lm.pos
  GROUP BY g.w
),
walk(w, pos, ord, vid) AS (
  SELECT w, CAST(0 AS BIGINT), CAST(-1 AS BIGINT), CAST(NULL AS BIGINT) FROM arrays
  UNION ALL
  SELECT a.w, s.pos + a.lens[CAST(s.pos + 1 AS INT)], s.ord + 1,
         a.vids[CAST(s.pos + 1 AS INT)]
  FROM walk s JOIN arrays a ON s.w = a.w
  WHERE s.pos < len(a.lens)
),
walked AS MATERIALIZED (
  SELECT w, list(vid ORDER BY ord) AS ids FROM walk WHERE ord >= 0 GROUP BY w
),
amap AS (SELECT map(list(c), list(id)) AS am FROM alpha),
dtoks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
texp AS (
  SELECT doc_id, i - 1 AS wpos, t[i] AS tw
  FROM (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i FROM dtoks)
),
joined AS (
  SELECT e.doc_id, e.wpos,
         coalesce(wk.ids,
           list_transform(list_filter(string_split(e.tw, ''), c -> c <> ''),
                          c -> coalesce((a.am)[c][1], CAST(0 AS BIGINT)))) AS ids
  FROM texp e LEFT JOIN walked wk ON e.tw = wk.w CROSS JOIN amap a
),
offs AS (
  SELECT doc_id, wpos, ids,
         coalesce(sum(len(ids)) OVER (PARTITION BY doc_id ORDER BY wpos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM joined
)
SELECT doc_id, CAST(off + i - 1 AS BIGINT) AS pos, CAST(ids[i] AS BIGINT) AS token_id
FROM (SELECT doc_id, off, ids, unnest(range(1, len(ids) + 1)) AS i FROM offs)
"""


@register(
    "doc_maxmatch_encoded",
    _maxmatch_oracle(N_MERGES),
    "WordPiece-inference-style greedy longest-match encoding over the trained vocab",
)
def doc_maxmatch_encoded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OTHER tokenizer-inference discipline: MaxMatch (greedy longest
    match, the WordPiece/fast-WordPiece decode rule) against the SAME
    symbol inventory the BPE trainer produced — differs from BPE merge
    replay whenever a longer symbol shadows the merge order. Fully
    declarative: longest-match table via candidate-length explode +
    broadcast vocab join + argmax; the sequential position walk is a
    bounded higher-order fold. The corpus pays one broadcast word join +
    one doc-key window, same as the BPE encoder."""
    from duckpipe_spark.functions.bpe import bpe_vocab_ids, maxmatch_encode_ids

    docs = load_table(spark, sf_dir, "documents")
    merges = trained_merges(spark, sf_dir)
    vocab = bpe_vocab_ids(docs, merges)
    return maxmatch_encode_ids(docs, vocab)


# --- byte-fallback encode: lossless ids for ANY input (serving shape) --------

# injected per-doc suffix: one extra token mixing an in-alphabet char with
# two characters the training corpus never saw ('§' = C2 A7, 'ß' = C3 9F) —
# the serve-time drift byte fallback exists for
_BF_INJECT = " x§ß"

# hex-pair -> byte id (+1) as a SQL lambda over hex(encode(sym))
_BF_HEX = "hex(encode({s}))"
_BF_BYTES = (
    "list_transform(range(1, CAST(length(" + _BF_HEX + ") / 2 AS BIGINT) + 1), "
    "i -> CAST(16 * (strpos('0123456789ABCDEF', substr(" + _BF_HEX + ", CAST(2*i-1 AS INT), 1)) - 1) "
    "+ (strpos('0123456789ABCDEF', substr(" + _BF_HEX + ", CAST(2*i AS INT), 1)) - 1) + 1 AS BIGINT))"
)


def _bytefallback_oracle(n_merges: int) -> str:
    tops = ", ".join(
        f"(SELECT lhs AS l{r}, rhs AS r{r} FROM top{r})" for r in range(1, n_merges + 1)
    )
    chain = f"{_S} || array_to_string(string_split(tk, ''), {_S}||{_S}) || {_S}"
    for r in range(1, n_merges + 1):
        chain = (
            f"replace({chain}, {_S}||l{r}||{_S}||{_S}||r{r}||{_S}, {_S}||l{r}||r{r}||{_S})"
        )
    bytes_of = _BF_BYTES.format(s="e2.sym")
    return f"""WITH {_vocab_enc_ctes(n_merges)},
enc2 AS (
  SELECT doc_id,
    flatten(list_transform(t, tk -> CASE WHEN contains(tk, {_S})
        THEN string_split(tk, '')
        ELSE list_filter(string_split({chain}, {_S}), x -> x <> '') END)) AS syms
  FROM (SELECT doc_id, string_split_regex(trim(text || '{_BF_INJECT}'), '\\s+') AS t
        FROM documents), {tops}
),
e2 AS (
  SELECT doc_id, CAST(unnest(range(len(syms))) AS BIGINT) AS spos, unnest(syms) AS sym
  FROM enc2
),
sids AS (
  SELECT e2.doc_id, e2.spos,
         CASE WHEN v.id IS NOT NULL THEN [CAST(v.id + 256 AS BIGINT)]
              ELSE {bytes_of} END AS ids
  FROM e2 LEFT JOIN vocab v ON e2.sym = v.sym
),
offs AS (
  SELECT doc_id, spos, ids,
         coalesce(sum(len(ids)) OVER (PARTITION BY doc_id ORDER BY spos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM sids
)
SELECT doc_id, CAST(off + i - 1 AS BIGINT) AS pos, CAST(ids[i] AS BIGINT) AS token_id
FROM (SELECT doc_id, off, ids, unnest(range(1, len(ids) + 1)) AS i FROM offs)
"""


@register(
    "doc_bpe_bytefallback",
    _bytefallback_oracle(N_MERGES),
    "byte-fallback BPE encode: train-unseen chars become UTF-8 byte ids, never OOV 0",
)
def doc_bpe_bytefallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The serving half of the tokenizer contract: the vocabulary (byte
    ids 1..256, then alphabet + merge products shifted by 256) is trained
    on the ORIGINAL corpus, but the encoded text carries a per-doc
    injected token mixing an in-alphabet char with two characters the
    training corpus never saw — the drift every deployed tokenizer meets.
    Every unseen character encodes to its UTF-8 byte ids (id stream is
    lossless; nothing maps to OOV 0). Same scale shape as the join-impl
    encode: vocabulary-bounded merge replay + broadcast word join + one
    doc-key window."""
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.bpe import bpe_encode_ids_bytes, bpe_vocab_ids_bytes

    docs = load_table(spark, sf_dir, "documents")
    merges = trained_merges(spark, sf_dir)
    vocab = bpe_vocab_ids_bytes(docs, merges)
    injected = docs.select(
        "doc_id", F.concat(F.col("text"), F.lit(_BF_INJECT)).alias("text")
    )
    return bpe_encode_ids_bytes(injected, merges, vocab=vocab)
