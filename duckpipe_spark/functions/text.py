"""Text-analysis operators over a document table (SURVEY.md §2.14).

All kernels are built from JVM-side `pyspark.sql.functions` (split, regexp,
higher-order lambdas) — no Python UDFs in any hot path, so they run inside
whole-stage codegen and scale linearly with the scan. Every operator has an
exactly-matching DuckDB SQL formulation (used by the oracle gate); the
deterministic-integer design notes from `queries/relational.py` apply.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# shared constants (mirrored into the oracle SQL)
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"]
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "los", "que", "es"],
    "fr": ["le", "les", "et", "que", "est"],
}
PUNCT_CLASS = "[^.!?,;:]"
BPE_ISH_REGEX = r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]"


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization; trim first so both engines agree on
    leading/trailing empties.

    WS-class note (ADVICE r10 item 3 / r11 parity): Java's ASCII ``\\s``
    here is ``[ \\t\\n\\x0b\\f\\r]`` while the oracle twins' DuckDB/RE2
    ``\\s`` omits ``\\x0b`` — the one-byte divergence surface. The test
    corpus carries no ``\\x0b``, so every oracle comparison is unaffected;
    kernels that MUST be byte-identical on arbitrary bytes (the winnow
    family) spell the class out explicitly on both sides instead
    (``dedup._WS_KERNEL_RE`` + the explicit class in their oracle SQL)."""
    return F.split(F.trim(text), r"\s+")


def token_count_bpe_ish(text: Column) -> Column:
    """Sub-word-ish token count: alpha runs + single digits + single
    punctuation marks — a cheap deterministic proxy for BPE token counts."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_REGEX), F.lit(0)))


def stopword_count(toks: Column, words: list[str] | None = None) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*(words or STOPWORDS))))


def with_token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document token statistics + quality ratios."""
    t = tokens_col(F.col(text_col))
    df = df.withColumn("_t", t)
    n_tokens = F.size("_t")
    n_chars_nospace = F.length(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", ""))
    n_punct = F.length(F.regexp_replace(F.col(text_col), PUNCT_CLASS, ""))
    n_stop = F.size(F.filter(F.col("_t"), lambda x: x.isin(*STOPWORDS)))
    return df.select(
        F.col(id_col),
        n_tokens.cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct("_t")).cast("bigint").alias("n_uniq_tokens"),
        (n_stop.cast("double") / n_tokens).alias("stop_ratio"),
        (n_punct.cast("double") / F.length(F.col(text_col))).alias("punct_ratio"),
        (n_chars_nospace.cast("double") / n_tokens).alias("avg_token_len"),
        token_count_bpe_ish(F.col(text_col)).cast("bigint").alias("n_bpe_tokens"),
    )


def with_language_guess(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-stopword language ID: count hits per language, pick the max
    with a deterministic precedence (en > de > es > fr > und)."""
    toks = tokens_col(F.col(text_col))
    df = df.withColumn("_t", toks)

    def _count(words: list[str]):
        # single-arg lambda (a 2-arg callable would be read as (element, index))
        return F.size(F.filter(F.col("_t"), lambda x: x.isin(*words)))

    counts = {lang: _count(words) for lang, words in LANG_MARKERS.items()}
    en, de, es, fr = counts["en"], counts["de"], counts["es"], counts["fr"]
    guess = (
        F.when((en > 0) & (en >= de) & (en >= es) & (en >= fr), "en")
        .when((de > 0) & (de >= es) & (de >= fr), "de")
        .when((es > 0) & (es >= fr), "es")
        .when(fr > 0, "fr")
        .otherwise("und")
    )
    return df.select(F.col(id_col), guess.alias("lang_guess"))


def quality_points_col(text: Column) -> Column:
    """Integer quality points 0..3 (one per passed surface check). Kept as
    an exact integer so rollups can SUM it order-independently and divide
    once — averaging the float score would be summation-order-sensitive."""
    toks = tokens_col(text)
    n = F.size(toks)
    n_chars_nospace = F.length(F.regexp_replace(F.trim(text), r"\s+", ""))
    avg_len = n_chars_nospace.cast("double") / n
    punct_ratio = F.length(F.regexp_replace(text, PUNCT_CLASS, "")).cast("double") / F.length(text)
    s_count = F.when((n >= 10) & (n <= 1000), F.lit(1)).otherwise(F.lit(0))
    s_wordlen = F.when((avg_len >= 2.0) & (avg_len <= 12.0), F.lit(1)).otherwise(F.lit(0))
    s_punct = F.when(punct_ratio <= 0.1, F.lit(1)).otherwise(F.lit(0))
    return (s_count + s_wordlen + s_punct).cast("bigint")


def quality_score_col(text: Column) -> Column:
    """Composite [0,1] quality score from cheap surface statistics:
    in-range token count, in-range mean word length, low punct ratio."""
    return quality_points_col(text).cast("double") / F.lit(3.0)


def repetition_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals per document: the fraction of word
    bigrams that are repeats (1 − distinct/total) and the most frequent
    token with its mass fraction. High values flag degenerate/boilerplate
    text that length and punctuation ratios miss.

    Scale shape: the bigram stats are a pure projection (array HOFs inside
    codegen, no shuffle); the top token is one map-side-combinable
    (doc, term) count plus a rank window partitioned on the high-cardinality
    doc id. Ties on the top token break lexicographically so the winner is
    deterministic across engines and partitionings.
    """
    from pyspark.sql import Window

    toks = tokens_col(F.col(text_col))
    base = df.select(F.col(id_col), F.col(text_col)).withColumn("_t", toks).where(
        F.size("_t") >= 2
    )
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size("_t") - 2),
        lambda i: F.concat_ws(
            " ", F.element_at("_t", (i + 1).cast("int")), F.element_at("_t", (i + 2).cast("int"))
        ),
    )
    stats = base.select(
        F.col(id_col),
        F.size("_t").cast("bigint").alias("n_tokens"),
        (F.size("_t") - 1).cast("bigint").alias("n_bigrams"),
        (
            F.lit(1.0)
            - F.size(F.array_distinct(bigrams)).cast("double") / (F.size("_t") - 1)
        ).alias("dup_bigram_frac"),
    )
    tf = (
        base.select(F.col(id_col), F.explode("_t").alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tf").desc(), F.col("term").asc())
    top = (
        tf.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select(F.col(id_col), F.col("term").alias("top_token"), F.col("tf").alias("_top_tf"))
    )
    return stats.join(top, id_col).select(
        id_col,
        "n_tokens",
        "n_bigrams",
        "dup_bigram_frac",
        "top_token",
        (F.col("_top_tf").cast("double") / F.col("n_tokens")).alias("top_token_frac"),
    )


def fingerprint_col(text: Column) -> Column:
    """Normalized-content fingerprint: md5 of lowercase,
    whitespace-collapsed text (document identity for exact dedup)."""
    return F.md5(F.lower(F.trim(F.regexp_replace(text, r"\s+", " "))))


def build_vocab(
    df: DataFrame, max_size: int, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Frequency-ranked tokenizer vocabulary → (token, token_id,
    n_occurrences): the ``max_size`` most frequent whitespace tokens, ids
    1..max_size by (count desc, token asc); id 0 is reserved for OOV.

    Scale shape: the term counts are one map-side-combinable aggregate
    (output corpus-VOCABULARY-sized — Heaps' law); the top-``max_size``
    selection is two-phase — ``orderBy().limit()`` compiles to
    ``TakeOrderedAndProject`` (partial top-k per partition, single merge of
    the partials) so no partition ever sorts the full distinct-token table —
    and only then does a rank window assign ids, over a relation bounded by
    ``max_size`` (output-sized) regardless of corpus vocabulary. The trained
    vocabulary is the canonical broadcast-side table for ``encode_docs``.
    Deterministic ties (count, then token text) make the vocabulary — and
    therefore every downstream token id — reproducible across engines; the
    order is total (tokens are distinct), so the limit selects exactly the
    rows the old full-relation rank window kept."""
    toks = df.select(F.explode(tokens_col(F.col(text_col))).alias("token"))
    tf = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n_occurrences"))
    topk = tf.orderBy(F.col("n_occurrences").desc(), F.col("token").asc()).limit(
        max_size
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
    return (
        topk.withColumn("token_id", F.row_number().over(w).cast("bigint"))
        .select("token", "token_id", "n_occurrences")
    )


def encode_docs(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize + map to vocabulary ids → (doc_id, pos, token_id), OOV → 0:
    the id sequences a training pipeline feeds to packing
    (``sampling.pack_sequences``) and shard writing.

    Scale shape: explode is a projection (no shuffle); the vocabulary join
    is broadcast (the vocab table is bounded by max_size); nothing else
    moves. Positions are 0-based document order."""
    toks = df.select(
        F.col(id_col), F.posexplode(tokens_col(F.col(text_col))).alias("pos", "token")
    )
    return (
        toks.join(F.broadcast(vocab.select("token", "token_id")), "token", "left")
        .select(
            id_col,
            F.col("pos").cast("bigint").alias("pos"),
            F.coalesce("token_id", F.lit(0)).cast("bigint").alias("token_id"),
        )
    )


# PII scrubbing patterns — regex subset valid in both Java (Spark) and RE2
# (DuckDB): character classes, bounded repeats, alternation, \b. No
# lookaround, no backreferences.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9]{1,3}[-. ][0-9]{2,4}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}",
    "id_number": r"\b[0-9]{6,}\b",
}


def scrub_pii(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Redact PII-shaped spans (emails, phone-ish number groups, long digit
    runs) → (doc_id, n_email, n_phone, n_id_number, text_scrubbed). Each
    match is replaced by ``<PII>``; counts are per pattern class.

    A pure regexp projection (JVM codegen, no shuffle) — the patterns are
    deliberately the regex subset Java and RE2 agree on, so the scrubbed
    text is byte-identical across engines. Patterns apply in a fixed order
    (email, phone, id_number) so overlapping spans resolve deterministically."""
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(p), F.lit(0)))
        .cast("bigint")
        .alias(f"n_{name}")
        for name, p in PII_PATTERNS.items()
    ]
    scrubbed = F.col(text_col)
    for p in PII_PATTERNS.values():
        scrubbed = F.regexp_replace(scrubbed, p, "<PII>")
    return df.select(F.col(id_col), *counts, scrubbed.alias("text_scrubbed"))


GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_LINE_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_LINE_FRAC = 0.3
GOPHER_MIN_ALPHA_WORD_FRAC = 0.8
GOPHER_MIN_STOPWORDS = 2
GOPHER_BULLETS = ("-", "*", "•")


def gopher_quality_flags(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The Gopher quality-rule battery (Rae et al. 2021, Appendix A) as one
    shuffle-free projection → per-doc metrics, one boolean per rule, and
    the overall ``gopher_pass`` conjunction:

    * word count in [50, 100k]; mean word length in [3, 10] chars;
    * symbol-to-word ratio (``#`` or ``...``/``…`` occurrences) ≤ 0.1;
    * ≤ 90% of lines start with a bullet (``-``, ``*``, ``•``);
    * ≤ 30% of lines end with an ellipsis;
    * ≥ 80% of words contain at least one alphabetic character;
    * ≥ 2 stopwords from the shared STOPWORDS list.

    (The repetition half of Gopher's filter — duplicate n-gram and
    top-token mass rules — lives in ``repetition_stats``.)

    Every metric is an exact integer count; the ratios are single IEEE
    divisions of those integers, so both engines hash-match (same
    determinism argument as ``with_token_stats``). Lines split on ``\\n``
    after trimming each line's ``\\r`` is NOT needed (testdata is \\n-only;
    a real crawl normalizes first). Scale shape: a projection over the
    scan — no shuffle, no Python, whole-stage codegen throughout."""
    t = F.col(text_col)
    words = tokens_col(t)
    n_words = F.size(words)
    # chars across words (whitespace excluded), for mean word length
    n_word_chars = F.length(F.regexp_replace(F.trim(t), r"\s+", ""))
    mean_wl = n_word_chars.cast("double") / n_words
    n_hash = F.size(F.filter(F.split(t, ""), lambda c: c == "#"))
    n_ellipsis = F.size(F.regexp_extract_all(t, F.lit(r"\.\.\.|…"), F.lit(0)))
    symbol_ratio = (n_hash + n_ellipsis).cast("double") / n_words
    lines = F.filter(F.split(t, "\n"), lambda x: F.trim(x) != "")
    n_lines = F.size(lines)
    bullet = lambda x: F.trim(x).substr(1, 1).isin(*GOPHER_BULLETS)  # noqa: E731
    n_bullet = F.size(F.filter(lines, bullet))
    n_ell_end = F.size(
        F.filter(lines, lambda x: F.trim(x).rlike(r"(\.\.\.|…)$"))
    )
    n_alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    n_stop = stopword_count(words)
    # guard: a doc with no nonempty lines must yield 0.0, not NaN/inf —
    # double div-by-zero semantics differ across engines and poison the hash
    bullet_frac = F.when(n_lines == 0, F.lit(0.0)).otherwise(
        n_bullet.cast("double") / n_lines
    )
    ell_frac = F.when(n_lines == 0, F.lit(0.0)).otherwise(
        n_ell_end.cast("double") / n_lines
    )
    alpha_frac = n_alpha_words.cast("double") / n_words
    r_words = (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
    r_wl = (mean_wl >= GOPHER_MIN_MEAN_WORD_LEN) & (mean_wl <= GOPHER_MAX_MEAN_WORD_LEN)
    r_sym = symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO
    r_bullet = (n_lines == 0) | (bullet_frac <= GOPHER_MAX_BULLET_LINE_FRAC)
    r_ell = (n_lines == 0) | (ell_frac <= GOPHER_MAX_ELLIPSIS_LINE_FRAC)
    r_alpha = alpha_frac >= GOPHER_MIN_ALPHA_WORD_FRAC
    r_stop = n_stop >= GOPHER_MIN_STOPWORDS
    return df.select(
        F.col(id_col),
        n_words.cast("bigint").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_frac.alias("bullet_line_frac"),
        ell_frac.alias("ellipsis_line_frac"),
        alpha_frac.alias("alpha_word_frac"),
        n_stop.cast("bigint").alias("n_stopwords"),
        r_words.alias("rule_word_count"),
        r_wl.alias("rule_mean_word_len"),
        r_sym.alias("rule_symbol_ratio"),
        r_bullet.alias("rule_bullet_lines"),
        r_ell.alias("rule_ellipsis_lines"),
        r_alpha.alias("rule_alpha_words"),
        r_stop.alias("rule_stopwords"),
        (r_words & r_wl & r_sym & r_bullet & r_ell & r_alpha & r_stop).alias("gopher_pass"),
    )


def chunk_documents(
    df: DataFrame,
    max_tokens: int = 128,
    stride: int = 96,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping context-window chunks →
    (id_col, chunk_idx, start_token, n_chunk_tokens, chunk_text): chunk i
    covers tokens [i·stride, i·stride + max_tokens); the final chunk may be
    short; token-less docs yield no chunks. ``stride < max_tokens`` gives
    the standard training overlap of ``max_tokens - stride`` tokens.

    A pure projection + explode — chunks are emitted in the scan partition
    that read the document, no shuffle, no Python. chunk_idx is a function
    of the DATA (token offsets), so the output is partition-invariant and
    composes with ``shard_and_order`` / ``pack_sequences`` downstream."""
    if stride < 1:
        raise ValueError("chunk_documents needs stride >= 1")
    if max_tokens < stride:
        raise ValueError("chunk_documents needs max_tokens >= stride (non-negative overlap)")
    toks = tokens_col(F.col(text_col))
    df = df.withColumn("_t", F.filter(toks, lambda w: w != ""))
    n = F.size("_t")
    starts = F.when(n >= 1, F.sequence(F.lit(0), n - 1, F.lit(stride))).otherwise(
        F.array().cast("array<int>")
    )
    chunk = F.explode(
        F.transform(
            starts,
            lambda s, i: F.struct(
                i.cast("bigint").alias("chunk_idx"),
                s.cast("bigint").alias("start_token"),
                F.slice("_t", (s + 1).cast("int"), max_tokens).alias("ctoks"),
            ),
        )
    )
    out = df.select(F.col(id_col), chunk.alias("c"))
    return out.select(
        id_col,
        "c.chunk_idx",
        "c.start_token",
        F.size("c.ctoks").cast("bigint").alias("n_chunk_tokens"),
        F.array_join("c.ctoks", " ").alias("chunk_text"),
    )


def fim_transform(
    df: DataFrame,
    fim_rate_pct: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fill-in-the-middle transform (Bavarian et al. 2022) → (id_col,
    n_tokens, fim_applied, fim_text): for ``fim_rate_pct`` % of documents
    (selected by the Lehmer hash of the id — the deterministic stand-in
    for the paper's Bernoulli draw), split the token stream at two
    hash-derived cut points and emit PSM order
    ``<PRE> prefix <SUF> suffix <MID> middle``; the rest pass through in
    natural order. Pretraining on the transformed corpus is what gives a
    code/text model infilling ability without hurting left-to-right loss.

    Determinism: the two cut points are independent Lehmer draws mod
    (n+1), sorted — pure integer math, so the SAME document gets the SAME
    split on every engine, run, and partitioning. Segments may be empty
    (the paper's uniform split allows it); joins of empty arrays are ''.

    Scale shape: a pure projection — no shuffle, no Python; composes with
    chunking/packing downstream exactly like the identity text column."""
    from duckpipe_spark.functions.sampling import lehmer_hash_col

    toks = F.filter(tokens_col(F.col(text_col)), lambda w: w != "")
    df = df.withColumn("_t", toks)
    n = F.size("_t")
    h1 = lehmer_hash_col(F.col(id_col))
    h2 = lehmer_hash_col(F.col(id_col) + 1_000_003)
    a = h1 % (n + 1)
    b = h2 % (n + 1)
    lo = F.least(a, b)
    hi = F.greatest(a, b)
    psm = F.concat(
        F.lit("<PRE> "),
        F.array_join(F.slice("_t", 1, lo), " "),
        F.lit(" <SUF> "),
        F.array_join(F.slice("_t", hi + 1, n - hi), " "),
        F.lit(" <MID> "),
        F.array_join(F.slice("_t", lo + 1, hi - lo), " "),
    )
    applied = (h1 % 100) < fim_rate_pct
    return df.select(
        F.col(id_col),
        n.cast("bigint").alias("n_tokens"),
        applied.alias("fim_applied"),
        F.when(applied, psm).otherwise(F.array_join("_t", " ")).alias("fim_text"),
    )


def feature_hash_embed(
    df: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    impl: str = "arrow",
) -> DataFrame:
    """Feature-hashing document vectors (the hashing trick, Weinberger et
    al. 2009) → exploded (id_col, j, v): bucket j = word_hash % dim, sign
    = ±1 from the next hash bit, v = signed token-count sum over the
    document (tokens counted with multiplicity). All-integer and
    deterministic, so the "embedding" is exactly reproducible across
    engines/partitionings — the cheap vectorizer that lets the similarity
    stack (cosine top-k, LSH, IVF) run on corpora that ship no embedding
    column. Groups with sign-cancelled sums are emitted as v = 0 (bucket
    presence is data-determined, not value-determined).

    Two bit-identical impls (the shingle/minhash twin pattern —
    optimization r15, guide §4.2):

    * ``impl="arrow"`` (default): a ``mapInPandas`` kernel with a
      per-task memoized word→(bucket, sign) map (the 31-base char fold
      runs once per DISTINCT word, not per occurrence — the JVM
      higher-order fold is interpreted per element and was the measured
      stage cost) and per-batch (id, j) pre-aggregation, so the exchange
      carries strictly fewer rows than the explode. One final
      map-side-combinable merge aggregate.
    * ``impl="hof"``: the all-JVM expression twin (explode + per-token
      ``char_poly_hash`` fold + one (id, j) aggregate) — the
      cross-checkable form, and the fallback for non-integral ids and
      streams.

    Scale shape (both): one corpus pass; output ≤ |docs|·dim rows.
    """
    from duckpipe_spark.functions.dedup import POLY_BASE, POLY_MOD, char_poly_hash

    if dim < 1:
        raise ValueError("feature_hash_embed needs dim >= 1")
    id_type = df.schema[id_col].dataType.simpleString()
    if (
        impl == "arrow"
        and not df.isStreaming
        and id_type in ("bigint", "int", "smallint", "tinyint")
    ):
        def _map(pdf_iter):
            import re

            import pandas as pd

            ws = re.compile(r"[ \t\n\x0b\f\r]+")  # Java ASCII \s (tokens_col)
            memo: dict[str, tuple[int, int]] = {}

            def wsig(w: str) -> tuple[int, int]:
                t = memo.get(w)
                if t is None:
                    h = 0
                    for ch in w:
                        h = (h * POLY_BASE + ord(ch)) % POLY_MOD
                    t = (h % dim, 1 - 2 * ((h // dim) % 2))
                    memo[w] = t
                return t

            for pdf in pdf_iter:
                agg: dict[tuple[int, int], int] = {}
                for doc_id, text in zip(pdf.iloc[:, 0], pdf.iloc[:, 1]):
                    if not isinstance(text, str):
                        continue  # NULL text: the explode twin emits nothing
                    for w in ws.split(text.strip(" ")):
                        if w == "":
                            continue
                        j, s = wsig(w)
                        key = (doc_id, j)
                        agg[key] = agg.get(key, 0) + s
                if agg:
                    ks = list(agg)
                    yield pd.DataFrame(
                        {
                            id_col: [k[0] for k in ks],
                            "j": [k[1] for k in ks],
                            "v": [agg[k] for k in ks],
                        }
                    )

        part = df.select(id_col, text_col).mapInPandas(
            _map, f"{id_col} {id_type}, j int, v bigint"
        )
        return part.groupBy(id_col, "j").agg(F.sum("v").cast("bigint").alias("v"))
    toks = df.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("w")
    ).where(F.col("w") != "")
    wh = char_poly_hash(F.col("w"))
    j = (wh % dim).cast("int")
    sign = (F.lit(1) - F.lit(2) * ((wh / dim).cast("bigint") % 2)).cast("bigint")
    return (
        toks.select(F.col(id_col), j.alias("j"), sign.alias("s"))
        .groupBy(id_col, "j")
        .agg(F.sum("s").cast("bigint").alias("v"))
    )


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[int, list[str]]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 ranked retrieval (Robertson/Spärck Jones) over the corpus for a
    small set of keyword queries → (query_id, rank, doc_id, score) — the
    retrieval shape a training-data pipeline runs for hard-negative mining
    and seed-document expansion. idf is the non-log Robertson variant
    (N - df + 0.5)/(df + 0.5): rational in corpus integers, so both engines
    compute identical doubles without trusting ln() ulps.

    Determinism: every float is derived from exact integer aggregates
    through ONE mirrored expression tree; the per-(query, doc) score sums
    its ≤|terms| contributions as an ORDERED left fold over term-sorted
    contributions (the dot-product pattern), then rounds to 6 dp before
    ranking; ties break on doc_id.

    Scale shape: tf/dl are map-side-combinable aggregates of the token
    explode; df aggregates ONLY query terms (left-semi against the
    broadcast term set prunes the shuffle to matched rows); corpus-size
    stats ride a 1-row crossJoin (never collected); candidate rows
    entering the rank stage are only docs containing ≥1 query term, and
    the rank itself is the TWO-PHASE per-query top-k
    (``similarity._topk_per_query``, r10): with a stop-word-ish query
    term the candidate set is ~corpus-sized, and a single per-query
    window would send it all into one reducer task — the partial
    per-partition rank keeps every task's sort bounded by its input
    slice."""

    spark = docs.sparkSession
    toks = _bm25_tokens(docs, id_col, text_col)
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).cast("bigint").alias("dl"))
    qt = spark.createDataFrame(
        [(qid, t) for qid, terms in queries for t in terms], "query_id int, term string"
    )
    tf = (
        toks.join(F.broadcast(qt.select("term").distinct()), "term", "left_semi")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_dl"),
    )
    return _bm25_rank(tf, dl, dfq, stats, qt, k, k1, b, id_col)


def _bm25_tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The one tokenizer every BM25 relation derives from (train AND
    index-build must agree byte-for-byte or serve-time scores drift)."""
    return docs.select(
        F.col(id_col), F.explode(F.split(F.trim(F.lower(text_col)), r"\s+")).alias("term")
    )


def _bm25_rank(
    tf: DataFrame,
    dl: DataFrame,
    dfq: DataFrame,
    stats: DataFrame,
    qt: DataFrame,
    k: int,
    k1: float,
    b: float,
    id_col: str,
) -> DataFrame:
    """Shared BM25 scoring core (corpus path `bm25_topk` + index path
    `bm25_topk_from_index`): ONE mirrored expression tree over (tf, dl,
    df, corpus stats) so the disk-served scores are bit-identical to the
    corpus-derived ones — the same single-definition discipline the
    positional k-gram kernel follows."""
    k1_plus_1 = k1 + 1.0
    one_minus_b = 1.0 - b
    avgdl = F.col("total_dl").cast("double") / F.col("n_docs")
    idf = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(one_minus_b) + F.lit(b) * F.col("dl") / avgdl
    )
    contrib = idf * (F.col("tf") * F.lit(k1_plus_1)) / denom
    matched = (
        tf.join(F.broadcast(qt), "term")
        .join(F.broadcast(dfq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select("query_id", id_col, "term", contrib.alias("c"))
    )
    score = F.round(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("term", "c"))), lambda s: s["c"]
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    from duckpipe_spark.functions.similarity import _topk_per_query

    scored = matched.groupBy("query_id", id_col).agg(score.alias("score"))
    ranked = _topk_per_query(
        scored, [F.col("score").desc(), F.col(id_col).asc()], k
    )
    return ranked.select("query_id", "rank", F.col(id_col), "score")


def save_bm25_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Persist the BM25 retrieval index as a four-table parquet artifact —
    the retrieval twin of ``bpe.save_tokenizer``'s train/serve contract
    (VERDICT r10 item 6): build the index ONCE on the cluster, ship the
    artifact, and every serving job scores fresh query batches without
    touching the corpus again.

      <path>/postings.parquet   (doc_id, term, tf)   — corpus-sized, written
                                                       DISTRIBUTED (no
                                                       driver collect)
      <path>/doclens.parquet    (doc_id, dl)
      <path>/termstats.parquet  (term, df)           — vocabulary-sized
      <path>/stats.parquet      (n_docs, total_dl)   — 1 row, written LAST
                                                       (its _SUCCESS marker
                                                       is the artifact's
                                                       completeness check)

    All counts are exact integers from the single shared tokenizer
    (`_bm25_tokens`), so index-served scores reproduce corpus scores
    bit-for-bit."""
    toks = _bm25_tokens(docs, id_col, text_col)
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).cast("bigint").alias("dl"))
    postings = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    postings.write.mode("overwrite").parquet(f"{path}/postings.parquet")
    dl.write.mode("overwrite").parquet(f"{path}/doclens.parquet")
    postings_disk = docs.sparkSession.read.parquet(f"{path}/postings.parquet")
    postings_disk.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    ).write.mode("overwrite").parquet(f"{path}/termstats.parquet")
    dl_disk = docs.sparkSession.read.parquet(f"{path}/doclens.parquet")
    dl_disk.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_dl"),
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/stats.parquet")


def bm25_topk_from_index(
    spark,
    path: str,
    queries: list[tuple[int, list[str]]] | DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 ranked retrieval THROUGH a ``save_bm25_index`` disk artifact →
    (query_id, rank, doc_id, score): the serving shape — no corpus scan,
    no training lineage; the plan reads the postings/doclens/termstats/
    stats parquet and nothing else, so it works identically from a batch
    job, a fresh session, or a stream-side scorer.

    Scale shape mirrors ``bm25_topk``: the query-term semi-join prunes the
    postings scan to matched rows (predicate pushdown reaches the parquet
    scan — the term filter is a broadcast semi-join against a tiny term
    set), df/stats are vocabulary-bounded/1-row broadcasts, and the rank
    is the two-phase per-query top-k.

    ``queries`` is either the list-of-(query_id, terms) literal form or an
    already-distributed (query_id, term) DataFrame — the latter is how the
    streaming server (`streaming.corpus.bm25_serve_stream`) feeds each
    micro-batch of arriving queries through the same code path."""
    postings = spark.read.parquet(f"{path}/postings.parquet")
    dl = spark.read.parquet(f"{path}/doclens.parquet")
    termstats = spark.read.parquet(f"{path}/termstats.parquet")
    stats = spark.read.parquet(f"{path}/stats.parquet")
    if isinstance(queries, DataFrame):
        qt = queries.select("query_id", "term")
    else:
        qt = spark.createDataFrame(
            [(qid, t) for qid, terms in queries for t in terms],
            "query_id int, term string",
        )
    terms = qt.select("term").distinct()
    tf = postings.join(F.broadcast(terms), "term", "left_semi")
    dfq = termstats.join(F.broadcast(terms), "term", "left_semi")
    return _bm25_rank(tf, dl, dfq, stats, qt, k, k1, b, id_col)
