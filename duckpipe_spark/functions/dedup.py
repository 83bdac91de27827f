"""Deduplication operator family (SURVEY.md §2.14): exact, n-gram Jaccard,
MinHash+LSH, SimHash.

Design for 100 TB:
* exact dedup = hash-groupBy on a normalized fingerprint (one shuffle on the
  16-byte key, not the document bodies);
* near-dup pipelines all run through an *inverted index* (explode shingles →
  equi-join) or *LSH banding* (equi-join on band keys) — never an O(n²)
  cross join over documents;
* every hash is deterministic integer math (31-base rolling hash mod 1e9+7,
  affine MinHash permutations) so results are reproducible across engines,
  partitionings, and reruns — and exactly checkable against the DuckDB
  oracle.

MinHash and SimHash ship two interchangeable implementations that produce
bit-identical results (asserted in tests/test_dedup_semantics.py):
* ``impl="hof"`` — higher-order-function column expressions (JVM-side, zero
  Python), the reference formulation;
* ``impl="arrow"`` (default) — an Arrow-batched ``mapInPandas`` projection
  that does the same integer math vectorized in numpy with a per-partition
  word-hash memo. Same shape (pure projection, no explode, no shuffle),
  ~4-7× faster wall-clock because char-level HOF folds are interpreted
  per-element on the JVM while numpy folds whole token arrays per batch.
Everything else (exact dedup, Jaccard, LSH banding, components) is pure
DataFrame algebra with no Python in the hot path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from duckpipe_spark.functions.text import fingerprint_col, tokens_col

POLY_MOD = 1_000_000_007
POLY_BASE = 31
WORD_BASE = 1_000_003  # combines word hashes into a shingle hash

# fixed affine MinHash permutations (a*h + b) % POLY_MOD — deterministic
MINHASH_A = [769, 1543, 3079, 6151, 12289, 24593, 49157, 98317, 196613, 393241, 786433, 1572869]
MINHASH_B = [12582917, 25165843, 50331653, 100663319, 201326611, 402653189, 805306457, 1610612741, 53, 97, 193, 389]
N_HASHES = len(MINHASH_A)
BAND_SIZE = 3  # 4 bands of 3 rows
SIMHASH_BITS = 30


def char_poly_hash(col: Column) -> Column:
    """31-base rolling hash over the string's codepoints, mod 1e9+7.
    Exactly mirrored in DuckDB via list_reduce (see dedup_q oracles)."""
    chars = F.filter(F.split(col, ""), lambda c: c != "")
    return F.aggregate(
        F.transform(chars, lambda c: F.ascii(c).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * POLY_BASE + x) % POLY_MOD,
    )


def shingle_hash_array(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3,
    impl: str = "arrow",
) -> DataFrame:
    """Distinct shingle *hashes* per document as one array column
    → (id, hvs: array<bigint>), without ever materializing shingle strings:
    each word's characters are folded once (31-base mod 1e9+7), then the k
    word hashes of a shingle are combined with a second rolling fold
    (WORD_BASE). Vs hashing shingle strings this does ~k× less character
    work and skips the concat/re-split — shingle strings only exist in the
    Jaccard path, which joins on them.

    Keeping the hash set as an ARRAY (not exploded rows) keeps both impls a
    pure projection over the scan — no explode, no shuffle.

    ``impl="arrow"`` (default) runs the ``_iter_doc_hvs`` numpy kernel via
    ``mapInPandas`` — the same bit-identical twin MinHash/SimHash default
    to. The JVM HOF expression re-folds every word's characters through an
    ``aggregate()`` per element_at reference, which measured ~100× slower
    per doc (decontamination at sf0.1: 88 s hof vs <2 s arrow on one scan
    partition); the memoized word-hash cache + vectorized window fold is
    the right CPU shape for shingle-heavy text. ``impl="hof"`` keeps the
    all-JVM expression as the cross-checkable twin (and the fallback for
    non-bigint ids, which the Arrow schema pins)."""
    if impl == "arrow":
        id_type = df.schema[id_col].dataType.simpleString()
        if id_type in ("bigint", "int", "smallint", "tinyint"):
            def _map(pdf_iter):
                import pandas as pd

                for ids, arrs in _iter_doc_hvs(pdf_iter, k):
                    # dtype=object is load-bearing: an EMPTY batch (every
                    # doc in the Arrow batch shorter than k tokens, which
                    # real survivor-subset scans do produce) would default
                    # to float64 and Arrow refuses float64→list<int64>
                    yield pd.DataFrame(
                        {"id": ids, "hvs": pd.Series(arrs, dtype=object)}
                    )

            return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
                _map, "id bigint, hvs array<bigint>"
            )
        # non-integral ids can't ride the pinned Arrow schema — JVM twin
    toks = tokens_col(F.col(text_col))
    df = df.withColumn("_t", toks).where(F.size("_t") >= k)
    wh = F.transform(F.col("_t"), lambda w: char_poly_hash(w))
    df = df.withColumn("_wh", wh)
    def _combine(i: Column) -> Column:
        acc = F.element_at("_wh", (i + 1).cast("int"))
        for j in range(1, k):
            acc = (acc * WORD_BASE + F.element_at("_wh", (i + j + 1).cast("int"))) % POLY_MOD
        return acc
    # The index sequence must be CONDITIONALLY empty, not rely on the
    # size-filter above: sequence(0, size-k) DESCENDS for size < k, and
    # Spark's InferFiltersFromGenerate can evaluate the shingle expression
    # as a standalone predicate that optimizer rules reorder ahead of the
    # size filter — element_at would then index past short docs' arrays
    # (hit composing over span-dedup clean_text; same guard as
    # remove_duplicate_spans' span_idx).
    idx = F.when(
        F.size("_t") >= k, F.sequence(F.lit(0), F.size("_t") - k)
    ).otherwise(F.array().cast("array<int>"))
    hvs = F.transform(idx, _combine)
    # bit-identical to the Arrow kernel INCLUDING array layout (ADVICE r7):
    # np.unique returns sorted hashes and the pinned Arrow schema widens the
    # id to bigint, so the twin sorts too and integral ids take the same
    # widening — an order-sensitive consumer sees one layout per impl.
    out_id = F.col(id_col)
    if df.schema[id_col].dataType.simpleString() in ("bigint", "int", "smallint", "tinyint"):
        out_id = out_id.cast("bigint")
    return df.select(
        out_id.alias("id"), F.array_sort(F.array_distinct(hvs)).alias("hvs")
    )


def _iter_doc_hvs(pdf_iter, k: int):
    """Per Arrow batch, yield (doc_ids: int64 ndarray, [distinct shingle-hash
    ndarray per doc]) computing exactly ``shingle_hash_array``'s values in
    numpy: per-word 31-base char fold (memoized per partition — corpus
    vocabulary is far smaller than token count), then a WORD_BASE rolling
    fold across each k-window, then distinct. Mirrors the JVM semantics
    precisely: trim strips 0x20 only, the split regex is Java's ASCII
    ``\\s``, docs with < k tokens are dropped, and all math is int64 mod
    1e9+7 (no overflow: acc < 2^30, so acc·WORD_BASE + h < 2^51)."""
    import re

    import numpy as np

    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    cache: dict[str, int] = {}

    def whash(w: str) -> int:
        h = cache.get(w)
        if h is None:
            h = 0
            for ch in w:
                h = (h * POLY_BASE + ord(ch)) % POLY_MOD
            cache[w] = h
        return h

    for pdf in pdf_iter:
        ids: list[int] = []
        arrs: list = []
        for doc_id, text in zip(pdf.iloc[:, 0], pdf.iloc[:, 1]):
            if not isinstance(text, str):
                continue
            toks = ws.split(text.strip(" "))
            if len(toks) < k:
                continue
            wh = np.fromiter((whash(w) for w in toks), dtype=np.int64, count=len(toks))
            n = len(toks) - k + 1
            acc = wh[:n] % POLY_MOD
            for j in range(1, k):
                acc = (acc * WORD_BASE + wh[j : j + n]) % POLY_MOD
            ids.append(doc_id)
            arrs.append(np.unique(acc))
        yield np.array(ids, dtype=np.int64), arrs


def positional_shingle_hashes(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Per-document k-gram hashes WITH their 0-based start-token position →
    (id, pos, hv) rows, NOT distinct (every occurrence keeps its position).
    The positional variant of ``shingle_hashes`` for span-level operators
    (contamination masking needs to know WHERE a colliding n-gram sits).
    Arrow numpy kernel only (the r7 measurement: the JVM HOF fold is
    ~100× slower per doc); ids must be integral for the pinned schema."""
    id_type = df.schema[id_col].dataType.simpleString()
    if id_type not in ("bigint", "int", "smallint", "tinyint"):
        raise ValueError(f"positional_shingle_hashes needs an integral id column, got {id_type}")

    def _map(pdf_iter):
        import re as _re

        import numpy as np
        import pandas as pd

        ws = _re.compile(_WS_KERNEL_RE)
        cache: dict[str, int] = {}

        for pdf in pdf_iter:
            ids: list = []
            poss: list = []
            hvs: list = []
            for doc_id, text in zip(pdf.iloc[:, 0], pdf.iloc[:, 1]):
                if not isinstance(text, str):
                    continue
                acc = _positional_kgram_hashes(ws.split(text.strip(" ")), cache, k)
                if acc is None:
                    continue
                n = len(acc)
                ids.append(np.full(n, doc_id, dtype=np.int64))
                poss.append(np.arange(n, dtype=np.int32))
                hvs.append(acc)
            if ids:
                yield pd.DataFrame(
                    {
                        "id": np.concatenate(ids),
                        "pos": np.concatenate(poss),
                        "hv": np.concatenate(hvs),
                    }
                )

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        _map, "id bigint, pos int, hv bigint"
    )


# pos rides in the low bits of the tie-break key. 32 bits (r11, ADVICE r10
# item 1): hashes are < 2^30 (mod 1e9+7) so hash·2^32 + pos < 2^62 stays
# exact int64, and a single pathological ~4-billion-token document is the
# only thing that can overflow — no longer a plausible crawl artifact (the
# old 21-bit budget aborted the whole job on any ~2M-shingle doc).
_WINNOW_POS_BITS = 32

_WS_KERNEL_RE = r"[ \t\n\x0b\f\r]+"  # Java ASCII \s — shared by all kernels


def _positional_kgram_hashes(toks, cache: dict, k: int):
    """Shared kernel core (positional_shingle_hashes / winnow_fingerprints):
    token list → positional k-gram hash ndarray, or None for < k tokens.
    Per-word 31-base char fold memoized in the caller's per-partition
    ``cache``, then the WORD_BASE rolling fold across each k-window — the
    single definition of the fingerprint convention every dedup/decontam
    consumer joins on (a drifted copy would silently break cross-op
    compatibility)."""
    import numpy as np

    if len(toks) < k:
        return None

    def whash(word: str) -> int:
        h = cache.get(word)
        if h is None:
            h = 0
            for ch in word:
                h = (h * POLY_BASE + ord(ch)) % POLY_MOD
            cache[word] = h
        return h

    wh = np.fromiter((whash(x) for x in toks), dtype=np.int64, count=len(toks))
    n = len(toks) - k + 1
    acc = wh[:n] % POLY_MOD
    for j in range(1, k):
        acc = (acc * WORD_BASE + wh[j : j + n]) % POLY_MOD
    return acc


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003) → (id, pos, fp): slide a ``w``-window over the document's
    POSITIONAL k-gram hash sequence, select each window's minimum hash
    (ties → RIGHTMOST position, the paper's plain-winnowing rule §4,
    deterministic), and emit the DISTINCT selected (position, fingerprint)
    pairs.

    The guarantee that makes this THE local fingerprinting scheme: any
    shared token run of length >= w + k - 1 between two documents yields
    at least one shared selected fingerprint, while expected density is
    only 2/(w+1) of the shingle count — span-dedup-grade detection at a
    fraction of the index size. Selection is per-window min of the
    combined key ``hash·2^32 + (2^32−1−pos)`` (exact int64: hash < 2^30
    mod 1e9+7, so the key < 2^62), which encodes the rightmost-tie rule
    in one integer min — the form both engines compute bit-identically.
    Docs longer than 2^32 tokens are refused loudly rather than silently
    mis-keyed (r11: widened from 21 bits so multi-million-token crawl
    pathologies no longer abort the job).

    Shuffle-free Arrow projection (same kernel family and word-hash
    semantics as ``positional_shingle_hashes``): the window min is a
    per-doc-local computation, so no exchange exists until a consumer
    aggregates. Docs with < k tokens emit nothing; docs with fewer than
    ``w`` shingles emit the min of what they have (one degenerate
    window)."""
    id_type = df.schema[id_col].dataType.simpleString()
    if id_type not in ("bigint", "int", "smallint", "tinyint"):
        raise ValueError(f"winnow_fingerprints needs an integral id column, got {id_type}")

    pos_cap = 1 << _WINNOW_POS_BITS

    def _map(pdf_iter):
        import re as _re

        import numpy as np
        import pandas as pd

        ws = _re.compile(_WS_KERNEL_RE)
        cache: dict[str, int] = {}

        for pdf in pdf_iter:
            ids: list = []
            sels: list = []
            for doc_id, text in zip(pdf.iloc[:, 0], pdf.iloc[:, 1]):
                if not isinstance(text, str):
                    continue
                acc = _positional_kgram_hashes(ws.split(text.strip(" ")), cache, k)
                if acc is None:
                    continue
                n = len(acc)
                if n >= pos_cap:
                    raise ValueError(
                        f"winnow_fingerprints: doc {doc_id} has >= 2^32 "
                        "shingles — the pos tie-break key would overflow"
                    )
                # rightmost-tie key: reversed pos in the low bits, so the
                # integer min prefers the LARGEST position among equal hashes
                comb = acc * pos_cap + (pos_cap - 1 - np.arange(n, dtype=np.int64))
                if n <= w:
                    sel = np.array([comb.min()], dtype=np.int64)
                else:
                    win = np.lib.stride_tricks.sliding_window_view(comb, w)
                    sel = np.unique(win.min(axis=1))
                ids.append(np.full(len(sel), doc_id, dtype=np.int64))
                sels.append(sel)
            if ids:
                allsel = np.concatenate(sels)
                yield pd.DataFrame(
                    {
                        "id": np.concatenate(ids),
                        "pos": (pos_cap - 1) - (allsel % pos_cap),
                        "fp": allsel // pos_cap,
                    }
                )

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        _map, "id bigint, pos bigint, fp bigint"
    )


def winnow_matches(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
    max_df: int = 50,
) -> DataFrame:
    """Candidate near-duplicate pairs from shared winnowed fingerprints →
    (id_a, id_b, n_shared): the MOSS-style matching pass over
    ``winnow_fingerprints``. Two docs sharing any token run of length
    >= w + k - 1 are guaranteed to appear (they share a selected
    fingerprint); n_shared grows with overlap, so callers rank or
    threshold it before the exact verify step (same contract as the
    Jaccard candidate pass).

    Scale shape: inverted-index equi-self-join on fp — never all-pairs.
    Fingerprints appearing in more than ``max_df`` docs (boilerplate) are
    dropped via a broadcast anti-join BEFORE the pair join, the same skew
    guard the Jaccard candidates use: one hot boilerplate fingerprint
    would otherwise contribute df² pair rows."""
    # cache the kernel output before fanning it out (hot-df subtree + both
    # sides of the pair self-join) — the same one-pass discipline
    # ngram_jaccard_pairs applies to its shingle table; without it every
    # branch replays the full tokenize+winnow Arrow kernel
    fps = (
        winnow_fingerprints(df, text_col, id_col, k, w)
        .select("id", "fp")
        .distinct()
        .cache()
    )
    hot = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("d"))
        .where(F.col("d") > max_df)
        .select("fp")
    )
    rare = fps.join(F.broadcast(hot), "fp", "left_anti")
    a = rare.select(F.col("id").alias("id_a"), "fp")
    b = rare.select(F.col("id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )


def shingle_hashes(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3,
    impl: str = "arrow",
) -> DataFrame:
    """Exploded form of `shingle_hash_array` → (id, hv) rows, for operators
    that join on the hash (inverted-index paths)."""
    return shingle_hash_array(df, text_col, id_col, k, impl=impl).select(
        "id", F.explode("hvs").alias("hv")
    )


def word_shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """Distinct word k-shingles per document → (id, shingle)."""
    toks = tokens_col(F.col(text_col))
    df = df.withColumn("_t", toks).where(F.size("_t") >= k)
    # conditionally-empty index sequence — see shingle_hash_array's note on
    # InferFiltersFromGenerate reordering vs the size filter
    idx = F.when(
        F.size("_t") >= k, F.sequence(F.lit(0), F.size("_t") - k)
    ).otherwise(F.array().cast("array<int>"))
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at("_t", (i + j + 1).cast("int")) for j in range(k)]),
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(sh)).alias("shingle"))
        .distinct()
    )


def ngram_novelty(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Per-document n-gram novelty rate → (id, n_shingles, n_novel,
    novel_frac): the share of a document's DISTINCT k-shingles that occur
    in no other document. Lee et al. 2021 report exactly this rate to
    quantify how much of a corpus is memorization-prone boilerplate vs
    novel text; as a per-doc signal it ranks candidates for dedup review
    (low novelty = likely near-duplicate or template).

    Scale shape: shingle hashes come from the Arrow kernel projection
    (no strings shuffle); the document-frequency aggregate and the
    join-back both key on the shingle hash — bounded by distinct shingle
    count, the same inverted-index shape as ``ngram_jaccard_pairs`` but
    WITHOUT the pair explosion (df is summed, never self-joined).
    novel_frac is one exact-integer division (engine-portable bits)."""
    sh = shingle_hash_array(docs, text_col=text_col, id_col=id_col, k=k)
    ex = sh.select("id", F.explode("hvs").alias("hv"))
    dfc = ex.groupBy("hv").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    sizes = sh.select("id", F.size("hvs").cast("bigint").alias("n_shingles"))
    nov = (
        ex.join(dfc.where(F.col("df") == 1), "hv", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_novel"))
    )
    n_novel = F.coalesce(F.col("n_novel"), F.lit(0)).cast("bigint")
    return sizes.join(nov, "id", "left").select(
        "id",
        "n_shingles",
        n_novel.alias("n_novel"),
        (n_novel.cast("double") / F.col("n_shingles")).alias("novel_frac"),
    )


def exact_dedup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct normalized content with
    the canonical (min) id and the duplicate count."""
    return (
        df.select(F.col(id_col).alias("id"), fingerprint_col(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min("id").alias("canonical_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.1,
    max_df: int | None = 1000,
) -> DataFrame:
    """Document pairs with word-k-gram Jaccard ≥ threshold, via inverted
    index: shingle equi-join gives |A∩B|; |A∪B| = |A|+|B|−|A∩B|.

    ``max_df`` caps shingle document frequency before the self-join: a
    shingle present in d documents contributes O(d²) join rows, so one
    stop-word k-gram shared by the whole corpus turns the inverted-index
    join quadratic. Dropping shingles with df > max_df (standard IR
    practice) keeps the pair count linear in corpus size; both |A∩B| and
    the per-doc sizes are computed on the SAME filtered shingle universe,
    so the reported Jaccard stays internally consistent, and near-dup
    recall is unaffected at realistic thresholds (ubiquitous shingles
    carry no discriminative signal). The hot-shingle list (df > max_df)
    is tiny by construction and is removed with a broadcast anti-join —
    one extra partial-aggregated groupBy, no new wide shuffle of the
    (id, shingle) index. Pass ``max_df=None`` for the uncapped join.
    """
    sh = word_shingles(df, text_col, id_col, k)
    if max_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") > max_df)
            .select("shingle")
        )
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    sh = sh.cache()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    impl: str = "arrow",
) -> DataFrame:
    """MinHash signature per document: s_i = min over shingles of
    (a_i·h(shingle) + b_i) mod 1e9+7. Output columns s0..s{N-1}.

    Both impls are pure projections over the scan — no explode, no groupBy,
    no shuffle (the original formulation shuffled every (id, hash) row to a
    grouped MIN). ``arrow`` folds each doc's shingle-hash array through all
    N_HASHES affine permutations as one (N_HASHES × n) numpy matmul-shaped
    op; ``hof`` is `array_min(transform(hvs, …))` per permutation."""
    if impl == "hof":
        arr = shingle_hash_array(df, text_col, id_col, k, impl="hof")

        def _perm(a: int, b: int):
            # single-arg lambda factory (a 2-arg callable would be read by
            # transform() as (element, index))
            return lambda h: (F.lit(a) * h + F.lit(b)) % POLY_MOD

        sigs = [
            F.array_min(F.transform("hvs", _perm(MINHASH_A[i], MINHASH_B[i]))).alias(f"s{i}")
            for i in range(N_HASHES)
        ]
        return arr.select("id", *sigs)

    def _map(pdf_iter):
        import numpy as np
        import pandas as pd

        a = np.array(MINHASH_A, dtype=np.int64)[:, None]
        b = np.array(MINHASH_B, dtype=np.int64)[:, None]
        for ids, arrs in _iter_doc_hvs(pdf_iter, k):
            # a·h < 2^21 · 2^30 = 2^51: int64-safe
            sigs = np.empty((len(ids), N_HASHES), dtype=np.int64)
            for r, hvs in enumerate(arrs):
                sigs[r] = ((a * hvs[None, :] + b) % POLY_MOD).min(axis=1)
            out = pd.DataFrame({"id": ids})
            for i in range(N_HASHES):
                out[f"s{i}"] = sigs[:, i]
            yield out

    schema = "id bigint, " + ", ".join(f"s{i} bigint" for i in range(N_HASHES))
    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(_map, schema)


def banded_keys(sigs: DataFrame) -> DataFrame:
    """Explode MinHash signatures to LSH band rows → (id, bidx, bk). The
    band index is part of the join key, so collisions never cross bands."""
    n_bands = N_HASHES // BAND_SIZE
    band_entries = [
        F.struct(
            F.lit(b).alias("bidx"),
            F.concat_ws(
                "_",
                *[F.col(f"s{b * BAND_SIZE + j}").cast("string") for j in range(BAND_SIZE)],
            ).alias("bk"),
        )
        for b in range(n_bands)
    ]
    return sigs.select("id", F.explode(F.array(*band_entries)).alias("band")).select(
        "id", F.col("band.bidx").alias("bidx"), F.col("band.bk").alias("bk")
    )


def lsh_candidate_pairs(sigs: DataFrame) -> DataFrame:
    """LSH banding over MinHash signatures: a pair is a candidate iff it
    collides in ≥1 band of BAND_SIZE consecutive signature rows.

    One self-join on exploded (band_idx, band_key) rows — a single shuffle
    regardless of band count, vs one join per band; the signature table is
    cached because the self-join reads the banded rows twice."""
    banded = banded_keys(sigs).cache()
    left = banded.select(F.col("id").alias("id_a"), "bidx", "bk")
    right = banded.select(F.col("id").alias("id_b"), "bidx", "bk")
    return (
        left.join(right, ["bidx", "bk"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def lsh_join(
    left: DataFrame,
    right: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_jaccard_pct: int = 20,
    broadcast_small_side: bool = False,
) -> DataFrame:
    """Cross-corpus near-duplicate join — the decontamination shape: match
    every ``left`` document against the ``right`` corpus (benchmark /
    blocklist / previous crawl) by MinHash-LSH banding, then verify each
    candidate with the EXACT Jaccard over distinct shingle hashes.
    → (id_a from left, id_b from right, n_inter, n_union), kept when
    100·n_inter ≥ min_jaccard_pct·n_union — an integer threshold on an
    integer fraction, so the result hash-verifies exactly (a float
    jaccard column would invite round()-tie divergence; divide
    downstream if a ratio is wanted).

    Scale shape: band keys are the only cross-corpus join (candidates are
    collision-bounded, never |L|×|R|); the verify step attaches the two
    bounded per-doc hash arrays to candidate pairs and intersects
    JVM-side — same skeleton as `lsh_candidate_pairs` + the Jaccard
    verify of `corpus_pipeline`, generalized to two tables.

    ``broadcast_small_side=True`` is the decontamination fast path: when
    ``right`` (benchmark/blocklist) is genuinely small, its hash-array
    table AND the candidate-pair set are broadcast, so the big corpus's
    shingle arrays are intersected in place in their scan partitions —
    the default plan shuffles them by id to meet the candidate set
    (measured 2.4→1.7 s at a 46k-doc corpus, BASELINE §12). Leave False
    when the right corpus or the collision volume is not
    executor-memory-small; the distributed equi-join plan is the safe
    default at web scale."""
    lb = banded_keys(minhash_signatures(left, text_col, id_col, k)).select(
        F.col("id").alias("id_a"), "bidx", "bk"
    )
    rb = banded_keys(minhash_signatures(right, text_col, id_col, k)).select(
        F.col("id").alias("id_b"), "bidx", "bk"
    )
    cand = lb.join(rb, ["bidx", "bk"]).select("id_a", "id_b").distinct()
    la = shingle_hash_array(left, text_col, id_col, k).select(
        F.col("id").alias("id_a"), F.col("hvs").alias("_ha")
    )
    ra = shingle_hash_array(right, text_col, id_col, k).select(
        F.col("id").alias("id_b"), F.col("hvs").alias("_hb")
    )
    n_inter = F.size(F.array_intersect("_ha", "_hb"))
    if broadcast_small_side:
        joined = la.join(F.broadcast(cand), "id_a").join(F.broadcast(ra), "id_b")
    else:
        joined = cand.join(la, "id_a").join(ra, "id_b")
    verified = (
        joined
        .select(
            "id_a",
            "id_b",
            n_inter.cast("bigint").alias("n_inter"),
            (F.size("_ha") + F.size("_hb") - n_inter).cast("bigint").alias("n_union"),
        )
    )
    # n_inter > 0 unconditionally: a "near-duplicate" with zero shared
    # shingles is meaningless, and the SQL-oracle formulation (inner join
    # on shared hashes) cannot even represent such a pair — keeping them
    # at min_jaccard_pct=0 would silently diverge from the oracle
    return verified.where(
        (F.col("n_inter") > 0)
        & (F.lit(100) * F.col("n_inter") >= F.lit(int(min_jaccard_pct)) * F.col("n_union"))
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    impl: str = "arrow",
) -> DataFrame:
    """SIMHASH_BITS-bit SimHash over shingle hashes: bit j is set when the
    majority of shingles have bit j set (count(bit_j) * 2 > n).

    Both impls are shuffle-free projections (the original formulation
    shuffled every (id, hash) row to a grouped SUM). ``arrow``: one
    (SIMHASH_BITS × n) shift-and-mask bit matrix per doc, summed along the
    shingle axis in numpy. ``hof``: 3 bit-counters packed per BIGINT at
    21-bit offsets (counts fit: ≤2^21 shingles per doc well above any real
    document), so only SIMHASH_BITS/3 `aggregate()` folds run instead of
    SIMHASH_BITS conditional sums; unpacking is shift+mask. All integer
    math; the oracle mirrors the packed formulation."""
    if impl == "arrow":
        def _map(pdf_iter):
            import numpy as np
            import pandas as pd

            shifts = np.arange(SIMHASH_BITS, dtype=np.int64)[:, None]
            weights = np.int64(1) << np.arange(SIMHASH_BITS, dtype=np.int64)
            for ids, arrs in _iter_doc_hvs(pdf_iter, k):
                sims = np.empty(len(ids), dtype=np.int64)
                for r, hvs in enumerate(arrs):
                    cnt = ((hvs[None, :] >> shifts) & 1).sum(axis=1)
                    sims[r] = weights[cnt * 2 > hvs.size].sum()
                yield pd.DataFrame({"id": ids, "simhash": sims})

        return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
            _map, "id bigint, simhash bigint"
        )

    arr = shingle_hash_array(df, text_col, id_col, k, impl="hof")

    def _packed_fold(s: int) -> Column:
        def _step(acc: Column, h: Column) -> Column:
            slot = None
            for m in range(3):
                j = 3 * s + m
                term = (F.shiftright(h, j) % 2) * F.lit(1 << (21 * m)).cast("bigint")
                slot = term if slot is None else slot + term
            return acc + slot

        return F.aggregate("hvs", F.lit(0).cast("bigint"), _step).alias(f"p{s}")

    packed = arr.select(
        "id",
        F.size("hvs").cast("bigint").alias("n_sh"),
        *[_packed_fold(s) for s in range(SIMHASH_BITS // 3)],
    )
    mask = (1 << 21) - 1
    sim = None
    for j in range(SIMHASH_BITS):
        s, m = divmod(j, 3)
        cnt = F.shiftright(F.col(f"p{s}"), 21 * m) % F.lit(mask + 1).cast("bigint")
        term = F.when(cnt * 2 > F.col("n_sh"), F.lit(1 << j).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        sim = term if sim is None else sim + term
    return packed.select("id", sim.alias("simhash"))


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
    max_driver_edges: int = 1_000_000,
) -> DataFrame:
    """Connected components over an undirected edge list → (id, component),
    component = min node id reachable from `id`. The closure operator for
    near-dup dedup: LSH/Jaccard candidate PAIRS chain transitively (A~B,
    B~C ⇒ {A,B,C} is one duplicate cluster even when A~C was never a
    candidate), and keep-one-per-component is the correct drop rule.

    SMALL-GRAPH FAST PATH (r14, VERDICT r13 item 4): when the pair stream
    has at most ``max_driver_edges`` rows, the closure runs as a
    driver-side union-find over ONE bounded collect. This is the same
    bounded-driver-collect doctrine as the k-row centroid/model tables:
    the pair graph is sized by the DUPLICATE MASS, not the corpus (the
    sf1 50k-code fixture yields 35k pairs; the banding engine's
    hot-band/df caps bound its growth), the cap is explicit, and the
    distributed loop below remains the >cap path — at 100 TB a
    billion-edge pair graph takes the loop, a megabyte-scale one skips
    ~diameter rounds of per-round scheduling fixed cost (measured 5.5 s →
    ~1 s on the 8-round sf1 fixture graph). Labels are identical by
    construction (union-find emits the same min-reachable-id).

    OPTIMIZATION r14 (guide §2.4, remove work outright): the fast path is
    now ONE action — ``limit(cap+1).toPandas()`` on the RAW directed pair
    stream. Union-find needs neither symmetrization nor dedup (union is
    direction-blind and idempotent), so the former
    symmetrize→distinct→cache→count→toPandas chain (two extra exchanges
    and two extra jobs per invocation) was pure overhead; the cap is
    therefore now a bound on raw pair ROWS, and the collect itself is
    limit-bounded at 16 bytes/row. Graphs over the cap fall through to
    the distributed loop exactly as before.

    CAP SEMANTICS (r15, VERDICT r14 item 2 — the raw-row and the old
    distinct-symmetrized-edge bounds are INCOMPARABLE, not one "tighter"):
    a duplicate-free pair stream counts ~half the old symmetrized count
    (some graphs newly fit the driver — harmless, the collect stays
    ≤ cap rows); a duplicate-heavy stream (the ``distinct=False`` media
    feed deliberately keeps its small banding multiplicity) counts MORE
    rows than its distinct edge set, so such a graph can newly take the
    distributed loop — the safe, label-identical fallback. Measured
    multiplicity of the media feed at sf1: see OPTIMIZATION_r15.md (the
    banding rule bounds it at ≤ 4 rows/pair; the cap is sized with that
    multiset in mind).

    Distributed algorithm: iterative neighbor-min label propagation. Each
    round is one equi-join of the (static, cached) symmetrized adjacency
    against the current labels plus a map-side-combinable min-aggregate —
    two shuffles per round, both on the node-id key, no driver-side graph
    state. Rounds needed = graph diameter; `localCheckpoint` cuts the
    lineage so plan size stays O(1) per round instead of O(rounds). For
    adversarial long-chain graphs above the driver cap use
    `connected_components_star` below (alternating large-star/small-star,
    O(log n) rounds, identical result contract).

    The per-round `count()` is the convergence test (an aggregate, not a
    collect of data rows).
    """
    e = edges.select(F.col(src).cast("bigint").alias("u"), F.col(dst).cast("bigint").alias("v"))
    # one bounded collect decides the path AND carries the fast-path data:
    # cap+1 rows distinguishes "fits" from "spills over" without a count job
    pdf = e.limit(max_driver_edges + 1).toPandas()
    if len(pdf) <= max_driver_edges:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        import pandas as pd

        for u, v in zip(pdf["u"].to_numpy(), pdf["v"].to_numpy()):
            u, v = int(u), int(v)
            if u not in parent:
                parent[u] = u
            if v not in parent:
                parent[v] = v
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[ru] = rv
        comp_min: dict[int, int] = {}
        for node in parent:
            r = find(node)
            m = comp_min.get(r)
            if m is None or node < m:
                comp_min[r] = node
        nodes = list(parent)
        return e.sparkSession.createDataFrame(
            pd.DataFrame(
                {
                    "id": pd.Series(nodes, dtype="int64"),
                    "component": pd.Series(
                        [comp_min[find(n)] for n in nodes], dtype="int64"
                    ),
                }
            ),
            schema="id bigint, component bigint",  # empty graph → empty frame
        )
    del pdf  # over the cap: release the partial collect before the loop
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct().cache()
    sym.count()  # materializes the cache before the loop re-reads it per round
    # r14 (VERDICT r13 item 4): initialize comp = min(u, min(N(u))) — the
    # grouped adjacency performs round 1 WITHOUT a join (the init had to
    # shuffle sym for its distinct anyway), so the loop starts from the
    # 1-hop fixed point and typical dedup clumps converge one full
    # join-round earlier. Labels are unchanged: min-propagation from any
    # per-node upper bound that is itself a component-member id reaches
    # the same component-min fixed point (monotone decrease, and the
    # component's min node m keeps comp(m) = m from init on).
    labels = sym.groupBy("u").agg(
        F.least(F.col("u"), F.min("v")).alias("comp")
    )
    changed = 0
    for _ in range(max_iter):
        nbr = (
            sym.join(labels.withColumnRenamed("u", "v"), "v")
            .groupBy("u")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        # carry the OLD label through the checkpoint so convergence is a
        # filter-count on the materialized frame instead of a second
        # join per round (r13), and checkpoint LAZILY so the convergence
        # count is the job that materializes it (r14) — one action per
        # round total; on tiny pair graphs the rounds are pure
        # scheduling overhead, so halving the job count halves the
        # fixed cost
        upd = (
            labels.join(nbr, "u", "left")
            .select(
                "u",
                F.col("comp").alias("old"),
                F.least(F.col("comp"), F.coalesce("nbr_comp", "comp")).alias("comp"),
            )
            .localCheckpoint(eager=False)
        )
        changed = upd.where(F.col("comp") != F.col("old")).count()
        labels = upd.select("u", "comp")
        if changed == 0:
            break
    sym.unpersist()
    if changed > 0:
        # Exiting via max_iter means labels are NOT fixed-point: downstream
        # keep-one-per-component would keep/drop wrong rows silently. Dedup
        # graphs converge in single digits of rounds; hitting this means the
        # graph has path-graph-like chains — raise max_iter or switch to
        # large-star/small-star (see docstring).
        import warnings

        warnings.warn(
            f"connected_components did not converge within max_iter={max_iter} "
            f"({changed} labels still changing); component labels are not final "
            f"- for long-chain graphs use connected_components_star",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select(F.col("u").alias("id"), F.col("comp").alias("component"))


def connected_components_star(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 40,
) -> DataFrame:
    """Connected components via alternating large-star/small-star (Kiveris
    et al., "Connected Components in MapReduce and Beyond", SoCC'14) —
    the O(log n)-round alternative to `connected_components` for graphs
    whose diameter is NOT small.

    Neighbor-min propagation needs diameter-many rounds: a 10^6-node path
    graph (chained near-dup shingles, linked-page graphs) would run 10^6
    joins. The star operations instead rewire edges toward each
    neighborhood's minimum:

    * large-star: every node u links its LARGER neighbors to
      min(N(u) ∪ {u}) — strictly shrinks tall trees without breaking
      connectivity;
    * small-star: every node u (keyed as the larger endpoint of each
      edge, so all its kept neighbors are smaller) links them and itself
      to the minimum — flattens the remainder into stars.

    The fixed point is a star forest: every edge is (node, component-min).
    Each round is two groupBy-min + join passes over the current edge
    list, all keyed shuffles, lineage cut per round; rounds needed are
    O(log n) on adversarial chains (a 300-node path converges in ~5).

    Result contract is identical to `connected_components`: (id,
    component) with component = min reachable node id — the two are
    asserted equal on random graphs in tests.
    """
    e = edges.select(
        F.col(src).cast("bigint").alias("u"), F.col(dst).cast("bigint").alias("v")
    ).where(F.col("u") != F.col("v"))
    nodes = (
        e.select(F.col("u").alias("id"))
        .union(e.select(F.col("v").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    # canonical working set: undirected edges as u<v rows
    cur = (
        e.select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iter):
        # ---- large-star: key on BOTH endpoints (symmetrize) ----
        sym = cur.union(cur.select(F.col("v").alias("u"), F.col("u").alias("v")))
        # min over {u} ∪ N(u); min("u") == u within the group (grouping key)
        lmin = sym.groupBy("u").agg(F.least(F.min("v"), F.min("u")).alias("m"))
        large = (
            sym.join(lmin, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.least("v", "m").alias("u"), F.greatest("v", "m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # ---- small-star: key on the larger endpoint (v side of u<v rows) ----
        ss = large.select(F.col("v").alias("c"), F.col("u").alias("n"))
        smin = ss.groupBy("c").agg(F.min("n").alias("m"))
        small = (
            ss.join(smin, "c")
            .select(F.least("n", "m").alias("u"), F.greatest("n", "m").alias("v"))
            .union(smin.select(F.col("m").alias("u"), F.col("c").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        # exact fixed-point test: the undirected edge SET is unchanged
        changed = (
            small.exceptAll(cur).limit(1).count() + cur.exceptAll(small).limit(1).count()
        )
        cur = small
        if changed == 0:
            converged = True
            break
    # fixed point is a star forest: every (u, v) row maps leaf v -> center u
    leaves = cur.select(F.col("v").alias("id"), F.col("u").alias("component"))
    if not converged:
        import warnings

        warnings.warn(
            f"connected_components_star did not converge within max_iter={max_iter}; "
            "labels are not final (collapsed to one min-label row per id)",
            RuntimeWarning,
            stacklevel=2,
        )
        # a non-fixed-point edge set may attach a leaf to several centers;
        # collapse to the min so the one-row-per-id contract still holds
        # (a no-op shuffle only on this already-degraded path)
        leaves = leaves.groupBy("id").agg(F.min("component").alias("component"))
    return nodes.join(leaves, "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("component")
    )


def dedup_against_corpus(
    new_docs: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental exact dedup: keep only new documents whose normalized
    fingerprint appears neither in the existing corpus nor earlier (smaller
    id) within the new batch itself — the admission filter a daily ingest
    runs before appending to a 100 TB corpus.

    Plan: the corpus side reduces to a distinct-fingerprint set BEFORE the
    join (fingerprints, not documents, are the shuffled object), the
    anti-join eliminates known content, and one window elects the first
    copy within the batch. Nothing driver-side at any size."""
    corpus_fps = corpus.select(fingerprint_col(F.col(text_col)).alias("fp")).distinct()
    fresh = (
        new_docs.withColumn("fp", fingerprint_col(F.col(text_col)))
        .join(corpus_fps, "fp", "left_anti")
    )
    w = Window.partitionBy("fp").orderBy(id_col)
    return (
        fresh.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "fp")
    )
