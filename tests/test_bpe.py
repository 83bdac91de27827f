"""BPE merge learning + encoding: semantics vs a pure-Python reference
implementation, edge cases, and the encode plan shape."""

import random
import re

import pytest

from duckpipe_spark.functions.bpe import (
    SEP,
    bpe_token_counts,
    learn_bpe_merges,
)
from duckpipe_spark.plans.audit import audit_plan, no_aqe

WS = re.compile(r"[ \t\n\x0b\f\r]+")


def ref_bpe(texts, n_merges):
    """Reference BPE trainer: word-frequency dict, leftmost-first
    non-overlapping merge of every occurrence, ties (freq desc, lhs asc,
    rhs asc). Returns (merges, encode_fn)."""
    wf: dict[tuple[str, ...], int] = {}
    for t in texts:
        for w in WS.split(t.strip(" ")):
            if w and SEP not in w:
                key = tuple(w)
                wf[key] = wf.get(key, 0) + 1
    vocab = dict(wf)
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + f
        if not pairs:
            break
        (lhs, rhs), pf = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, lhs, rhs, pf))
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab

    def encode_count(text):
        n = 0
        for w in WS.split(text.strip(" ")):
            if SEP in w:
                n += len(w)
                continue
            syms = list(w)
            for _, lhs, rhs, _ in merges:
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                        out.append(lhs + rhs)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            n += len(syms)
        return n

    return merges, encode_count


def test_merges_known_corpus(spark):
    docs = spark.createDataFrame(
        [(1, "low low low"), (2, "lower lowest low"), (3, "aaa")],
        "doc_id bigint, text string",
    )
    got = [tuple(r) for r in learn_bpe_merges(docs, n_merges=5).orderBy("merge_rank").collect()]
    # hand-derived: l-o wins the 6-6 tie with o-w lexicographically; the
    # "aaa" word exercises leftmost-first non-overlap ([aa, a], count 1)
    assert got == [
        (1, "l", "o", 6),
        (2, "lo", "w", 6),
        (3, "a", "a", 2),
        (4, "low", "e", 2),
        (5, "aa", "a", 1),
    ]
    counts = {r.doc_id: r.n_bpe_tokens for r in bpe_token_counts(docs, learn_bpe_merges(docs, n_merges=5)).collect()}
    assert counts == {1: 3, 2: 6, 3: 1}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_reference_bpe(spark, seed):
    rng = random.Random(seed)
    alphabet = "abcde"
    texts = [
        " ".join(
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(0, 12))
        )
        for _ in range(40)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    want_merges, want_count = ref_bpe(texts, 6)
    m = learn_bpe_merges(docs, n_merges=6)
    got_merges = [tuple(r) for r in m.orderBy("merge_rank").collect()]
    assert got_merges == want_merges
    got_counts = {r.doc_id: r.n_bpe_tokens for r in bpe_token_counts(docs, m).collect()}
    assert got_counts == {i: want_count(t) for i, t in enumerate(texts)}


def test_edge_cases(spark):
    docs = spark.createDataFrame(
        [
            (1, ""),                      # empty text → 0 tokens
            (2, "x"),                     # single char, no pairs from it
            (3, f"a{SEP}b ab ab"),        # SEP token excluded from training,
                                          # falls back to char count at encode
        ],
        "doc_id bigint, text string",
    )
    m = learn_bpe_merges(docs, n_merges=3)
    rows = [tuple(r) for r in m.orderBy("merge_rank").collect()]
    # only "ab" (freq 2) and "x" (no pairs) train: one merge then exhaustion
    assert rows == [(1, "a", "b", 2)]
    counts = {r.doc_id: r.n_bpe_tokens for r in bpe_token_counts(docs, m).collect()}
    assert counts == {1: 0, 2: 1, 3: 3 + 1 + 1}


def test_encode_is_pure_projection(spark):
    # the chain impl is the zero-shuffle twin (toy merge counts only)
    docs = spark.createDataFrame([(1, "ab ab")], "doc_id bigint, text string")
    with no_aqe(spark):
        a = audit_plan(bpe_token_counts(docs, [("a", "b")], impl="chain"))
    assert a.exchanges == 0, a.text
    assert a.python_stages == 0
    assert a.sort_merge_joins + a.shuffle_hash_joins + a.broadcast_hash_joins == 0


def test_join_impl_is_broadcast_no_python(spark):
    # the join impl (vocab-scale path) must broadcast the word table and
    # keep every step JVM-side: no Python stages, no sort-merge join of
    # the corpus against the vocabulary
    docs = spark.createDataFrame([(1, "ab ab")], "doc_id bigint, text string")
    with no_aqe(spark):
        a = audit_plan(bpe_token_counts(docs, [("a", "b")], impl="join"))
    assert a.python_stages == 0
    assert a.sort_merge_joins == 0, a.text
    assert a.broadcast_hash_joins >= 1, a.text


def test_gopher_quality_flags_edges(spark):
    from duckpipe_spark.functions.text import gopher_quality_flags

    long_good = " ".join(["the quick brown fox jumps over lazy dogs in town"] * 6)
    docs = spark.createDataFrame(
        [
            (1, long_good),                               # 60 words, passes
            (2, "- a\n- b\n- c\nplain"),                  # 3/4 bullet lines
            (3, "end...\nnope\nalso…\n"),                 # 2/3 ellipsis ends
            (4, "## ## ##"),                              # symbol-heavy
            (5, ""),                                      # empty: no lines
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r.asDict() for r in gopher_quality_flags(docs).collect()}
    assert got[1]["rule_word_count"] and got[1]["gopher_pass"]
    assert abs(got[2]["bullet_line_frac"] - 0.75) < 1e-12
    assert got[2]["rule_bullet_lines"]  # 0.75 <= 0.9
    assert abs(got[3]["ellipsis_line_frac"] - 2 / 3) < 1e-12
    assert not got[3]["rule_ellipsis_lines"]
    assert got[4]["symbol_ratio"] > 0.1 and not got[4]["rule_symbol_ratio"]
    assert got[5]["bullet_line_frac"] == 0.0 and got[5]["ellipsis_line_frac"] == 0.0
    assert not got[5]["gopher_pass"]  # word-count floor fails


def test_gopher_is_pure_projection(spark):
    from duckpipe_spark.functions.text import gopher_quality_flags

    docs = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    with no_aqe(spark):
        a = audit_plan(gopher_quality_flags(docs))
    assert a.exchanges == 0
    assert a.python_stages == 0


def test_chunk_documents_semantics(spark):
    from duckpipe_spark.functions.text import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(str(i) for i in range(10))),  # 10 tokens
            (2, "a b"),                                # single short chunk
            (3, ""),                                   # no chunks
        ],
        "doc_id bigint, text string",
    )
    rows = sorted(
        (r.doc_id, r.chunk_idx, r.start_token, r.n_chunk_tokens, r.chunk_text)
        for r in chunk_documents(docs, max_tokens=4, stride=3).collect()
    )
    assert rows == [
        (1, 0, 0, 4, "0 1 2 3"),
        (1, 1, 3, 4, "3 4 5 6"),
        (1, 2, 6, 4, "6 7 8 9"),
        (1, 3, 9, 1, "9"),
        (2, 0, 0, 2, "a b"),
    ]
    with pytest.raises(ValueError):
        chunk_documents(docs, max_tokens=2, stride=3)
    with pytest.raises(ValueError):
        chunk_documents(docs, max_tokens=4, stride=0)


def test_chunk_documents_is_shuffle_free(spark):
    from duckpipe_spark.functions.text import chunk_documents

    docs = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    with no_aqe(spark):
        a = audit_plan(chunk_documents(docs))
    assert a.exchanges == 0
    assert a.python_stages == 0


def test_bpe_encode_ids_vocab_and_oov(spark):
    from duckpipe_spark.functions.bpe import bpe_encode_ids, bpe_vocab_ids

    docs = spark.createDataFrame(
        [(1, "ab ab b"), (2, f"a{SEP}c")], "doc_id bigint, text string"
    )
    # training sees only clean words {ab, b}: alphabet {a:1, b:2};
    # merge 1 = (a,b) -> "ab" gets id 3
    merges = [("a", "b")]
    vocab = bpe_vocab_ids(docs, merges)
    assert vocab == {"a": 1, "b": 2, "ab": 3}
    rows = sorted(
        (r.doc_id, r.pos, r.token_id) for r in bpe_encode_ids(docs, merges, vocab=vocab).collect()
    )
    # doc1: [ab, ab, b] -> [3, 3, 2]; doc2's SEP token falls back to its
    # chars [a, SEP, c]: a=1, SEP and c unseen -> OOV 0
    assert rows == [(1, 0, 3), (1, 1, 3), (1, 2, 2), (2, 0, 1), (2, 1, 0), (2, 2, 0)]


def test_bpe_vocab_merge_collision_first_id_wins(spark):
    from duckpipe_spark.functions.bpe import bpe_vocab_ids

    docs = spark.createDataFrame([(1, "abc abc")], "doc_id bigint, text string")
    # two merge rounds producing the same surface string "abc"
    vocab = bpe_vocab_ids(docs, [("a", "bc"), ("ab", "c")])
    assert vocab["abc"] == 3 + 1  # alphabet {a,b,c} then FIRST merge's id


def test_bpe_encode_ids_is_shuffle_free(spark):
    # the chain impl keeps the zero-shuffle projection shape (toy vocabs);
    # the join impl trades one doc-key window shuffle for merge-count
    # flatness — its plan shape is pinned separately below
    from duckpipe_spark.functions.bpe import bpe_encode_ids

    docs = spark.createDataFrame([(1, "ab ab")], "doc_id bigint, text string")
    with no_aqe(spark):
        a = audit_plan(
            bpe_encode_ids(
                docs, [("a", "b")], vocab={"a": 1, "b": 2, "ab": 3}, impl="chain"
            )
        )
    assert a.exchanges == 0, a.text
    assert a.python_stages == 0
    assert a.sort_merge_joins + a.shuffle_hash_joins + a.broadcast_hash_joins == 0


def test_bpe_encode_ids_join_impl_plan(spark):
    # join impl: word table rides in as a broadcast; corpus side never
    # sort-merge-joins and never enters Python
    from duckpipe_spark.functions.bpe import bpe_encode_ids

    docs = spark.createDataFrame([(1, "ab ab")], "doc_id bigint, text string")
    with no_aqe(spark):
        a = audit_plan(
            bpe_encode_ids(
                docs, [("a", "b")], vocab={"a": 1, "b": 2, "ab": 3}, impl="join"
            )
        )
    assert a.python_stages == 0
    assert a.sort_merge_joins == 0, a.text
    assert a.broadcast_hash_joins >= 1, a.text


def test_feature_hash_embed_semantics(spark):
    from duckpipe_spark.functions.bpe import SEP  # noqa: F401
    from duckpipe_spark.functions.dedup import POLY_BASE, POLY_MOD
    from duckpipe_spark.functions.text import feature_hash_embed

    def whash(w):
        h = 0
        for ch in w:
            h = (h * POLY_BASE + ord(ch)) % POLY_MOD
        return h

    docs = spark.createDataFrame(
        [(1, "cat cat dog"), (2, "")], "doc_id bigint, text string"
    )
    dim = 8
    got = {(r.doc_id, r.j): r.v for r in feature_hash_embed(docs, dim=dim).collect()}
    hc, hd = whash("cat"), whash("dog")
    want = {}
    for w, cnt in [("cat", 2), ("dog", 1)]:
        h = whash(w)
        key = (1, h % dim)
        want[key] = want.get(key, 0) + (1 - 2 * ((h // dim) % 2)) * cnt
    assert got == want  # doc 2 (empty) emits nothing
    with pytest.raises(ValueError):
        feature_hash_embed(docs, dim=0)


# --- round-8: vocabulary-scalable encode + batched merge rounds -------------


def _seeded_docs(spark, seed, n_docs=30):
    rng = random.Random(seed)
    alphabet = "abcdef"
    texts = [
        " ".join(
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(0, 10))
        )
        for _ in range(n_docs)
    ]
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_join_impl_matches_chain(spark, seed):
    """impl='join' (word-table broadcast join) and impl='chain' (per-token
    replace chain) are bit-identical — counts AND id sequences — including
    the '' / SEP-token fallback paths."""
    from duckpipe_spark.functions.bpe import bpe_encode_ids

    docs = _seeded_docs(spark, seed).union(
        spark.createDataFrame(
            [(1000, ""), (1001, f"a{SEP}b ab"), (1002, "   ")],
            "doc_id bigint, text string",
        )
    )
    m = learn_bpe_merges(docs, n_merges=6)
    ml = [(r.lhs, r.rhs) for r in m.orderBy("merge_rank").collect()]
    c_chain = sorted(map(tuple, bpe_token_counts(docs, ml, impl="chain").collect()))
    c_join = sorted(map(tuple, bpe_token_counts(docs, ml, impl="join").collect()))
    assert c_chain == c_join
    e_chain = sorted(map(tuple, bpe_encode_ids(docs, ml, impl="chain").collect()))
    e_join = sorted(map(tuple, bpe_encode_ids(docs, ml, impl="join").collect()))
    assert e_chain == e_join


def test_word_table_chunked_fold_matches_single_chunk(spark):
    """fold_every chunking (+localCheckpoint lineage cuts) is a pure
    execution detail: tiny chunks and one big chunk give the same table."""
    from duckpipe_spark.functions.bpe import bpe_word_symbols_table

    docs = _seeded_docs(spark, 7)
    ml = [
        (r.lhs, r.rhs)
        for r in learn_bpe_merges(docs, n_merges=10).orderBy("merge_rank").collect()
    ]
    small = sorted(map(tuple, bpe_word_symbols_table(docs, ml, fold_every=3).collect()))
    big = sorted(map(tuple, bpe_word_symbols_table(docs, ml, fold_every=1000).collect()))
    assert small == big and len(small) > 0


def test_select_noninteracting_rule():
    from duckpipe_spark.functions.bpe import _select_noninteracting

    cands = [
        ("a", "b", 10),  # rank 1: always compatible
        ("b", "c", 9),   # shares 'b' with rank 1 -> rejected
        ("d", "e", 8),   # compatible
        ("x", "a", 7),   # shares 'a' with rank 1 -> rejected
        ("f", "g", 6),   # compatible (third ok row)
        ("h", "i", 5),   # compatible but beyond k=3
    ]
    assert _select_noninteracting(cands, 3) == [
        ("a", "b", 10),
        ("d", "e", 8),
        ("f", "g", 6),
    ]
    assert _select_noninteracting(cands, 2) == [("a", "b", 10), ("d", "e", 8)]
    assert _select_noninteracting([], 3) == []


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_batched_k1_equals_sequential(spark, seed):
    """k_per_round=1, cand_m=1 degenerates the batched trainer to the
    sequential one exactly (ranks, pairs AND pair frequencies)."""
    from duckpipe_spark.functions.bpe import learn_bpe_merges_batched

    docs = _seeded_docs(spark, seed)
    seq = [
        (r.merge_rank, r.lhs, r.rhs, r.pair_freq)
        for r in learn_bpe_merges(docs, n_merges=6).orderBy("merge_rank").collect()
    ]
    bat = [
        (r.merge_rank, r.lhs, r.rhs, r.pair_freq)
        for r in learn_bpe_merges_batched(docs, n_merges=6, k_per_round=1, cand_m=1)
        .orderBy("merge_rank")
        .collect()
    ]
    assert bat == seq
    # and with k=1 every round carries exactly one merge
    rounds = [
        r.round
        for r in learn_bpe_merges_batched(docs, n_merges=6, k_per_round=1, cand_m=1)
        .orderBy("merge_rank")
        .collect()
    ]
    assert rounds == list(range(1, len(rounds) + 1))


def test_batched_amortizes_rounds_and_encodes_consistently(spark):
    """k>1 accepts multiple non-interacting merges per round (rounds/merge
    < 1) and the result is a valid merge table: both encode impls agree
    under it, and accepted pairs within a round share no symbol."""
    from duckpipe_spark.functions.bpe import learn_bpe_merges_batched

    docs = _seeded_docs(spark, 11, n_docs=60)
    b = learn_bpe_merges_batched(docs, n_merges=10, k_per_round=4, cand_m=8)
    rows = [(r.merge_rank, r.round, r.lhs, r.rhs) for r in b.orderBy("merge_rank").collect()]
    assert len(rows) == 10
    n_rounds = max(r[1] for r in rows)
    assert n_rounds < 10, f"no amortization: {n_rounds} rounds for 10 merges"
    by_round: dict[int, list[tuple[str, str]]] = {}
    for _, rnd, lhs, rhs in rows:
        by_round.setdefault(rnd, []).append((lhs, rhs))
    for rnd, pairs in by_round.items():
        for i, (l1, r1) in enumerate(pairs):
            for l2, r2 in pairs[i + 1 :]:
                assert not ({l1, r1} & {l2, r2}), f"round {rnd} interacting: {pairs}"
    ml = [(lhs, rhs) for _, _, lhs, rhs in rows]
    c1 = sorted(map(tuple, bpe_token_counts(docs, ml, impl="chain").collect()))
    c2 = sorted(map(tuple, bpe_token_counts(docs, ml, impl="join").collect()))
    assert c1 == c2


def test_decode_round_trips_every_document(spark):
    """decode(encode(x)) re-concatenates (ordered by position) to the
    whitespace-stripped text for EVERY document — all-true, not just
    engine-agreement (the oracle gate would also pass on a consistent
    failure)."""
    from duckpipe_spark.functions.bpe import (
        bpe_decode_ids,
        bpe_encode_ids,
        bpe_vocab_ids,
        learn_bpe_merges,
    )

    docs = _seeded_docs(spark, 5, n_docs=40)
    merges = learn_bpe_merges(docs, n_merges=6)
    vocab = bpe_vocab_ids(docs, merges)
    dec = bpe_decode_ids(bpe_encode_ids(docs, merges, vocab=vocab), vocab)
    got = {}
    for r in dec.collect():
        got.setdefault(r.doc_id, []).append((r.pos, r.sym))
    orig = {r.doc_id: "".join(r.text.split()) for r in docs.collect()}
    assert set(got) == {d for d, t in orig.items() if t}
    for doc_id, syms in got.items():
        decoded = "".join(s for _, s in sorted(syms))
        assert decoded == orig[doc_id], doc_id


def test_decode_oov_id_is_null(spark):
    from duckpipe_spark.functions.bpe import bpe_decode_ids

    enc = spark.createDataFrame(
        [(1, 0, 0), (1, 1, 1)], "doc_id bigint, pos bigint, token_id bigint"
    )
    out = {r.pos: r.sym for r in bpe_decode_ids(enc, {"a": 1}).collect()}
    assert out[0] is None and out[1] == "a"


def test_maxmatch_matches_python_reference(spark):
    from duckpipe_spark.functions.bpe import (
        bpe_vocab_ids,
        learn_bpe_merges,
        maxmatch_word_ids_table,
    )

    docs = _seeded_docs(spark, 7, n_docs=40)
    merges = learn_bpe_merges(docs, n_merges=6)
    vocab = bpe_vocab_ids(docs, merges)
    msl = max(len(s) for s in vocab)

    def ref(w):
        out, p = [], 0
        while p < len(w):
            for L in range(min(msl, len(w) - p), 0, -1):
                if w[p:p + L] in vocab:
                    out.append(vocab[w[p:p + L]])
                    p += L
                    break
            else:
                out.append(0)
                p += 1
        return out

    wt = {r.w: list(r.ids) for r in maxmatch_word_ids_table(docs, vocab).collect()}
    assert wt and all(wt[w] == ref(w) for w in wt)


def test_maxmatch_diverges_from_bpe_replay_when_longer_symbol_shadows(spark):
    """vocab {a,b,c,bc,ab} from merges [(b,c),(a,b)]: BPE replay on 'abc'
    applies (b,c) first -> [a, bc]; greedy longest-match takes 'ab'
    -> [ab, c]. The two inference disciplines are genuinely different."""
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.bpe import (
        bpe_symbols_of_token_col,
        maxmatch_encode_ids,
    )

    vocab = {"a": 1, "b": 2, "c": 3, "bc": 4, "ab": 5}
    docs = spark.createDataFrame([(1, "abc")], "doc_id bigint, text string")
    mm = [r.token_id for r in maxmatch_encode_ids(docs, vocab).orderBy("pos").collect()]
    assert mm == [5, 3]  # ab, c
    bpe_syms = docs.select(
        bpe_symbols_of_token_col(F.lit("abc"), [("b", "c"), ("a", "b")]).alias("s")
    ).collect()[0]["s"]
    assert list(bpe_syms) == ["a", "bc"]


def test_select_noninteracting_rejects_product_collisions():
    """A pair sharing no raw symbol still interacts when one's PRODUCT is
    the other's symbol: ('xy','z') manufactures 'xyz' symbols that
    ('xyz','w')'s pattern would consume mid-round (stale pair_freq,
    non-commuting replaces)."""
    from duckpipe_spark.functions.bpe import _select_noninteracting

    cands = [("xy", "z", 10), ("xyz", "w", 9), ("p", "q", 8)]
    sel = _select_noninteracting(cands, 3)
    assert ("xyz", "w", 9) not in sel
    assert sel == [("xy", "z", 10), ("p", "q", 8)]
    # symmetric direction: higher-ranked symbol == lower-ranked product
    cands2 = [("ab", "c", 10), ("a", "bc", 9)]  # products both 'abc'
    assert _select_noninteracting(cands2, 2) == [("ab", "c", 10)]


def test_trained_merges_artifact_equals_fresh_training(spark):
    """VERDICT r8 item 2: the session-scoped merge-table artifact
    (queries/bpe_q.trained_merges) must be row-identical to a fresh
    learn_bpe_merges run on the same corpus (the trainer is deterministic,
    so memoized rows == retrained rows), and the second call must hit the
    memo (key present, list object reused)."""
    from duckpipe_spark.functions.bpe import learn_bpe_merges
    from duckpipe_spark.queries.bpe_q import _MERGES_MEMO, _memo_key, trained_merges
    from tests.conftest import SF_SMOKE

    from duckpipe_spark.sources.tables import load_table

    key = _memo_key(spark, SF_SMOKE, 8)
    _MERGES_MEMO.pop(key, None)
    a = trained_merges(spark, SF_SMOKE, 8)
    assert key in _MERGES_MEMO
    memo_obj = _MERGES_MEMO[key]
    b = trained_merges(spark, SF_SMOKE, 8)
    assert _MERGES_MEMO[key] is memo_obj, "second call must reuse the memo"
    fresh = learn_bpe_merges(load_table(spark, SF_SMOKE, "documents"), n_merges=8)
    rows = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    assert rows(a) == rows(b) == rows(fresh)


def test_bytefallback_encodes_unseen_chars_losslessly(spark):
    """Byte-fallback contract: a vocab trained WITHOUT '§'/'ß' encodes
    them as UTF-8 byte ids (value+1, ids <= 256), known symbols shift by
    256, and NOTHING maps to OOV 0 — the id stream is lossless. Byte ids
    decode back to the exact characters."""
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.bpe import (
        bpe_encode_ids_bytes,
        bpe_vocab_ids_bytes,
        learn_bpe_merges,
    )

    train = spark.createDataFrame([(1, "ab ab cd")], "doc_id bigint, text string")
    merges = learn_bpe_merges(train, n_merges=2)
    vocab = bpe_vocab_ids_bytes(train, merges)
    assert min(vocab.values()) == 257, "alphabet must start after the byte block"
    docs = spark.createDataFrame(
        [(1, "ab ab cd"), (2, "ab x§ß")], "doc_id bigint, text string"
    )
    out = bpe_encode_ids_bytes(docs, merges, vocab=vocab).orderBy("doc_id", "pos").collect()
    assert all(r.token_id != 0 for r in out)
    ids2 = [r.token_id for r in out if r.doc_id == 2]
    # 'ab' -> merged symbol id; 'x' unseen ASCII -> 121; '§' -> C2 A7 ->
    # (195, 168); 'ß' -> C3 9F -> (196, 160)
    assert ids2 == [vocab["ab"], 121, 195, 168, 196, 160], ids2
    # byte ids invert: bytes((id-1) for byte ids) decodes to the chars
    assert bytes([194, 167]).decode() == "§" and bytes([195, 159]).decode() == "ß"


def test_tokenizer_artifact_round_trip(spark, tmp_path):
    """save_tokenizer/load_tokenizer: the persisted artifact reproduces
    the exact merge order and vocab ids, and an encode through the loaded
    artifact is bit-identical to one through the in-session objects."""
    from duckpipe_spark.functions.bpe import (
        bpe_encode_ids,
        bpe_vocab_ids,
        learn_bpe_merges,
        load_tokenizer,
        save_tokenizer,
    )

    docs = spark.createDataFrame(
        [(1, "ab ab cd ab"), (2, "cd cd ab")], "doc_id bigint, text string"
    )
    merges = learn_bpe_merges(docs, n_merges=3)
    vocab = bpe_vocab_ids(docs, merges)
    p = str(tmp_path / "tok")
    save_tokenizer(merges, vocab, p)
    m2, v2 = load_tokenizer(spark, p)
    assert m2 == [(r.lhs, r.rhs) for r in merges.orderBy("merge_rank").collect()]
    assert v2 == vocab
    a = sorted(tuple(r) for r in bpe_encode_ids(docs, merges, vocab=vocab).collect())
    b = sorted(tuple(r) for r in bpe_encode_ids(docs, m2, vocab=v2).collect())
    assert a == b


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_driver_fastpath_equals_distributed(spark, seed):
    """Optimization r15: the bounded driver fast path (word table collected
    once, rounds in Python) and the distributed per-round loop
    (driver_cap=0 forces it) produce IDENTICAL merge tables — ranks,
    rounds, pairs and exact pair frequencies — for both trainers."""
    from duckpipe_spark.functions.bpe import learn_bpe_merges_batched

    docs = _seeded_docs(spark, seed, n_docs=50)
    fast = [
        tuple(r)
        for r in learn_bpe_merges_batched(docs, n_merges=9, k_per_round=3, cand_m=6)
        .orderBy("merge_rank")
        .collect()
    ]
    dist = [
        tuple(r)
        for r in learn_bpe_merges_batched(
            docs, n_merges=9, k_per_round=3, cand_m=6, driver_cap=0
        )
        .orderBy("merge_rank")
        .collect()
    ]
    assert fast == dist and len(fast) > 0
    seq_fast = [
        tuple(r)
        for r in learn_bpe_merges(docs, n_merges=7).orderBy("merge_rank").collect()
    ]
    seq_dist = [
        tuple(r)
        for r in learn_bpe_merges(docs, n_merges=7, driver_cap=0)
        .orderBy("merge_rank")
        .collect()
    ]
    assert seq_fast == seq_dist and len(seq_fast) > 0


def test_driver_fastpath_cap_shrinks_with_merge_count():
    """The fast-path row cap honors both the row bound and the
    (rows x n_merges) work budget, so huge-vocabulary trainings route to
    the distributed loop."""
    from duckpipe_spark.functions.bpe import (
        _DRIVER_WORDS_CAP,
        _DRIVER_WORK_BUDGET,
        _driver_cap,
    )

    assert _driver_cap(12, None) == _DRIVER_WORDS_CAP
    assert _driver_cap(32768, None) == _DRIVER_WORK_BUDGET // 32768
    assert _driver_cap(12, 0) == 0  # explicit override forces distributed


@pytest.mark.parametrize("seed", [0, 1])
def test_feature_hash_embed_arrow_matches_hof(spark, seed):
    """Optimization r15: the mapInPandas kernel (memoized word hash,
    per-batch pre-aggregation) and the all-JVM explode+fold twin are
    bit-identical — including NULL/empty/whitespace texts and a non-64
    dim whose sign bit exercises the (wh // dim) parity path."""
    from duckpipe_spark.functions.text import feature_hash_embed

    docs = _seeded_docs(spark, seed, n_docs=40).union(
        spark.createDataFrame(
            [(900, None), (901, ""), (902, "   "), (903, "cat  cat\tdog")],
            "doc_id bigint, text string",
        )
    )
    for dim in (64, 5):
        a = sorted(map(tuple, feature_hash_embed(docs, dim=dim, impl="arrow").collect()))
        h = sorted(map(tuple, feature_hash_embed(docs, dim=dim, impl="hof").collect()))
        assert a == h and len(a) > 0
