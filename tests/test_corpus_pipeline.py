"""End-to-end corpus curation pipeline: planted junk/dup/near-dup documents
are dropped, clean documents survive, counts reconcile per stage."""

import numpy as np
import pytest

from duckpipe_spark.functions.corpus import curate_corpus


@pytest.fixture(scope="module")
def corpus_docs(spark):
    rng = np.random.default_rng(23)
    vocab = ["the", "of", "and", "to", "in"] + [f"word{i}" for i in range(80)]
    rows = []
    # 30 clean english-ish docs
    for i in range(30):
        rows.append((i, " ".join(rng.choice(vocab, size=80))))
    # exact duplicate of doc 3 (whitespace noise, same fingerprint)
    rows.append((200, "  " + rows[3][1].replace(" ", "   ") + "  "))
    # near-duplicate of doc 7: 4 of 80 words changed
    w = rows[7][1].split()
    for j in (3, 20, 40, 60):
        w[j] = f"sub{j}"
    rows.append((201, " ".join(w)))
    # junk: too short
    rows.append((202, "tiny doc"))
    # junk: sentence-punctuation soup — punct_ratio component fails
    rows.append((203, "!!! ??? ,,, ;;; ::: !!! ??? ,,, ;;; ::: !!! ??? ,,, ;;; :::"))
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_curation_drops_planted_and_keeps_clean(spark, corpus_docs):
    # quality components are thirds: 0.7 requires all three (token count in
    # range, word length in range, low sentence-punct ratio)
    report = curate_corpus(corpus_docs, min_tokens=10, min_quality=0.7, jaccard_threshold=0.5)
    kept = {r["doc_id"] for r in report.corpus.select("doc_id").collect()}

    assert 202 not in kept  # too short
    assert 203 not in kept  # quality gate
    assert 200 not in kept and 3 in kept  # exact dup loses to canonical id
    assert 201 not in kept and 7 in kept  # near dup loses to smaller id
    # every other clean doc survives
    assert {i for i in range(30)} <= kept
    # stage counts reconcile
    assert report.n_input == 34
    assert report.n_after_quality == 32  # junk gone
    assert report.n_after_exact == 31  # exact dup gone
    assert report.n_after_neardup == 30  # near dup gone


def test_curation_lazy_mode_builds_without_action(spark, corpus_docs):
    report = curate_corpus(corpus_docs, collect_counts=False)
    assert report.n_input == -1
    assert len(report.corpus.columns) == 2
