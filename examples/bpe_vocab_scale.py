"""BPE vocabulary-size scaling measurement (VERDICT r7 items 2+3 —
BASELINE §18): encode cost must be FLAT in merge count, and batched
training must amortize the per-round job floor.

The driver testdata's documents vocabulary is tiny (31 distinct words at
sf0.1 — max 107 merges), so this builds a deterministic wide-vocabulary
corpus in-session: 4,096 distinct synthetic words (length 6-10 over a
20-char alphabet, seeded PRNG riding in as an array literal), 100k docs
of 40 words each chosen by a hash of the row id — fully reproducible,
fully JVM-side generation.

Measures:
  * batched trainer: wall + Spark ROUNDS to learn 1,024 merges with
    k_per_round=32 vs the sequential trainer's 1,024 rounds (not run —
    extrapolated from its measured per-round floor at n=32).
  * encode (bpe_token_counts + bpe_encode_ids, impl='join'): wall at
    n_merges in {8, 64, 1024} — the flat-cost claim.
  * encode impl='chain' at {8, 64} — the O(n_merges) expression-depth
    path this round retired from the default (1,024 would stall Catalyst
    analysis; that cliff is the point).

Run: PYTHONPATH=/root/repo python examples/bpe_vocab_scale.py
     PYTHONPATH=/root/repo python examples/bpe_vocab_scale.py --big
       (r9 / VERDICT r8 item 3: 4,096-merge batched training at
        k_per_round=256 — s/merge and rounds/merge as the pair table
        thins; skips the encode sweeps)
"""

from __future__ import annotations

import json
import random
import sys
import time

import pyspark.sql.functions as F

from duckpipe_spark.functions.bpe import (
    bpe_encode_ids,
    bpe_token_counts,
    learn_bpe_merges,
    learn_bpe_merges_batched,
)
from duckpipe_spark.session import get_spark

N_WORDS = 4096
N_DOCS = 100_000
WORDS_PER_DOC = 40


def synth_docs(spark):
    rng = random.Random(8)
    alphabet = "abcdefghijklmnopqrst"
    words = sorted(
        {
            "".join(rng.choice(alphabet) for _ in range(rng.randint(6, 10)))
            for _ in range(N_WORDS)
        }
    )
    wl = F.array(*[F.lit(w) for w in words])
    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(WORDS_PER_DOC)),
            lambda i: F.element_at(
                wl, (F.pmod(F.hash(F.col("id") * WORDS_PER_DOC + i), F.lit(len(words))) + 1).cast("int")
            ),
        ),
    )
    return spark.range(N_DOCS).select(F.col("id").alias("doc_id"), text.alias("text"))


def main_big(n_merges: int = 4096) -> None:
    """4,096-merge batched training (k=256): the rounds/merge trend at a
    REAL vocabulary size. Early rounds accept few merges (top candidates
    share single-char symbols, and the non-interacting rule is
    conservative); as symbols lengthen and the pair table thins,
    acceptance per round climbs — the claim to measure is that total
    rounds stay ≪ total merges end-to-end. ``--merges=8192`` (VERDICT r9
    item 4) extends the sweep past the §22.2 point to confirm
    rounds/merge keeps falling as the vocabulary grows."""
    spark = get_spark("bpe-vocab-scale-big")
    docs = synth_docs(spark).persist()
    print(f"# corpus: {docs.count()} docs, {N_WORDS} distinct words")
    out: dict = {"metric": "bpe_vocab_scale_big", "unit": "sec"}
    t0 = time.perf_counter()
    bat = learn_bpe_merges_batched(docs, n_merges=n_merges, k_per_round=256, cand_m=512)
    rows = bat.orderBy("merge_rank").collect()
    wall = time.perf_counter() - t0
    n_rounds = max(r.round for r in rows)
    out[f"train_batched_{n_merges}"] = round(wall, 2)
    out["batched_merges"] = len(rows)
    out["batched_rounds"] = int(n_rounds)
    out["rounds_per_merge"] = round(n_rounds / len(rows), 4)
    out["s_per_merge"] = round(wall / len(rows), 4)
    # acceptance trend: merges accepted in the first / last 10% of rounds
    by_round: dict[int, int] = {}
    for r in rows:
        by_round[r.round] = by_round.get(r.round, 0) + 1
    decile = max(1, n_rounds // 10)
    out["accepts_first_decile_rounds"] = sum(
        c for rd, c in by_round.items() if rd <= decile
    )
    out["accepts_last_decile_rounds"] = sum(
        c for rd, c in by_round.items() if rd > n_rounds - decile
    )
    print(json.dumps(out))


def main() -> None:
    spark = get_spark("bpe-vocab-scale")
    docs = synth_docs(spark).persist()
    print(f"# corpus: {docs.count()} docs, {N_WORDS} distinct words")

    out: dict = {"metric": "bpe_vocab_scale", "unit": "sec"}

    # --- training ---------------------------------------------------------
    t0 = time.perf_counter()
    seq32 = learn_bpe_merges(docs, n_merges=32)
    n_seq = seq32.count()
    seq32_s = time.perf_counter() - t0
    out["train_seq_32"] = round(seq32_s, 2)
    out["seq_per_merge_s"] = round(seq32_s / n_seq, 3)

    t0 = time.perf_counter()
    bat = learn_bpe_merges_batched(docs, n_merges=1024, k_per_round=32, cand_m=64)
    rows = bat.orderBy("merge_rank").collect()
    out["train_batched_1024"] = round(time.perf_counter() - t0, 2)
    n_rounds = max(r.round for r in rows)
    out["batched_merges"] = len(rows)
    out["batched_rounds"] = int(n_rounds)
    out["rounds_per_merge"] = round(n_rounds / len(rows), 3)
    merges = [(r.lhs, r.rhs) for r in rows]
    print(f"# batched: {len(rows)} merges in {n_rounds} rounds")

    # --- encode: flat in merge count (join impl) ---------------------------
    for n in (8, 64, 1024):
        m = merges[:n]
        t0 = time.perf_counter()
        bpe_token_counts(docs, m, impl="join").agg(F.sum("n_bpe_tokens")).collect()
        out[f"counts_join_{n}"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        bpe_encode_ids(docs, m, impl="join").agg(F.sum("token_id")).collect()
        out[f"encode_join_{n}"] = round(time.perf_counter() - t0, 2)

    # --- encode: the chain impl's merge-count wall --------------------------
    for n in (8, 64):
        m = merges[:n]
        t0 = time.perf_counter()
        bpe_token_counts(docs, m, impl="chain").agg(F.sum("n_bpe_tokens")).collect()
        out[f"counts_chain_{n}"] = round(time.perf_counter() - t0, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    if "--big" in sys.argv:
        n = 4096
        for a in sys.argv[1:]:
            if a.startswith("--merges="):
                n = int(a.split("=", 1)[1])
        main_big(n)
    else:
        main()
