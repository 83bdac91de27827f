"""ANN index-family evaluation: recall@k and wall-clock for every
similarity-search path in the engine, on one corpus, in one run — the
measurement loop an embedding-platform owner runs before picking an index.

r12 methodology fix (VERDICT r11 item 3, diagnosed this round): the r11
table evaluated QUERY_IDS = 0..9 — ids that COINCIDE with seed-IVF's
centroid ids (``ivf_assign`` seeds cells from the smallest-id vectors).
A query that IS a centroid probes its own cell at cos 1.0, and its
neighbors (cos ≈ 0.35 on this corpus, far above the ≈ N(0, 1/8) cosine
to any other random centroid) overwhelmingly assign there too — so
seed-IVF read recall 0.99 while every honest configuration of the same
corpus reads ≈ 0.5 at a 1/4 probe fraction. The 0.99-vs-0.49 "trained
regression" the r11 table showed was entirely this artifact: per-cell
occupancy is balanced (~n/cells ± 10%) for seed AND trained quantizers,
and with queries disjoint from the seed set trained-IVF ≥ seed-IVF at
equal probe budget, exactly as quantization theory predicts. The r11
numbers are reproduced below under ``seed_coincident`` so the artifact
stays visible instead of silently vanishing.

Methodology now:
  * QUERY_IDS = 100..109 — disjoint from seed-IVF's centroid ids (0..15)
    and from the low-id region any smallest-id tie-break favors.
  * Equal probe budget MEANS equal (n_cells, n_probe): seed, trained and
    ivfpq all run 16 cells / 4 probes. (The r11 table compared seed at
    16c/4p against trained at 8c/2p — equal probed FRACTION, but a finer
    partition at the same fraction keeps neighborhoods together better,
    a second confound.)
  * Per-cell occupancy (min/median/max) is reported for the ivf rungs —
    the balance diagnostic that separates "bad quantizer" from "hard
    corpus".
  * The corpus's intrinsic difficulty is reported: mean top-k neighbor
    cosine, and the analytic sign-LSH collision probability it implies
    (Charikar model, see ``planes_for_recall``) — at neighbor cos ≈ 0.35
    a single 8-plane bucket finds a true neighbor with p^8 ≈ 2%, which
    is the measured lsh row. The sign-LSH rungs are DEDUP-BLOCKING tools
    (high-cos pairs); IVF/SQ8 are the retrieval rungs.

  brute      exact cosine, two-phase rank (the baseline everything trades)
  lsh        single sign-bucket candidates (8 planes — blocking, not retrieval)
  lsh_p4     4 planes: the recall-vs-cost knob one notch toward recall
  multiprobe lsh + all Hamming-1 neighbor buckets (recall knob #2)
  ivf        seed-centroid cells, 16c/4p
  ivf_train  k-means-TRAINED cells, 16c/4p (equal budget)
  ivfpq      IVFADC: trained-cell probe + residual-PQ ADC + exact rerank,
             16c/4p (derived covering default, plus rerank 50 and 400 —
             the shortlist-cost curve)
  sq8        global-scale int8 candidate scan + exact rerank
  pq_adc     product-quantization asymmetric distance (16 B/vec codes)
  hamming    binary sign codes, xor+popcount (16 B/vec, exact integer)

Run: PYTHONPATH=/root/repo python examples/ann_evaluation.py [sf_dir]
Prints one JSON line: per-method {recall, sec} + corpus stats + occupancy
+ the seed_coincident reproduction of the r11 artifact.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import pyspark.sql.functions as F

from duckpipe_spark.functions.similarity import (
    N_PLANES,
    brute_force_topk,
    hamming_topk,
    ivf_assign,
    ivf_topk,
    ivf_trained_topk,
    ivfpq_topk,
    kmeans_cells,
    lsh_multiprobe_topk,
    lsh_topk,
    matryoshka_topk,
    pq_adc_topk,
    sq8_topk,
    topk_recall,
)
from duckpipe_spark.session import get_spark
from duckpipe_spark.sources.tables import load_table

K = 10
QUERY_IDS = list(range(100, 110))  # disjoint from seed-centroid ids 0..15
SEED_COINCIDENT_IDS = list(range(10))  # the r11 artifact: queries ARE seeds
N_CELLS = 16
N_PROBE = 4


def _occupancy(counts: list[int]) -> dict:
    s = sorted(counts)
    return {
        "cells": len(s),
        "min": s[0] if s else 0,
        "median": s[len(s) // 2] if s else 0,
        "max": s[-1] if s else 0,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("ann-evaluation")
    emb = load_table(spark, sf_dir, "embeddings").cache()
    n = emb.count()

    exact = brute_force_topk(emb, QUERY_IDS, K)
    exact.cache().count()  # ground truth, shared by every recall join

    methods = {
        "brute": lambda: brute_force_topk(emb, QUERY_IDS, K),
        "lsh": lambda: lsh_topk(emb, QUERY_IDS, K, n_planes=N_PLANES),
        "lsh_p4": lambda: lsh_topk(emb, QUERY_IDS, K, n_planes=4),
        "multiprobe": lambda: lsh_multiprobe_topk(emb, QUERY_IDS, K, n_planes=N_PLANES),
        "ivf": lambda: ivf_topk(emb, QUERY_IDS, K, n_cells=N_CELLS, n_probe=N_PROBE),
        "ivf_train": lambda: ivf_trained_topk(
            emb, QUERY_IDS, K, n_cells=N_CELLS, n_probe=N_PROBE
        ),
        # default = derived covering rerank (r13): must read the
        # trained-cell ceiling, i.e. equal ivf_train's recall
        "ivfpq": lambda: ivfpq_topk(
            emb, QUERY_IDS, K, n_cells=N_CELLS, n_probe=N_PROBE
        ),
        # the shortlist-cost curve: the old fixed-50 default and the 400
        # width the r12 ceiling diagnosis used
        "ivfpq_rerank50": lambda: ivfpq_topk(
            emb, QUERY_IDS, K, n_cells=N_CELLS, n_probe=N_PROBE, rerank=50
        ),
        "ivfpq_rerank400": lambda: ivfpq_topk(
            emb, QUERY_IDS, K, n_cells=N_CELLS, n_probe=N_PROBE, rerank=400
        ),
        "sq8": lambda: sq8_topk(emb, QUERY_IDS, K),
        "pq_adc": lambda: pq_adc_topk(emb, QUERY_IDS, K),
        "hamming": lambda: hamming_topk(emb, QUERY_IDS, K),
        # r14: MRL prefix-dim scan — recall is governed by how much of the
        # neighbor ordering the first 16 components preserve; the rerank
        # window (32 >> k) recovers most prefix misrankings
        "matryoshka": lambda: matryoshka_topk(
            emb, QUERY_IDS, K, prefix_dim=16, rerank=32
        ),
        "matryoshka_p8": lambda: matryoshka_topk(
            emb, QUERY_IDS, K, prefix_dim=8, rerank=32
        ),
    }
    out: dict = {"metric": "ann_evaluation", "k": K, "n_vectors": int(n), "sf_dir": sf_dir}
    out["query_ids"] = [QUERY_IDS[0], QUERY_IDS[-1]]
    for name, fn in methods.items():
        fn().collect()  # warm (codegen + training lineage where applicable)
        t0 = time.perf_counter()
        approx = fn()
        rec = (
            topk_recall(exact, approx, K)
            .agg(F.avg("recall").alias("r"))
            .collect()[0]["r"]
        )
        out[name] = {"recall": round(float(rec), 3), "sec": round(time.perf_counter() - t0, 2)}

    # --- diagnostics -------------------------------------------------------
    # corpus difficulty: mean true-neighbor cosine and the sign-LSH
    # collision probability it implies (explains the lsh rows analytically)
    mean_cos = float(exact.agg(F.avg("cos")).collect()[0][0])
    p = 1.0 - math.acos(max(-1.0, min(1.0, mean_cos))) / math.pi
    out["corpus"] = {
        "mean_topk_cos": round(mean_cos, 3),
        "lsh_bit_agree_p": round(p, 3),
        "modeled_lsh8_recall": round(p**N_PLANES, 3),
        "modeled_lsh4_recall": round(p**4, 3),
    }
    # per-cell occupancy: balanced occupancy + low recall = hard corpus,
    # skewed occupancy = bad quantizer (the r11 question, answered per run)
    _, seed_assign = ivf_assign(emb, N_CELLS)
    occ_seed = [r["count"] for r in seed_assign.groupBy("cell_id").count().collect()]
    trained_assign = kmeans_cells(emb, k=N_CELLS, iters=2)
    occ_tr = [r["count"] for r in trained_assign.groupBy("cell").count().collect()]
    out["occupancy"] = {"ivf_seed": _occupancy(occ_seed), "ivf_train": _occupancy(occ_tr)}

    # --- the r11 artifact, reproduced on purpose ---------------------------
    # queries 0..9 coincide with seed-IVF's centroid ids: each query probes
    # its own cell at cos 1.0 and its neighbors mostly assign there, so
    # seed-IVF reads ~0.99 — a benchmark degeneracy, not quantizer quality.
    exact_sc = brute_force_topk(emb, SEED_COINCIDENT_IDS, K)
    exact_sc.cache().count()
    sc: dict = {}
    for name, fn in {
        "ivf": lambda: ivf_topk(
            emb, SEED_COINCIDENT_IDS, K, n_cells=N_CELLS, n_probe=N_PROBE
        ),
        "ivf_train": lambda: ivf_trained_topk(
            emb, SEED_COINCIDENT_IDS, K, n_cells=N_CELLS, n_probe=N_PROBE
        ),
    }.items():
        rec = (
            topk_recall(exact_sc, fn(), K)
            .agg(F.avg("recall").alias("r"))
            .collect()[0]["r"]
        )
        sc[name] = round(float(rec), 3)
    out["seed_coincident"] = sc
    print(json.dumps(out))


if __name__ == "__main__":
    main()
