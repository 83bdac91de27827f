"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Since round 6 the same line also carries the DuckDB oracle side-by-side
(VERDICT r5 item 3): "duckdb": {name: sec}, "ratio": {name: spark/duckdb},
"duckdb_total", "ratio_total" — both engines timed with the identical
warm-once/time-second protocol on the same parquet, so the within-2x bar
is checkable from the artifact alone. Set SPARK_GRAFT_BENCH_NO_ORACLE=1
to skip the DuckDB pass during quick local iteration.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # relational core
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "first_order_per_customer",
    "segment_year_pivot",
    "custkey_status_skeleton",
    "orders_rollup",
    # spatial operator family (proxy + real pipeline)
    "nearest_feature_distance",
    "features_within_radius",
    "geo_nearest_distance_pipeline",
    "geo_buffer_clip_pipeline",
    # events / sessionization
    "events_hourly_rollup",
    "sessionize_users",
    "events_session_window",
    # text / dedup / similarity
    "doc_token_stats",
    "doc_minhash_signatures",
    "doc_lsh_candidates",
    "doc_simhash",
    "embedding_cosine_topk",
    "embedding_lsh_topk",
    # round-3 additions: span-level dedup + curation rollup + stats scan
    "doc_span_dedup",
    "doc_source_rollup",
    "lineitem_column_stats",
]


def oracle_main() -> None:
    """`bench.py --oracle`: time the DuckDB oracle twins at the same SF —
    the reference point for the within-2x-of-DuckDB target (BASELINE.md)."""
    import duckdb

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    from duckpipe_spark.queries import REGISTRY
    from duckpipe_spark.sources.tables import TABLE_NAMES

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    names = [n for n in HEADLINE if n in REGISTRY]
    names += [n for n in REGISTRY if n not in names and REGISTRY[n].bench]
    timings: dict[str, float] = {}
    for name in names:
        q = REGISTRY[name].oracle
        if q is None:
            continue
        con.execute(q).fetchall()  # warm
        t0 = time.perf_counter()
        con.execute(q).fetchall()
        timings[name] = round(time.perf_counter() - t0, 3)
    print(
        json.dumps(
            {
                "metric": "duckdb_oracle_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def _box_load() -> dict:
    """Noise-condition snapshot recorded in the bench artifact (VERDICT r6
    item 5): a +15% uniform drift across untouched queries reads as box
    load, not regression — but only if the artifact says what the box was
    doing. loadavg_1m is sampled BEFORE Spark starts; leftover_jvms counts
    java processes already running (other sessions' executors inflate
    every wall-clock uniformly)."""
    info: dict = {}
    try:
        info["loadavg_1m"] = round(os.getloadavg()[0], 2)
    except OSError:  # pragma: no cover - platform without getloadavg
        pass
    try:
        import subprocess

        n = subprocess.run(
            ["pgrep", "-c", "java"], capture_output=True, text=True, timeout=5
        ).stdout.strip()
        info["leftover_jvms"] = int(n) if n else 0
    except Exception:  # pragma: no cover - diagnostic best-effort
        pass
    return info


def _quiet_wait() -> dict:
    """VERDICT r11 item 2: BENCH_r11's driver artifact ran at loadavg 5.94
    and read ratio_total 1.259 while the defended quiet-box protocol read
    0.87 — a contaminated number must never masquerade as the defended one.
    After the JVM sweep, spin (bounded) until the 1-minute loadavg drops
    under the quiet threshold; record the loadavg BEFORE and AFTER the wait
    plus the seconds spent, and if the box never quiets return
    ``degraded=True`` so the artifact itself says its numbers are
    contention-contaminated. SPARK_GRAFT_BENCH_NO_WAIT=1 skips the wait
    (quick local iteration); SPARK_GRAFT_BENCH_QUIET_WAIT_S caps it
    (default 300); SPARK_GRAFT_BENCH_QUIET_LOAD sets the threshold
    (default 0.95)."""
    info: dict = {}
    try:
        # default 0.95, not 1.0: the wait exits strictly below the
        # threshold, but the post-wait snapshot resamples a moment later
        # and can tick back up — a margin keeps the RECORDED loadavg_1m
        # under the "< 1" defended-protocol bar it is judged against
        threshold = float(os.environ.get("SPARK_GRAFT_BENCH_QUIET_LOAD", "0.95"))
        cap = float(os.environ.get("SPARK_GRAFT_BENCH_QUIET_WAIT_S", "300"))
        load0 = os.getloadavg()[0]
        info["loadavg_pre_wait"] = round(load0, 2)
        if os.environ.get("SPARK_GRAFT_BENCH_NO_WAIT"):
            info["degraded"] = load0 >= threshold
            return info
        t0 = time.perf_counter()
        load = load0
        while load >= threshold and time.perf_counter() - t0 < cap:
            time.sleep(5.0)
            load = os.getloadavg()[0]
        waited = time.perf_counter() - t0
        if waited >= 1.0:
            info["quiet_wait_s"] = round(waited, 1)
            print(
                f"# quiet-wait: loadavg {load0:.2f} -> {load:.2f} "
                f"after {waited:.0f}s",
                file=sys.stderr,
            )
        info["degraded"] = load >= threshold
        if info["degraded"]:
            print(
                f"# WARNING: box never quieted (loadavg {load:.2f} >= "
                f"{threshold} after {cap:.0f}s) — artifact marked degraded",
                file=sys.stderr,
            )
    except OSError:  # pragma: no cover - platform without getloadavg
        pass
    return info


def _sweep_leftover_jvms() -> None:
    """VERDICT r9 item 8 + r10 item 5 + ADVICE r10 item 4: leftover
    SparkSubmit JVMs from earlier runs inflate every bench wall-clock
    (BENCH_r09 read 0.827 vs 0.631 quiet; BENCH_r10 still carried one
    foreign JVM). Sweep rule, in order of evidence strength:

    * **Orphaned JVMs (ppid == 1) are killed regardless of cwd.** A
      SparkSubmit whose launching python/bash has exited is a leftover by
      definition — nobody is waiting on its result — and orphanhood is
      exactly how leftovers present (the gateway JVM outliving its driver
      process gets reparented to init). This is what catches the
      foreign-checkout stragglers r10's cwd-scoped sweep missed.
    * **JVMs with a live parent are NEVER killed by default** — a live
      parent means a run in progress (a concurrent pytest/bench from this
      same directory included, the ADVICE r10 scenario), so killing on
      cwd alone would murder legitimate work. They are counted and
      reported loudly instead; set SPARK_GRAFT_BENCH_SWEEP_LIVE=1 to
      opt IN to killing live-parent JVMs cwd-scoped to this checkout
      (for a driver box known to run nothing else).
    * **Age filter (ADVICE r11 carried):** even with the opt-in, a JVM
      younger than 15 min is presumed a CONCURRENT legitimate run from
      this checkout and is never killed; orphans younger than 30 s are
      skipped too (reparenting races at parent exit).

    SPARK_GRAFT_BENCH_NO_SWEEP=1 opts out entirely."""
    if os.environ.get("SPARK_GRAFT_BENCH_NO_SWEEP"):
        return
    try:
        import signal
        import subprocess

        repo = os.path.dirname(os.path.abspath(__file__))
        kill_live = bool(os.environ.get("SPARK_GRAFT_BENCH_SWEEP_LIVE"))
        pids = subprocess.run(
            ["pgrep", "-f", "org.apache.spark.deploy.SparkSubmit"],
            capture_output=True,
            text=True,
            timeout=10,
        ).stdout.split()
        try:
            with open("/proc/uptime") as f:
                uptime = float(f.read().split()[0])
            hz = os.sysconf("SC_CLK_TCK")
        except (OSError, ValueError):
            uptime, hz = None, 100
        killed, live = 0, []
        for pid in pids:
            try:
                with open(f"/proc/{pid}/stat") as f:
                    # field 4 (1-based) is ppid; comm (field 2) may contain
                    # spaces but never ')', so split after the last ')'
                    rest = f.read().rsplit(")", 1)[1].split()
                ppid = int(rest[1])
                # stat field 22 (1-based) = starttime in clock ticks;
                # after the ')' split, rest[0] is field 3 so idx 19
                age_s = uptime - int(rest[19]) / hz if uptime else None
                try:
                    cwd = os.readlink(f"/proc/{pid}/cwd")
                except OSError:
                    cwd = "?"
                if ppid == 1 and (age_s is None or age_s > 30.0):
                    # orphaned leftover — safe to reap anywhere (age floor
                    # guards the parent-exit reparenting race)
                    os.kill(int(pid), signal.SIGTERM)
                    killed += 1
                elif cwd == repo and kill_live and age_s is not None and age_s > 900.0:
                    os.kill(int(pid), signal.SIGTERM)
                    killed += 1
                else:
                    if cwd == repo and kill_live and age_s is None:
                        # the live-kill opt-in needs process age to avoid
                        # killing a just-launched sibling; without
                        # /proc/uptime it degrades to counting the JVM as
                        # live — say so instead of silently no-opping
                        print(
                            f"# live-kill opt-in skipped for pid {pid}: "
                            "process age unknown (/proc/uptime unreadable)",
                            file=sys.stderr,
                        )
                    live.append((pid, cwd))
            except (OSError, ValueError, IndexError):
                continue  # raced exit / no permission / no procfs
        if killed:
            print(f"# swept {killed} leftover SparkSubmit JVM(s)", file=sys.stderr)
            time.sleep(2.0)  # let the OS reclaim their CPU/memory
        if live:
            print(
                "# WARNING: "
                f"{len(live)} live-parent SparkSubmit JVM(s) left running "
                f"(not mine to kill): {live} — bench numbers will be noisy",
                file=sys.stderr,
            )
    except Exception:  # pragma: no cover - diagnostic best-effort
        pass


def main(reps: int = 1) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    _sweep_leftover_jvms()
    wait = _quiet_wait()  # bounded spin until the box is quiet (or degraded)
    load = _box_load()  # sample AFTER the sweep+wait, BEFORE our own JVM starts
    load.update(wait)
    # the defended-protocol conditions are quiet box AND no foreign JVMs;
    # either failing makes the artifact's numbers contention-suspect
    if load.get("leftover_jvms", 0) > 0:
        load["degraded"] = True

    from duckpipe_spark.queries import REGISTRY
    from duckpipe_spark.session import get_spark

    spark = get_spark("duckpipe-spark-bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    names = [n for n in HEADLINE if n in REGISTRY]
    # extend with any registered queries not in the headline list
    names += [n for n in REGISTRY if n not in names and REGISTRY[n].bench]

    def _run(name):
        df = REGISTRY[name].fn(spark, sf_dir)
        return df.count() if name in ("custkey_status_skeleton",) else len(df.collect())

    # warm pass (codegen compile + shuffle-file setup) on BOTH engines,
    # then `reps` timed passes with the ENGINE ORDER ALTERNATING per rep
    # (ABBA: rep 0 Spark→DuckDB, rep 1 DuckDB→Spark, ...) — VERDICT r12
    # item 4: the r12 driver artifact (1.157) and the defended sidecar
    # (0.944) disagreed by 22% under the same quiet-box protocol because
    # all Spark reps ran before all DuckDB reps, so slow inter-phase
    # drift (page cache, JVM background threads, thermal) loaded one
    # engine only. Alternating order puts both engines on both sides of
    # any drift inside ONE artifact, and the per-rep totals below make a
    # 20% swing visible instead of silently folding into the medians.
    samples: dict[str, list[float]] = {n: [] for n in names}
    duck_bench = None
    if not os.environ.get("SPARK_GRAFT_BENCH_NO_ORACLE"):
        duck_bench = _DuckDBBench(sf_dir, names, reps=reps)
    for name in names:
        _run(name)
    if duck_bench is not None:
        duck_bench.run_pass()  # warm (buffer/catalog setup)

    def _spark_pass(last: bool) -> None:
        for name in names:
            t0 = time.perf_counter()
            n = _run(name)
            samples[name].append(time.perf_counter() - t0)
            if last:
                print(
                    f"# {name}: {_median(samples[name]):.3f}s ({n} rows)",
                    file=sys.stderr,
                )

    rep_order = []
    rep_loadavg = []
    for rep in range(reps):
        spark_first = rep % 2 == 0
        rep_order.append("spark,duckdb" if spark_first else "duckdb,spark")
        if spark_first:
            _spark_pass(rep == reps - 1)
            if duck_bench is not None:
                duck_bench.run_pass(record=True)
        else:
            if duck_bench is not None:
                duck_bench.run_pass(record=True)
            _spark_pass(rep == reps - 1)
        try:
            # informational: carries OUR OWN executor decay tail, so it is
            # not the degradation criterion (rep spread below is) — but a
            # big asymmetric jump corroborates WHERE contention arrived
            rep_loadavg.append(round(os.getloadavg()[0], 2))
        except OSError:  # pragma: no cover
            pass
    timings = {n: round(_median(v), 3) for n, v in samples.items()}

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "reps": reps,
        "rep_order": rep_order,
        # per-rep pass totals: cross-rep drift (the r12 error term) is
        # readable from the artifact itself
        "spark_rep_totals": [
            round(sum(samples[n][r] for n in names if len(samples[n]) > r), 3)
            for r in range(reps)
        ],
        "rep_loadavg": rep_loadavg,
        **load,
    }
    # min-of-reps aggregate alongside the median (VERDICT r13 item 1): the
    # per-query MIN is the least-contaminated sample each engine achieved,
    # so a mid-run load spike inflates the median totals but not these
    out["spark_total_min"] = round(
        sum(min(v) for v in samples.values() if v), 3
    )

    if duck_bench is not None:
        duck, rep_counts, budget_skipped = duck_bench.results()
        out["duckdb"] = duck
        out["duckdb_rep_totals"] = duck_bench.rep_totals()
        # ADVICE r9 item 3: achieved rep count per oracle query — a median
        # degraded by budget exhaustion (fewer than `reps` samples) is
        # identifiable from the artifact, and the budget-skipped names are
        # listed SEPARATELY from errored/interrupted ones so a reader
        # attributes a short median to the right cause.
        out["duckdb_rep_counts"] = rep_counts
        degraded = sorted(n for n, c in rep_counts.items() if c < reps)
        if degraded:
            out["duckdb_degraded"] = degraded
        if budget_skipped:
            out["duckdb_budget_skipped"] = budget_skipped
        # None = no oracle / errored; 0.0 is a legitimate fast timing and
        # must stay in the ratio set (clamped denominator keeps it finite)
        timed = {n: d for n, d in duck.items() if d is not None}
        out["duckdb_total"] = round(sum(timed.values()), 3)
        out["ratio"] = {
            n: round(timings[n] / max(timed[n], 0.001), 2) for n in timings if n in timed
        }
        # ratio_total over the COMMON subset only — a null oracle row must
        # drop the query from BOTH sides, or the totals compare different
        # query sets and the aggregate ratio is meaningless
        common_spark = round(sum(timings[n] for n in timings if n in timed), 3)
        out["common_spark_total"] = common_spark
        if out["duckdb_total"]:
            out["ratio_total"] = round(common_spark / out["duckdb_total"], 3)
        # min-of-reps companion ratio over the same common subset
        duck_min = {
            n: min(x for x in xs if x is not None)
            for n, xs in duck_bench.samples.items()
            if any(x is not None for x in xs)
        }
        out["duckdb_total_min"] = round(sum(duck_min.values()), 3)
        common_min_spark = round(
            sum(min(samples[n]) for n in samples if samples[n] and n in duck_min), 3
        )
        if out["duckdb_total_min"]:
            out["ratio_total_min"] = round(common_min_spark / out["duckdb_total_min"], 3)

    # VERDICT r13 item 1: the r13 driver artifact read degraded:false at
    # ratio_total 1.843 because the flag was decided ONLY by pre-run
    # loadavg — load arriving MID-run landed in the medians undetected
    # (spark rep totals [54.7, 143.5, 111.2] vs duckdb's flat ~56).
    # Post-hoc criterion: if either engine's composition-comparable
    # per-rep totals spread beyond REP_SPREAD_DEGRADED, something other
    # than the benchmarked code moved the clock mid-run — flag it.
    REP_SPREAD_DEGRADED = 1.3
    out["rep_spread_criterion"] = REP_SPREAD_DEGRADED

    def _spread(totals):
        vals = [t for t in totals if t and t > 0]
        if len(vals) < 2:
            return None
        return round(max(vals) / min(vals), 2)

    causes = []
    spark_spread = _spread(out["spark_rep_totals"])
    if spark_spread is not None:
        out["spark_rep_spread"] = spark_spread
        if spark_spread > REP_SPREAD_DEGRADED:
            causes.append(f"spark_rep_spread {spark_spread}x")
    if duck_bench is not None:
        duck_spread = _spread(out["duckdb_rep_totals"])
        if duck_spread is not None:
            out["duckdb_rep_spread"] = duck_spread
            if duck_spread > REP_SPREAD_DEGRADED:
                causes.append(f"duckdb_rep_spread {duck_spread}x")
    if causes:
        out["degraded"] = True
        out["degraded_cause"] = causes
        print(
            f"# WARNING: mid-run contamination detected ({', '.join(causes)} "
            f"> {REP_SPREAD_DEGRADED}x) — medians are suspect, read the "
            f"*_total_min / ratio_total_min fields",
            file=sys.stderr,
        )

    # The driver captures ONE stdout JSON line of bounded length; r7's line
    # (3 per-query maps x 32 queries) outgrew the capture and the artifact
    # degraded to "parsed": null (VERDICT r7 item 4). Print a compact line —
    # headline totals + the required per-query SPARK timings — and park the
    # full payload (duckdb + ratio per-query maps) in a sidecar file.
    try:
        # closing load sample: contention that ARRIVED mid-run shows here.
        # NOTE the 1-min loadavg still carries OUR OWN just-finished
        # executor work (decay tail) — read it relative to loadavg_1m, and
        # treat only a large jump (>> n_cpus-normalized self-load) as
        # evidence of foreign contention
        out["loadavg_after"] = round(os.getloadavg()[0], 2)
    except OSError:  # pragma: no cover
        pass
    # full per-query per-rep samples go to the sidecar only (VERDICT r12
    # item 4: a 20% swing must be visible INSIDE one artifact)
    out["spark_samples"] = {n: [round(x, 3) for x in v] for n, v in samples.items()}
    if duck_bench is not None:
        out["duckdb_samples"] = {
            n: [None if x is None else round(x, 3) for x in v]
            for n, v in duck_bench.samples.items()
        }
    # VERDICT r14 item 4 (reporting-only, timed region unchanged): a
    # degraded run must not overwrite the defended clean sidecar — the r14
    # driver runs silently replaced the committed spread-clean
    # BENCH_DETAIL.json with contaminated samples. Route degraded runs to
    # BENCH_DETAIL_degraded.json (still fully inspectable; the compact
    # line's "detail" field names whichever file this run wrote).
    detail_name = "BENCH_DETAIL_degraded.json" if out.get("degraded") else "BENCH_DETAIL.json"
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), detail_name)
    try:
        with open(detail_path, "w") as f:
            json.dump(out, f, indent=1)
    except OSError:  # pragma: no cover - read-only checkout still benches
        detail_path = None
    compact = {
        k: v
        for k, v in out.items()
        if k not in ("duckdb", "ratio", "duckdb_rep_counts", "spark_samples", "duckdb_samples")
    }
    compact["n_queries"] = len(timings)
    if detail_path:
        compact["detail"] = os.path.basename(detail_path)
    print(json.dumps(compact))


class _DuckDBBench:
    """DuckDB oracle wall-clock, one pass at a time, so `main` can
    alternate Spark/DuckDB passes per rep (ABBA — VERDICT r12 item 4)
    instead of running one engine's full schedule after the other's.
    Same per-query treatment as the Spark side (warm once, median of
    recorded passes). Queries without oracle SQL, or whose oracle
    errors, record null rather than aborting the bench line. Defensive
    bounds so the whole bench stays inside any driver timeout: each
    execution gets a hard interrupt at PER_QUERY_S, and once DuckDB has
    spent TOTAL_BUDGET_S the remaining executions record null (a
    partial oracle side beats a missing BENCH artifact). The budget
    clock counts DUCKDB time only — Spark passes between duckdb passes
    must not eat the oracle's budget."""

    PER_QUERY_S = 45.0  # single-execution interrupt window

    def __init__(self, sf_dir: str, names: list[str], reps: int = 1):
        import duckdb

        from duckpipe_spark.queries import REGISTRY
        from duckpipe_spark.sources.tables import TABLE_NAMES

        self._registry = REGISTRY
        self._names = names
        self._with_oracle = [n for n in names if REGISTRY[n].oracle is not None]
        self.samples: dict[str, list[float]] = {n: [] for n in self._with_oracle}
        self.budget_skipped: set[str] = set()
        self._spent = 0.0
        self._budget = 150.0 * max(1, reps)
        self._recorded_passes = 0
        self._con = duckdb.connect()
        for t in TABLE_NAMES:
            self._con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )

    def _timed(self, q: str, name: str) -> float | None:
        import threading

        if self._spent > self._budget:
            # ADVICE r9 item 3: a silent None here made a 1-of-3-rep median
            # indistinguishable from the full protocol — say so, per skip,
            # and record the CAUSE (a degraded median from budget pressure
            # reads differently than one from a failing/interrupted oracle)
            self.budget_skipped.add(name)
            print(f"# duckdb skipped (budget spent): {name}", file=sys.stderr)
            return None
        timer = threading.Timer(self.PER_QUERY_S, self._con.interrupt)
        timer.start()
        try:
            t0 = time.perf_counter()
            self._con.execute(q).fetchall()
            dt = time.perf_counter() - t0
            self._spent += dt
            return dt
        except Exception as exc:  # pragma: no cover - diagnostic path
            self._spent += time.perf_counter() - t0
            print(f"# duckdb failed/interrupted: {exc}", file=sys.stderr)
            return None
        finally:
            timer.cancel()

    def run_pass(self, record: bool = False) -> None:
        for name in self._with_oracle:
            t = self._timed(self._registry[name].oracle, name)
            if record:
                # ADVICE r13 item 1: record a None PLACEHOLDER for a
                # budget-skipped/failed execution so sample index == rep
                # index; without it, a query that skips in rep r and
                # succeeds in rep r+1 shifts left and rep-attribution of
                # every later sample (the drift diagnostic) is wrong
                self.samples[name].append(t)
        if record:
            self._recorded_passes += 1

    def rep_totals(self) -> list[float]:
        # totals over queries with a recorded (non-None) sample in EVERY
        # pass, so per-rep totals are composition-comparable — a rep is
        # bigger only if the box was slower, never because a different
        # query subset landed in it (that comparability is what the
        # rep-spread degradation criterion reads)
        complete = [
            n
            for n, xs in self.samples.items()
            if len(xs) == self._recorded_passes and all(x is not None for x in xs)
        ]
        return [
            round(sum(self.samples[n][r] for n in complete), 3)
            for r in range(self._recorded_passes)
        ]

    def results(self):
        duck: dict[str, float | None] = {}
        rep_counts: dict[str, int] = {}
        for name in self._names:
            xs = [x for x in self.samples.get(name, []) if x is not None]
            duck[name] = round(_median(xs), 3) if xs else None
            if name in self.samples:
                rep_counts[name] = len(xs)
        return duck, rep_counts, sorted(self.budget_skipped)


if __name__ == "__main__":
    if "--oracle" in sys.argv:
        oracle_main()
    else:
        # VERDICT r8 item 6: the repo's declared-authoritative protocol is
        # interleaved per-query MEDIANS of >= 3 reps (BASELINE §5/§21) — a
        # single rep on this noisy box swings sub-second queries ±40% and
        # r8's driver artifact (1 rep, loadavg 7.45) read 1.01 while the
        # §21 protocol read 0.828. Default the machine-readable artifact to
        # the defended protocol; SPARK_GRAFT_BENCH_REPS=1 restores the old
        # warm-once/time-second behavior for quick iteration.
        reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
        if "--interleave" in sys.argv:
            ix = sys.argv.index("--interleave")
            # a following flag/query-name token must not crash the bench —
            # default to 3 reps unless the next token is a plain integer
            try:
                reps = int(sys.argv[ix + 1])
            except (IndexError, ValueError):
                reps = 3
        main(reps=reps)
