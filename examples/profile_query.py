"""Per-job wall-clock attribution for one bench query via the Spark event log.

Usage: python examples/profile_query.py <query> [reps]

Runs the query like bench.py does (build fn + collect), with
spark.eventLog.enabled so every job/stage lands in a JSON event file,
then prints a per-job table: job id, description/callsite, duration,
task time, shuffle bytes. This is the guide-§1 "measure first" tool —
it attributes a query's seconds to the operators that spend them
without needing the (disabled) live UI.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    t0 = time.time()
    while os.getloadavg()[0] >= 0.95 and time.time() - t0 < 300:
        time.sleep(5)  # quiet-wait so the profile is not self-contaminated
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    log_dir = tempfile.mkdtemp(prefix="spark-events-")

    from duckpipe_spark.queries import REGISTRY
    from duckpipe_spark.session import get_spark

    spark = get_spark(
        f"profile-{name}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    marks: list[tuple[str, float]] = []
    for rep in range(reps + 1):  # rep 0 = warm
        t0 = time.perf_counter()
        df = REGISTRY[name].fn(spark, sf_dir)
        t1 = time.perf_counter()
        n = df.count() if name in ("custkey_status_skeleton",) else len(df.collect())
        t2 = time.perf_counter()
        tag = "warm" if rep == 0 else f"rep{rep}"
        marks.append((tag, t2 - t0))
        print(
            f"# {tag}: build={t1 - t0:.3f}s collect={t2 - t1:.3f}s "
            f"total={t2 - t0:.3f}s rows={n}",
            file=sys.stderr,
        )
    spark.stop()

    # parse the event log: job-level wall clock + stage metrics
    files = [
        p
        for p in glob.glob(os.path.join(log_dir, "**", "*"), recursive=True)
        if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
    ]
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    for path in files:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    jid = ev["Job ID"]
                    props = ev.get("Properties") or {}
                    jobs[jid] = {
                        "start": ev["Submission Time"],
                        "desc": props.get("spark.job.description")
                        or props.get("callSite.short", ""),
                        "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                    }
                elif e == "SparkListenerJobEnd":
                    jid = ev["Job ID"]
                    if jid in jobs:
                        jobs[jid]["end"] = ev["Completion Time"]
                elif e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sid = si["Stage ID"]
                    sub = si.get("Submission Time")
                    comp = si.get("Completion Time")
                    stages[sid] = {
                        "name": si.get("Stage Name", ""),
                        "wall_ms": (comp - sub) if sub and comp else 0,
                        "tasks": si.get("Number of Tasks", 0),
                    }
                elif e == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    m = ev.get("Task Metrics") or {}
                    agg = stages.setdefault(sid, {})
                    for k, src in (
                        ("run", m.get("Executor Run Time", 0)),
                        ("deser", m.get("Executor Deserialize Time", 0)),
                        ("gc", m.get("JVM GC Time", 0)),
                        ("ser", m.get("Result Serialization Time", 0)),
                        (
                            "fetch",
                            (m.get("Shuffle Read Metrics") or {}).get(
                                "Fetch Wait Time", 0
                            ),
                        ),
                    ):
                        agg[k] = agg.get(k, 0) + src
    total_wall = 0
    print(f"{'job':>4} {'wall_ms':>8} {'stages(wall_ms)':<60} desc")
    for jid in sorted(jobs):
        j = jobs[jid]
        if "end" not in j:
            continue
        wall = j["end"] - j["start"]
        total_wall += wall
        sdesc = ",".join(
            f"{sid}:{stages[sid].get('wall_ms', 0)}"
            f"(r{stages[sid].get('run', 0)}/d{stages[sid].get('deser', 0)}"
            f"/g{stages[sid].get('gc', 0)})"
            for sid in j["stages"]
            if sid in stages and stages[sid].get("wall_ms") is not None
        )
        print(f"{jid:>4} {wall:>8} {sdesc:<70.70} {j['desc'][:60]}")
    print(f"# sum of job walls: {total_wall} ms over {len(jobs)} jobs")
    print(f"# event log dir: {log_dir}")


if __name__ == "__main__":
    main()
