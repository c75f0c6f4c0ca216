"""Per-query profiler: bench-methodology wall time PLUS Spark job/stage
counts, so machinery-heavy cells (many small sequential jobs) can be told
apart from compute-heavy ones (guide §1: measure first, attribute second).

Usage:
    python tools/profile_query.py <sf_dir> <query1,query2,...> [--explain DIR]

Prints one line per query: name, wall sec, #jobs, #stages, #tasks.
With --explain DIR, also writes <query>_before.txt style formatted plans
(of the RETURNED frame — imperative machinery inside the query body is
invisible to explain and only shows in the job counts).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    names = [n for n in sys.argv[2].split(",") if n]
    explain_dir = None
    if "--explain" in sys.argv:
        explain_dir = sys.argv[sys.argv.index("--explain") + 1]
        os.makedirs(explain_dir, exist_ok=True)
    suffix = "_before"
    if "--suffix" in sys.argv:
        suffix = sys.argv[sys.argv.index("--suffix") + 1]

    from wopen_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("wopen-profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    if names == ["ALL"]:
        names = list(qs)

    # warm-up mirrors bench.py
    next(iter(qs.values()))(spark, sf_dir).limit(1).collect()

    sc = spark.sparkContext
    jsc = sc._jsc.sc()
    tracker = jsc.statusTracker()

    for name in names:
        group = f"prof_{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        if explain_dir is not None:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(explain_dir, f"{name}{suffix}.txt"), "w") as f:
                f.write(plan)
        try:
            _ = len(df.toPandas())
        except Exception:
            _ = len(df.collect())
        wall = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        job_ids = list(tracker.getJobIdsForGroup(group))
        n_stages = 0
        n_tasks = 0
        for jid in job_ids:
            info = tracker.getJobInfo(jid)
            if info is None:
                continue
            sids = list(info.get().stageIds())
            n_stages += len(sids)
            for sid in sids:
                sinfo = tracker.getStageInfo(sid)
                if sinfo is not None:
                    n_tasks += sinfo.get().numTasks()
        print(
            f"{name:42s} {wall:8.3f}s jobs={len(job_ids):4d} "
            f"stages={n_stages:4d} tasks={n_tasks:6d}",
            flush=True,
        )


if __name__ == "__main__":
    main()
