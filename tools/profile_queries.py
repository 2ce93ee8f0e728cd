"""Per-query optimization profiler (round 14, guide §1).

For each named query: build the plan, run it to completion through the
noop sink (guide §1.4 — computes every column, no driver collect),
and record wall seconds, the number of Spark JOBS and STAGES the run
scheduled (the overhead currency at fixture scale: 2000-row
embeddings / 600k-row lineitem make every hot query OVERHEAD-bound,
so jobs × stages × exchanges is what the wall clock is made of), and
the count of Exchange / BatchEvalPython-family nodes in the executed
plan. Optionally dumps ``.explain("formatted")`` to a file per query
(plans/r14/<q>_<tag>.txt — the judge-facing before/after evidence).

Usage:
  python tools/profile_queries.py before q12_semantic_dedup q91_kmeans_int
  python tools/profile_queries.py after --no-plans q18_shortest_paths
  python tools/profile_queries.py timeonly --runs 3 q18_shortest_paths

The tag names the plan dump suffix. Jobs are labelled in the UI via
setJobDescription (guide §1.5).
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from kaj_query_engine_spark.session import get_spark  # noqa: E402
from kaj_query_engine_spark.workload import all_queries  # noqa: E402


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    tag = sys.argv[1]
    args = sys.argv[2:]
    dump_plans = True
    runs = 1
    names = []
    it = iter(args)
    for a in it:
        if a == "--no-plans":
            dump_plans = False
        elif a == "--runs":
            runs = int(next(it))
        else:
            names.append(a)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "kaj-profile", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    qs = all_queries()
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # one warmup action so session/codegen startup isn't billed
    qs[names[0]].spark(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    out = {}
    for name in names:
        q = qs[name]
        rec = {"runs": []}
        for r in range(runs):
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            jobs0 = len(tracker.getJobIdsForGroup(None))
            sc.setJobDescription(f"{tag}:{name}")
            t0 = time.time()
            df = q.spark(spark, sf_dir)
            t_build = time.time() - t0
            df.write.format("noop").mode("overwrite").save()
            took = time.time() - t0
            sc.setJobDescription(None)
            jobs1 = len(tracker.getJobIdsForGroup(None))
            rec["runs"].append(
                {
                    "sec": round(took, 3),
                    "build_sec": round(t_build, 3),
                    "jobs": jobs1 - jobs0,
                }
            )
        if dump_plans:
            spark.catalog.clearCache()
            df = q.spark(spark, sf_dir)
            txt = plan_text(df)
            rec["exchanges"] = txt.count("Exchange")
            rec["python_nodes"] = (
                txt.count("BatchEvalPython")
                + txt.count("ArrowEvalPython")
                + txt.count("MapInPandas")
                + txt.count("MapInArrow")
            )
            p = (
                REPO
                / "plans"
                / os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15")
                / f"{name}_{tag}.txt"
            )
            p.parent.mkdir(parents=True, exist_ok=True)
            p.write_text(txt)
            rec["plan"] = str(p.relative_to(REPO))
        out[name] = rec
        print(json.dumps({name: rec}))
    print("== summary ==")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
