"""r14 optimization-round measurement harness (guide §1).

Times every HEADLINE + EXTRA bench query at $SPARK_GRAFT_SF_DIR with
the same methodology as bench.py (construct + collect, min over
passes, cache/index hygiene between passes) and captures
``explain("formatted")`` for each into plans/r14/.

The host swings 2-4x between sessions (every round's record), so
cross-session diffs are NOISE: every optimization decision this round
is made on interleaved in-session A/B (alternating variants within
one session); this harness provides the baseline ranking and the plan
captures.

Usage:
    python plans/r14/measure.py [--passes 2] [--plans] [--only a,b,c]
        [--suffix before] [--out file.json]

Emits one JSON line per query (so a tail is still useful if killed)
and a sorted summary at the end.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")

from peerdb_cdc_psql_psql_spark.session import get_spark  # noqa: E402
from peerdb_cdc_psql_psql_spark import operators  # noqa: E402,F401
from peerdb_cdc_psql_psql_spark.registry import REGISTRY  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def plan_text(spark, df) -> str:
    try:
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    except Exception:
        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--plans", action="store_true",
                    help="write explain('formatted') per query")
    ap.add_argument("--suffix", type=str, default="baseline",
                    help="plan-file suffix: <query>_<suffix>.txt")
    ap.add_argument("--only", type=str, default="")
    ap.add_argument("--out", type=str, default="")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    import bench  # noqa: E402

    names = bench.HEADLINE + bench.EXTRA
    if args.only:
        names = [n for n in args.only.split(",") if n]

    spark = get_spark("measure-r14", cpus=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    # warm codegen + Arrow worker pool (same as bench)
    REGISTRY["count_per_table"].fn(spark, SF_DIR).collect()
    spark.range(0, 1000, 1, CPUS).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    from peerdb_cdc_psql_psql_spark.operators import dedup as _dedup

    plans_dir = os.path.join(REPO, "plans", "r14")
    os.makedirs(plans_dir, exist_ok=True)

    times: dict[str, float] = {}
    for _pass in range(args.passes):
        spark.catalog.clearCache()
        for t in list(_dedup._INDEX_MEMO):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        _dedup._INDEX_MEMO.clear()
        for name in names:
            q = REGISTRY.get(name)
            if q is None:
                continue
            spark.sparkContext.setJobDescription(f"measure:{name}")
            t0 = time.perf_counter()
            df = q.fn(spark, SF_DIR)
            df.collect()
            dt = round(time.perf_counter() - t0, 3)
            prev = times.get(name)
            times[name] = dt if prev is None else min(prev, dt)
            print(json.dumps({"q": name, "pass": _pass, "s": dt}), flush=True)
            if args.plans and _pass == 0:
                with open(
                    os.path.join(plans_dir, f"{name}_{args.suffix}.txt"), "w"
                ) as f:
                    f.write(plan_text(spark, df))
    ordered = dict(sorted(times.items(), key=lambda kv: -kv[1]))
    summary = {"total": round(sum(times.values()), 3), "times": ordered}
    print(json.dumps(summary), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
