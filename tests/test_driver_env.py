"""Driver-environment regression guard: every query whose plan runs
Python on executors (mapInPandas / applyInPandas families) must work
when the engine is loaded the way the DRIVER loads it — by file path,
from a neutral cwd, with the repo NOT importable. Worker processes
then cannot ``import peerdb_cdc_psql_psql_spark...``; closures must be
self-contained or ship their helpers by value (memory:
worker-closure-imports; bug class caught live in r5 when the codec
queries' closures imported the package and failed only outside
pytest)."""

from __future__ import annotations

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import importlib.util, sys
assert all("/root/repo" not in p for p in sys.path), sys.path
spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "%(repo)s/__spark_entry__.py"
)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
# loading the module added the repo to sys.path for the DRIVER process
# (that is how the real driver works too); executor workers still
# inherit the original PYTHONPATH, which is the condition under test.
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
import inspect
from peerdb_cdc_psql_psql_spark.registry import REGISTRY

qs = mod.queries()
risky = []
for name, q in REGISTRY.items():
    src_mod = sys.modules.get(q.fn.__module__)
    if src_mod is None or "InPandas" not in inspect.getsource(src_mod):
        continue  # module has no Arrow-batch call sites at all
    if q.eager_build:
        continue  # iterative/fitting builds; their Arrow use (none) is
        # covered by the module filter above
    df = qs[name](spark, "%(sf)s")
    if "InPandas" in df._jdf.queryExecution().executedPlan().toString():
        risky.append((name, df))
assert risky, "expected at least the Arrow-path queries to be found"
for name, df in risky:
    n = df.count()
    print("OK", name, n, flush=True)
print("RISKY_TOTAL", len(risky))
"""


def test_python_worker_queries_run_without_repo_on_path(tmp_path):
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "PYTHONSTARTUP")
    }
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT % {"repo": _REPO, "sf": "/root/testdata/sf0.001"}],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert out.returncode == 0, out.stdout[-2000:] + "\n" + out.stderr[-2000:]
    assert "RISKY_TOTAL" in out.stdout
