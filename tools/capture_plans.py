"""Capture .explain("formatted") for a set of registry queries into a
directory (the judge-readable plan evidence; works from any checkout —
run with cwd = the tree to capture from).

Usage: python tools/capture_plans.py OUT_DIR SUFFIX name [name ...]
"""
import contextlib
import io
import os
import sys

sys.path.insert(0, os.getcwd())

out_dir, suffix = sys.argv[1], sys.argv[2]
names = sys.argv[3:]
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from nadry_spark.session import get_spark  # noqa: E402

spark = get_spark("capture_plans", master="local[16]", shuffle_partitions=16)
import __spark_entry__ as em  # noqa: E402

queries = em.queries()
os.makedirs(out_dir, exist_ok=True)
for name in names:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        queries[name](spark, SF).explain("formatted")
    with open(os.path.join(out_dir, f"{name}{suffix}.txt"), "w") as f:
        f.write(buf.getvalue())
    print(name, "captured")
