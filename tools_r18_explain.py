#!/usr/bin/env python
"""Capture .explain('formatted') for named registry queries into
plans/r18/<name>_<tag>.txt (tag = before/after).  Builds run as needed
(memoized per process), so the captured plan is the steady-state plan the
bench times.  Usage: python tools_r18_explain.py <tag> name1,name2,..."""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2].split(",")
    from chat_data_pipeline_spark import get_spark
    from chat_data_pipeline_spark.queries import REGISTRY

    spark = get_spark(
        app_name="cdp-explain",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "64")),
    )
    os.makedirs("plans/r18", exist_ok=True)
    for name in names:
        df = REGISTRY[name].fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = f"plans/r18/{name}_{tag}.txt"
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
