"""Dump .explain('formatted') for named queries to plans/<tag>/<name>_<suffix>.txt.

Usage: python scripts/dump_plans.py OUT_DIR SUFFIX SF_DIR name [name ...]
A measurement/deliverable tool (guide §1) — not part of the driver contract.
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    out_dir, suffix, sf_dir, *names = sys.argv[1:]
    os.makedirs(out_dir, exist_ok=True)
    from spark_ensemble_spark.session import get_spark
    from spark_ensemble_spark.queries import ALL_SPARK_QUERIES

    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = ALL_SPARK_QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain(mode="formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)

if __name__ == "__main__":
    main()
