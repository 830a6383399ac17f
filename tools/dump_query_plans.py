"""Dump `explain("formatted")` for named queries to plans/<dir>/.

Usage: python tools/dump_query_plans.py <outdir-under-plans> <suffix> q1 q2 ...
e.g.   python tools/dump_query_plans.py r15 after q_ann_topk q_ann_ivf_recall

Writes plans/r15/q_ann_topk_after.txt etc. Uses sf0.01 (plan shape is
sf-invariant modulo AQE runtime decisions).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    from obmp_psql_spark.registry import all_specs
    from obmp_psql_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("plan-dump")
    specs = all_specs()
    dest = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", outdir)
    os.makedirs(dest, exist_ok=True)
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(dest, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print("wrote", path)


if __name__ == "__main__":
    main()
