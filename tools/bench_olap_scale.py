"""Scale probe for the OLAP join/report tier: the TPC-H-Q8-shaped
market-share star join and the ROLLUP / GROUPING SETS reports,
measured across three decades of join-consistent derived facts
(make_sf_scale.py key-offset copies: 600k/6M/60M lineitem,
150k/1.5M/15M orders; per-copy key spaces are closed so join
fan-out and the revenue SHARES are scale-invariant while volume
grows linearly).

What the plans predict:

- **q_market_share**: two wide exchanges (lineitem x orders on
  orderkey, + orders x customer on custkey), broadcast dims, then a
  |regions x years| aggregate — wall should be scan/shuffle-bound
  (alpha ~1) with the share window costing nothing (35 rows).
- **q_grouping_sets**: Expand multiplies the scan
  by the grouping-set count BEFORE the map-side partial agg, so the
  shuffle stays |groups|-sized at every scale — alpha ~1 on the
  scan, flat on the shuffle.

Usage: python tools/bench_olap_scale.py [out=BENCH_olap_scale.json]
(needs /tmp/sf1 + /tmp/sf10 facts from
 `make_sf_scale.py /tmp/sf1 10 customer,orders,lineitem` etc.)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALES = [("600k", "/root/testdata/sf0.1"),
          ("6M", "/tmp/sf1"),
          ("60M", "/tmp/sf10")]


def main() -> None:
    out_name = sys.argv[1] if len(sys.argv) > 1 else "BENCH_olap_scale.json"
    from obmp_psql_spark.queries_olap import q_grouping_sets
    from obmp_psql_spark.queries_curate import q_market_share
    from obmp_psql_spark.session import get_spark

    spark = get_spark("bench-olap-scale")
    out: dict = {}
    for name, fn in (("market_share", q_market_share),
                     ("grouping_sets", q_grouping_sets)):
        res: dict = {}
        prev = None
        for tag, sf in SCALES:
            if not os.path.isdir(sf):
                print(f"skip {tag}: {sf} missing"); continue
            t0 = time.monotonic()
            rows = fn(spark, sf).collect()
            wall = round(time.monotonic() - t0, 3)
            res[tag] = {"wall_s": wall, "n_rows": len(rows)}
            if prev is not None:
                res[f"alpha_{prev[0]}_{tag}"] = round(
                    math.log(wall / prev[1]) / math.log(10), 3)
            prev = (tag, wall)
        out[name] = res
        print(name, json.dumps(res))

    with open(out_name, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", out_name)


if __name__ == "__main__":
    main()
