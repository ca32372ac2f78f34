#!/usr/bin/env python
"""Star-contraction vs min-label on single chains of growing length.

The q144 claim in one measurement: connected-components round count on
a path graph is O(diameter) for min-label propagation and O(log n) for
alternating star contraction.  This probe times both on ONE chain
0-1-2-...-L at growing L, with min-label capped (it would take L
rounds — the cap proves the point without burning the wall-clock).

Usage: python tools/chain_probe.py [lengths ...]   (default 1000 8000 64000)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from themis_tritonsort_spark.session import get_spark  # noqa: E402


def main() -> None:
    lengths = [int(x) for x in sys.argv[1:]] or [1_000, 8_000, 64_000]
    spark = get_spark(app_name="chain-probe")
    spark.sparkContext.setLogLevel("ERROR")
    from themis_tritonsort_spark.operators.components import (
        connected_components,
        connected_components_star,
    )

    print("| chain length | star wall (s) | star result | min-label @20 rounds |")
    print("|---|---|---|---|")
    for n in lengths:
        edges = spark.range(n).select(
            F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
        )
        t0 = time.time()
        out = connected_components_star(edges)
        ok = (
            out.agg(
                F.count(F.lit(1)).alias("c"), F.max("component").alias("m")
            ).collect()[0]
        )
        t_star = time.time() - t0
        star_res = f"{ok['c']} vids, all comp 0" if ok["m"] == 0 else "WRONG"
        t0 = time.time()
        try:
            connected_components(edges, max_iterations=20).count()
            ml = f"converged?! ({time.time() - t0:.1f}s)"
        except RuntimeError:
            ml = f"raises (needs ~{n} rounds) after {time.time() - t0:.1f}s"
        print(f"| {n:,} | {t_star:.1f} | {star_res} | {ml} |")
    spark.stop()


if __name__ == "__main__":
    main()
