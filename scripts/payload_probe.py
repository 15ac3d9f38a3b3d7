"""Survivor-payload crossover probe: measures ivf_range_join's
``survivor_payload`` modes ("vectors" = carry both vectors with every
surviving pair; "ids" = bare key pairs + re-join before the exact
re-score) on a clustered synthetic corpus whose loose radius makes the
pair set DENSE — the ε-dedup shape where the payload choice matters.

This is the repeatable form of the r11 measurement backing the
``survivor_payload="auto"`` policy (ids at d ≥ 256): at d=512 with
N=3000 and ~4.5·10⁵ within-radius pairs, ids ran 18 s vs vectors 77 s
warm on this host (the 2·d·8-byte-per-pair Arrow output dominates);
at the bench corpus's d=64 the two extra hash joins cost more than the
payload saves. Results are asserted EQUAL between modes on every run.

Usage: python scripts/payload_probe.py [N] [d] [n_clusters]
Prints one JSON line per (payload, rep).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from vectorsearch_spark.operators.similarity import ivf_range_join
from vectorsearch_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    spark = get_spark("payload_probe", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    rng = np.random.default_rng(7)
    centers = rng.normal(0, 1, (k, d))
    x = centers[rng.integers(0, k, n)] + rng.normal(0, 0.05, (n, d))
    vec = spark.createDataFrame(
        [(int(i), [float(v) for v in x[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).cache()
    vec.count()
    q = vec.select(F.col("vec_id").alias("query_id"), "embedding")
    # within-cluster radius: ~E[(2*0.05^2)*d] apart -> r covers cluster mates
    r = float(np.sqrt(2 * 0.05 * 0.05 * d) * 1.1)
    counts = {}
    for rep in range(2):
        for payload in ("ids", "vectors"):
            t0 = time.time()
            cnt = ivf_range_join(
                vec, q, radius=r, n_centroids=k, id_col="vec_id",
                query_mode="distributed", survivor_payload=payload,
            ).count()
            counts.setdefault(payload, cnt)
            print(json.dumps({
                "payload": payload, "rep": rep, "pairs": cnt,
                "wall_s": round(time.time() - t0, 1), "n": n, "d": d,
            }), flush=True)
    assert counts["ids"] == counts["vectors"], counts  # mode-equality


if __name__ == "__main__":
    main()
