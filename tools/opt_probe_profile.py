"""r15 §1-style isolation: where does one ann_index_topk CALL spend its
time — construction (py4j round-trips, SQL string parses) vs execution?

Builds the probe fixture once (untimed), then times N probe calls with
(a) wall clock split at the DataFrame-construction / action boundary,
(b) a py4j send counter, (c) optional cProfile dump.

Usage: python tools/opt_probe_profile.py [n_calls] [--profile]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    n_calls = 3
    for a in sys.argv[1:]:
        if a.isdigit():
            n_calls = int(a)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from opt_phase_probe import session
    spark = session()

    # count py4j commands by wrapping the gateway client's send path
    import py4j.clientserver as cs
    sends = [0]
    orig = cs.ClientServerConnection.send_command

    def counted(self, command):
        sends[0] += 1
        return orig(self, command)

    cs.ClientServerConnection.send_command = counted

    from carbonapi_spark.datapipe.similarity import (
        ann_index_topk, ivf_centroids, pq_codebooks, write_ann_index)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = ivf_centroids(64, 8, 43)
    cbs = pq_codebooks(64, 8, 16, 44)
    with tempfile.TemporaryDirectory() as tmp:
        p = f"{tmp}/ann"
        write_ann_index(emb.where(F.col("vec_id") % 3 != 0), p, cbs, cents)
        query = emb.where(F.col("vec_id") < 5)

        # warm
        ann_index_topk(spark, p, query, k=10, nprobe=3).collect()

        for i in range(n_calls):
            s0 = sends[0]
            t0 = time.perf_counter()
            out = ann_index_topk(spark, p, query, k=10, nprobe=3)
            t1 = time.perf_counter()
            s1 = sends[0]
            out.collect()
            t2 = time.perf_counter()
            s2 = sends[0]
            print(f"call {i}: construct={t1-t0:.3f}s ({s1-s0} py4j) "
                  f"execute={t2-t1:.3f}s ({s2-s1} py4j)")

        if "--profile" in sys.argv:
            import cProfile
            import pstats
            pr = cProfile.Profile()
            pr.enable()
            out = ann_index_topk(spark, p, query, k=10, nprobe=3)
            pr.disable()
            st = pstats.Stats(pr)
            st.sort_stats("cumulative").print_stats(30)
    spark.stop()


if __name__ == "__main__":
    main()
