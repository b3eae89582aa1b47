"""dedup_minhash_full core-scaling at a corpus where work dominates the
action floor (r13 VERDICT #6: the sf0.1 bench showed 8-core/32-core
ratio 0.86 — FASTER on fewer cores — on the 5k-doc table).

Writes a synthetic 10x corpus (50k docs x 50 words, ~2% planted dups)
to /tmp once, then times the bench's exact dedup_minhash_full shape
(minhash_lsh_pairs n=3, 64 hashes, 16 bands, threshold 0.8 + toPandas)
under the CURRENT $SPARK_GRAFT_CPUS. Run it twice:

    SPARK_GRAFT_CPUS=32 python scripts/dedup_scale_cores.py
    SPARK_GRAFT_CPUS=8  python scripts/dedup_scale_cores.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

DOCS_PATH = "/tmp/dedup_scale_docs_50k.parquet"
N_DOCS = int(os.environ.get("DEDUP_SCALE_DOCS", "50000"))


def main() -> None:
    from intake_state_growth import synth_docs

    from sparvi_spark.operators.dedup import minhash_lsh_pairs
    from sparvi_spark.session import get_spark

    spark = get_spark("dedup_scale")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.isdir(DOCS_PATH):
        base = synth_docs(spark, 0, N_DOCS - N_DOCS // 50)
        dups = synth_docs(spark, 0, N_DOCS // 50).selectExpr(
            f"doc_id + {N_DOCS * 10} AS doc_id", "text")
        base.unionAll(dups).write.mode("overwrite").parquet(DOCS_PATH)

    def run():
        docs = spark.read.parquet(DOCS_PATH)
        return minhash_lsh_pairs(docs, "doc_id", "text", n=3,
                                 num_hashes=64, bands=16, threshold=0.8)

    n = len(run().toPandas())  # warm codegen/JIT
    walls = []
    for _ in range(3):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        run().toPandas()
        walls.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
                      "docs": N_DOCS, "pairs": n,
                      "walls": walls, "best": min(walls)}))
    spark.stop()


if __name__ == "__main__":
    main()
