"""SimHash UDF bench: vectorized batch path vs the row-loop it replaced.

The round-1 ``simhash_udf`` looped rows in Python (one blake2b per
token occurrence, per-token Python bit lists) while claiming to be the
100 TB path; round 2 rewrote it as batch-level factorize → one md5 per
unique token → numpy segment-sum votes (VERDICT r1 item 3). This bench
keeps the old loop inline as the baseline and measures both over the
sf0.1 documents corpus inside real Spark pandas-UDF execution.

Usage: python scripts/bench_simhash.py [sf_dir] [cores]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.functions import pandas_udf  # noqa: E402

from crawlers_spark.operators.textdedup import simhash_udf  # noqa: E402
from crawlers_spark.session import get_spark  # noqa: E402


def legacy_loop_udf(bits: int = 64):
    """The round-1 implementation, verbatim — per-row Python loop."""
    import hashlib

    @pandas_udf("long")
    def _simhash(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = (t or "").split()
            if not toks:
                continue
            uniq, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
            bitmat = np.empty((len(uniq), bits), dtype=np.int64)
            for j, tok in enumerate(uniq):
                d = hashlib.blake2b(tok.encode(), digest_size=8).digest()
                v = int.from_bytes(d, "big")
                bitmat[j] = [(v >> b) & 1 for b in range(bits)]
            votes = ((bitmat * 2 - 1) * counts[:, None]).sum(axis=0)
            sig = 0
            for b in range(bits):
                if votes[b] > 0:
                    sig |= 1 << b
            out[i] = np.int64(np.uint64(sig).astype(np.int64)) if sig < (1 << 63) else np.int64(sig - (1 << 64))
        return pd.Series(out)

    return _simhash


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 40  # replicate corpus for a measurable wall
    spark = get_spark("bench-simhash", cores=cores, shuffle_partitions=cores)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .crossJoin(spark.range(mult).select(F.col("id").alias("rep")))
        .select((F.col("doc_id") * mult + F.col("rep")).alias("doc_id"), "text")
        .repartition(cores * 4)
        .persist()
    )
    n = docs.count()

    def run(udf, reps: int = 3) -> float:
        # a FRESH DataFrame per rep: re-collecting one plan object lets
        # Spark reuse the previous run's shuffle map outputs and skip
        # the UDF stage entirely (0.05 s "runs" that ran nothing)
        def once() -> float:
            df = docs.select(F.sum(udf(F.col("text")).bitwiseAND(F.lit(1))).alias("s"))
            t0 = time.perf_counter()
            df.collect()
            return time.perf_counter() - t0

        once()  # warm workers/codegen
        return min(once() for _ in range(reps))

    new_wall = run(simhash_udf(64))
    old_wall = run(legacy_loop_udf(64))
    print(
        json.dumps(
            {
                "docs": n,
                "cores": cores,
                "vectorized_s": round(new_wall, 2),
                "row_loop_s": round(old_wall, 2),
                "speedup": round(old_wall / new_wall, 1),
                "vectorized_docs_per_sec": round(n / new_wall, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
