"""Profile the two CPU-heaviest bench queries stage by stage.

Usage: python tools/profile_hogs.py [sf_dir]

Times (wall + process-tree CPU) each sub-stage of dedup_minhash_lsh and
text_fingerprint so optimization work targets the actual hot stage
instead of the whole pipeline. Reuses bench.py's CPU sampler.
"""

from __future__ import annotations

import os
import sys
import time

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "4")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _cpu_delta, _tree_cpu_sample  # noqa: E402
from sgdnet_spark.session import get_spark  # noqa: E402


def timed(label, thunk, n=3):
    best, best_cpu = float("inf"), -1.0
    for _ in range(n):
        c0 = _tree_cpu_sample()
        t0 = time.perf_counter()
        thunk()
        wall = time.perf_counter() - t0
        c1 = _tree_cpu_sample()
        if wall < best:
            best = wall
            if c0 and c1:
                best_cpu = _cpu_delta(c0, c1)
    print(f"{label:40s} {best:7.3f}s wall  {best_cpu:7.3f}s cpu")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("profile_hogs")
    import pyspark.sql.functions as F

    from sgdnet_spark.operators import dedup, text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.count()  # warm page cache / footers

    # --- dedup_minhash_lsh stages
    sa = dedup.shingle_array(docs)
    timed("minhash: shingle_array", lambda: sa.count())
    banded = dedup.band_keys_from_shingles(sa)
    timed("minhash: +signatures+bands", lambda: banded.count())
    timed(
        "minhash: full pipeline",
        lambda: dedup.minhash_lsh_pairs(docs, threshold=0.5).count(),
    )

    # --- text_fingerprint stages
    from sgdnet_spark.operators.text import norm_text

    staged = docs.select(F.col("doc_id"), norm_text("text").alias("__norm"))
    norm = F.col("__norm")
    k = 8
    nhash = F.length(norm) - (k - 1)
    idx = F.when(nhash >= 1, F.sequence(F.lit(1), nhash)).otherwise(
        F.array().cast("array<int>")
    )
    hashed = staged.select(
        F.col("doc_id"),
        F.transform(idx, lambda i: F.md5(norm.substr(i, F.lit(k)).cast("binary"))).alias("__h"),
    )
    timed("winnow: md5 per k-gram", lambda: hashed.select(F.sum(F.size("__h"))).collect())
    timed("winnow: full", lambda: text.winnow_fingerprints(docs).count())


if __name__ == "__main__":
    main()
