"""IVF ANN: k-means quantizer sanity + recall vs brute force on
cluster-structured data."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sgdnet_spark.operators import ivf, similarity


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(43)
    centers = rng.normal(scale=5.0, size=(4, 8))
    rows = []
    for i in range(200):
        c = i % 4
        v = centers[c] + rng.normal(scale=0.3, size=8)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kmeans_recovers_clusters(clustered):
    cents = ivf.kmeans_fit(clustered, k=4, iters=8)
    assert cents.shape == (4, 8)
    lists = ivf.assign_lists(clustered, cents)
    # points of the same true cluster land in the same list
    rows = lists.select("id", "list_id").collect()
    by_true = {}
    for r in rows:
        by_true.setdefault(r["id"] % 4, set()).add(r["list_id"])
    assert all(len(s) == 1 for s in by_true.values())
    # and the 4 lists are distinct
    assert len({next(iter(s)) for s in by_true.values()}) == 4


def test_ivf_recall_vs_brute_force(clustered):
    q = clustered.filter(F.col("vec_id") < 4)
    bf = similarity.brute_force_topk(clustered, q, k=5)
    got_ivf = ivf.ivf_topk(clustered, q, k_neighbors=5, n_lists=4, nprobe=1, kmeans_iters=8)
    bf_pairs = {(r["query_id"], r["nbr_id"]) for r in bf.collect()}
    ivf_pairs = {(r["query_id"], r["nbr_id"]) for r in got_ivf.collect()}
    # with well-separated clusters, nprobe=1 already achieves full recall
    assert ivf_pairs == bf_pairs
