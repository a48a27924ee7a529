"""Index maintenance: partition-layout compaction for the persisted
retrieval indexes (BM25 postings, IVF-PQ codes/vectors).

Incremental appends (append_bm25_index / append_pq_index) add one
parquet file per batch per touched partition directory; at daily-ingest
cadence the probe scan's file listing and tiny-file open overhead
degrade. Compaction is ONE shuffle on the partition column — each
partition value lands in exactly one task, so each directory gets one
output file — followed by a two-rename directory swap via the Hadoop
FileSystem API (works on HDFS/ABFS where rename is atomic; S3A renames
are copy-based, so run compaction in a maintenance window there).

Recovery: the freshly written ``<dir>.compact_tmp`` is self-contained,
so no crash point loses data. A crash between the two renames leaves
``<dir>`` missing but ``<dir>.old`` intact — re-running the compaction
(or renaming ``.old`` back) restores service. Values never change —
only file layout — asserted in tests.
"""

from __future__ import annotations


def compact_partitioned(spark, dir_path: str, partition_col: str) -> int:
    """Rewrite a ``partitionBy(partition_col)`` parquet directory to one
    file per partition, swapping it in place. Returns the parquet file
    count BEFORE compaction (callers/tests compare against after)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(dir_path)
    fs = hpath.getFileSystem(conf)
    it, before = fs.listFiles(hpath, True), 0
    while it.hasNext():
        if it.next().getPath().getName().endswith(".parquet"):
            before += 1
    tmp = f"{dir_path}.compact_tmp"
    old = f"{dir_path}.old"
    (
        spark.read.parquet(dir_path)
        .repartition(partition_col)
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(tmp)
    )
    tmp_p = jvm.org.apache.hadoop.fs.Path(tmp)
    old_p = jvm.org.apache.hadoop.fs.Path(old)
    fs.delete(old_p, True)
    if not fs.rename(hpath, old_p):
        raise IOError(f"compact_partitioned: could not stage {dir_path} aside")
    if not fs.rename(tmp_p, hpath):
        # put the original back — nothing lost
        fs.rename(old_p, hpath)
        raise IOError(f"compact_partitioned: could not install {tmp}")
    fs.delete(old_p, True)
    return before
