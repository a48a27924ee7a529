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

Crash recovery (round 13): the freshly written ``<dir>.compact_tmp``
is self-contained, so no crash point loses data. A crash between the
two renames leaves ``<dir>`` missing but ``<dir>.old`` intact;
:func:`compact_partitioned` detects that state AT ENTRY and renames
``.old`` back before doing anything else, so simply re-running the
compaction restores service (:func:`recover_partitioned` does the same
repair standalone, for probes that hit the window). ``.old`` is only
deleted AFTER the installed directory passes a parquet-footer read.
Values never change — only file layout — asserted in tests.

Concurrent probes: the swap still has a brief window where ``<dir>``
is absent, so a probe racing a compaction can fail with a missing-path
error. The streaming servers (Bm25StreamServer / PqStreamServer)
bound-retry their per-batch probe for exactly this reason; batch
callers can either retry or call :func:`recover_partitioned` first.
"""

from __future__ import annotations


def _fs_path(spark, path_str: str):
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path_str)
    return hpath.getFileSystem(conf), hpath


def recover_partitioned(spark, dir_path: str) -> bool:
    """Repair the crash-between-renames state: if ``dir_path`` is
    missing but ``dir_path + \".old\"`` exists (a compaction died after
    staging the live directory aside and before installing the new
    layout), rename ``.old`` back into place. Returns True if a repair
    was performed, False if the directory was already healthy. Safe to
    call unconditionally — a no-op when nothing is wrong."""
    fs, hpath = _fs_path(spark, dir_path)
    _, old_p = _fs_path(spark, f"{dir_path}.old")
    if not fs.exists(hpath) and fs.exists(old_p):
        if not fs.rename(old_p, hpath):
            raise IOError(
                f"recover_partitioned: could not restore {dir_path} from .old"
            )
        return True
    return False


def compact_partitioned(
    spark, dir_path: str, partition_col: str | None, transform=None
) -> int:
    """Rewrite a ``partitionBy(partition_col)`` parquet directory to one
    file per partition, swapping it in place. Returns the parquet file
    count BEFORE compaction (callers/tests compare against after).

    ``transform`` (optional ``DataFrame -> DataFrame``) is applied to
    the read before the rewrite — how the index tiers physically drop
    tombstoned rows during their compaction pass (an anti-join folded
    into the one shuffle the rewrite pays anyway). ``partition_col=
    None`` compacts an unpartitioned relation to a single file (the
    small sidecar relations — doc catalogs).

    Re-runnable after any crash: entry-time :func:`recover_partitioned`
    repairs a half-finished previous swap, and ``.old`` is kept until
    the installed layout passes a read check."""
    recover_partitioned(spark, dir_path)
    fs, hpath = _fs_path(spark, dir_path)
    it, before = fs.listFiles(hpath, True), 0
    while it.hasNext():
        if it.next().getPath().getName().endswith(".parquet"):
            before += 1
    tmp = f"{dir_path}.compact_tmp"
    old = f"{dir_path}.old"
    rel = spark.read.parquet(dir_path)
    if transform is not None:
        rel = transform(rel)
    if partition_col is None:
        rel.coalesce(1).write.mode("overwrite").parquet(tmp)
    else:
        (
            rel.repartition(partition_col)
            .write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(tmp)
        )
    _, tmp_p = _fs_path(spark, tmp)
    _, old_p = _fs_path(spark, old)
    fs.delete(old_p, True)
    if not fs.rename(hpath, old_p):
        raise IOError(f"compact_partitioned: could not stage {dir_path} aside")
    if not fs.rename(tmp_p, hpath):
        # put the original back — nothing lost
        fs.rename(old_p, hpath)
        raise IOError(f"compact_partitioned: could not install {tmp}")
    # verify the installed layout is readable (parquet footer/schema
    # read) BEFORE dropping the previous one; a bad install keeps .old
    # on disk for recover_partitioned / manual repair
    try:
        spark.read.parquet(dir_path).schema
    except Exception:
        fs.delete(hpath, True)
        fs.rename(old_p, hpath)
        raise
    fs.delete(old_p, True)
    return before
