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


def dir_exists(spark, path: str) -> bool:
    """Hadoop-FS existence check (works on hdfs://, file:, abfs…)."""
    fs, hpath = _fs_path(spark, path)
    return fs.exists(hpath)


def drop_dir(spark, path: str) -> None:
    """Recursively delete a directory if present (no-op otherwise)."""
    fs, hpath = _fs_path(spark, path)
    fs.delete(hpath, True)


def read_tombstones(spark, index_path: str, id_col: str):
    """The pending-deletes relation (one ``id_col`` column) of an index
    at ``index_path``, or None when no deletes are pending. Shared by
    the BM25 (doc_id) and IVF-PQ (id) tiers. Bounded by the deletes
    since the last compaction — probe anti-joins broadcast it under
    the routine-compaction contract the append tiers' file-count
    growth already imposes."""
    tdir = f"{index_path}/tombstones"
    if not dir_exists(spark, tdir):
        return None
    tomb = spark.read.parquet(tdir)
    return tomb if len(tomb.take(1)) else None


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
    if partition_col is None or rel.isEmpty():
        # a transform may drop EVERY row (e.g. the whole index was
        # tombstoned): a partitionBy write of an empty relation emits
        # no parquet file and the installed dir would be unreadable
        # (schema inference fails) — write unpartitioned instead, which
        # emits one schema-ful empty file; the partition column becomes
        # a plain data column, which every probe's .filter() still
        # accepts
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
    if fs.exists(hpath):
        # the live dir REAPPEARED between our two renames — a
        # concurrent recover_partitioned (stream-server retry) decided
        # we had crashed and restored it. Renaming tmp now would move
        # it INSIDE the restored dir (the Hadoop rename-into-existing-
        # dir trap) and corrupt the layout: lose the race safely —
        # drop our output, leave the restored original serving
        fs.delete(tmp_p, True)
        fs.delete(old_p, True)
        raise IOError(
            f"compact_partitioned: {dir_path} was concurrently restored "
            "mid-swap (probe-side recovery); compaction aborted, original "
            "layout intact — re-run it"
        )
    if not fs.rename(tmp_p, hpath):
        # put the original back — nothing lost; a failed rollback is
        # loudly fatal, never silent (the .old copy is still on disk)
        if not fs.rename(old_p, hpath):
            raise IOError(
                f"compact_partitioned: could not install {tmp} AND could "
                f"not restore {old} — restore {old} to {dir_path} manually"
            )
        raise IOError(f"compact_partitioned: could not install {tmp}")
    # verify the installed layout is readable (parquet footer/schema
    # read) BEFORE dropping the previous one; a bad install keeps .old
    # on disk for recover_partitioned / manual repair. Never delete the
    # live dir unless the .old copy still exists to replace it
    try:
        spark.read.parquet(dir_path).schema
    except Exception:
        if fs.exists(old_p):
            fs.delete(hpath, True)
            if not fs.rename(old_p, hpath):
                raise IOError(
                    f"compact_partitioned: verify failed and rollback "
                    f"rename failed — restore {old} to {dir_path} manually"
                )
        raise
    fs.delete(old_p, True)
    # the directory's contents just changed in place: drop any cached
    # table handle bound to it (queries._t pins the file listing at
    # handle creation — reading through a stale handle after this swap
    # would hit deleted files). Index dirs never go through _t, so this
    # is a no-op for the normal maintenance paths; it closes the latent
    # for anyone compacting a base table (ADVICE r13).
    from sgdnet_spark.queries import clear_table_cache

    clear_table_cache(dir_path)
    return before
