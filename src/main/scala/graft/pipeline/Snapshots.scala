package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path}

/** Iceberg-snapshot-style versioned tables over any Hadoop FileSystem —
  * the checkpoint contract the north rule names (atomic replace +
  * readable-by-version), expressed without an Iceberg runtime jar (none
  * ships in this sandbox):
  *
  * ```
  * <table>/v=<n>/part-*.parquet + _SUCCESS + _LINEAGE   (immutable snapshot)
  * <table>/_CURRENT                                     (pointer file: "n")
  * ```
  *
  * Writers stage a complete new `v=<n>` directory and then PUBLISH by
  * swapping the `_CURRENT` pointer (tmp file + rename — atomic on
  * HDFS-like filesystems; an object-store deployment swaps via the
  * catalog's conditional put, same contract). Readers resolve the pointer
  * and only ever see complete snapshots (`_SUCCESS`-gated). Old snapshots
  * remain readable by version — time travel — until [[expire]]d.
  */
object Snapshots {

  def versionPath(table: Path, v: Long): Path = new Path(table, s"v=$v")
  private def pointer(table: Path): Path = new Path(table, "_CURRENT")

  /** The published current version, if its snapshot is complete. */
  def currentVersion(fs: FileSystem, table: Path): Option[Long] =
    if (!fs.exists(pointer(table))) None
    else {
      val in = fs.open(pointer(table))
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      txt.toLongOption.filter(v =>
        fs.exists(new Path(versionPath(table, v), "_SUCCESS")))
    }

  /** All snapshot versions present on disk (complete or not), ascending. */
  def allVersions(fs: FileSystem, table: Path): Seq[Long] =
    if (!fs.exists(table)) Seq.empty
    else fs.listStatus(table).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v=") => n.stripPrefix("v=").toLong }
      .sorted

  /** Next version to stage: one past the highest on disk (NOT the current
    * pointer — a failed staging attempt must not be overwritten blindly). */
  def nextVersion(fs: FileSystem, table: Path): Long =
    allVersions(fs, table).lastOption.map(_ + 1).getOrElse(0L)

  /** Atomically publish `v` as the current snapshot: rename-with-OVERWRITE
    * through FileContext, so a concurrent reader always sees either the old
    * or the new pointer — never a missing one. Filesystems without an
    * AbstractFileSystem binding fall back to delete+rename, which narrows
    * the guarantee to single-writer (the pipeline's deployment model). */
  def publish(fs: FileSystem, table: Path, v: Long): Unit = {
    val tmp = new Path(table, s"_CURRENT.tmp-$v")
    val out = fs.create(tmp, true)
    out.write(v.toString.getBytes("UTF-8"))
    out.close()
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        table.toUri, fs.getConf)
      fc.rename(fc.makeQualified(tmp), fc.makeQualified(pointer(table)),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        fs.delete(pointer(table), false)
        require(fs.rename(tmp, pointer(table)),
          s"pointer swap failed for $table v=$v")
    }
  }

  /** Drop old snapshots, retaining `keep` snapshots IN TOTAL: the published
    * one plus the `keep − 1` most recent others. Never drops the published
    * snapshot. `keep = 1` keeps only the published snapshot.
    *
    * With NO resolvable published snapshot (crash before the first publish,
    * or a corrupt pointer), the newest COMPLETE snapshot takes the published
    * one's protected role — otherwise `keep = 1` would delete every
    * snapshot including the only recoverable one. */
  def expire(fs: FileSystem, table: Path, keep: Int = 1): Seq[Long] = {
    val all = allVersions(fs, table)
    val protectedV = currentVersion(fs, table).orElse(
      all.reverse.find(v =>
        fs.exists(new Path(versionPath(table, v), "_SUCCESS"))))
    val candidates = all
      .filterNot(protectedV.contains)
      .dropRight(math.max(0, keep - 1))
    candidates.foreach(v => fs.delete(versionPath(table, v), true))
    candidates
  }
}
