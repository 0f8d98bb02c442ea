package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** THE crash-recoverable compaction-swap utility — both shapes the
  * streaming twins need live here, so "don't lose the only surviving
  * copy" is implemented (and audited) once:
  *
  * **Full replace** ([[installTmp]]/[[recoverSwap]], used by the
  * vacuums in [[AttributionStream]], [[TransitionsStream]]): the kept
  * rows are written to `<name>.tmp`, then [[installTmp]] replaces the
  * live dir with it. The swap is not atomic, but every intermediate
  * state is recoverable by running [[recoverSwap]] at the next vacuum
  * start, BEFORE anything reads the live dirs:
  *
  *  - tmp complete (`_SUCCESS` present): it IS the surviving live
  *    table — the crashed vacuum's write-once finalize committed
  *    before any tmp write began, so its folded aggregates are
  *    durable. Finish the crashed swap by installing it, whatever
  *    state the live dir is in. Recomputing kept rows from a
  *    half-swapped (possibly empty) live dir instead would overwrite
  *    the only surviving copy with an empty frame — the data-loss bug
  *    this module exists to prevent.
  *  - tmp partial (no `_SUCCESS`): the crashed run died mid-write,
  *    BEFORE any delete (writes precede deletes in program order), so
  *    the live dir is intact — discard the partial tmp.
  *
  * **Partial fold** ([[foldCompact]], used by
  * [[BoilerplateStream.compact]] and [[PreferenceStream.compact]]):
  * every `batch=<id>` partition EXCEPT the newest folds into one
  * merged partition; the newest is never touched (it may be an
  * uncommitted in-flight batch whose id a replay reuses — folding it
  * would make the replay exclude ALL history). Here `_SUCCESS` alone
  * cannot arbitrate (the merged partition is complete the moment its
  * write finishes, but the fold also DELETES source partitions that
  * the live dir must keep until the merged copy is installed), so a
  * `.SWAP` marker brackets the destructive window: merged copy fully
  * written to `<live>.tmp/batch=<foldId>` → marker created → folded
  * sources (id ≤ foldId) deleted → merged renamed in → marker
  * removed. Re-running after a crash at any boundary either completes
  * the swap (marker present: tmp is authoritative) or discards the
  * incomplete tmp (no marker).
  */
object CompactSwap {
  /** Replace `$root/$name` with the completed `$root/$name.tmp`
    * compaction, installed as the `batch=compacted` partition (a
    * non-numeric partition name can never collide with — or be
    * clobbered by — a replayed stream batch id).
    */
  def installTmp(fs: FileSystem, root: String, name: String): Unit = {
    val live = new Path(s"$root/$name")
    val tmp = new Path(s"$root/$name.tmp")
    val dst = new Path(s"$root/$name/batch=compacted")
    fs.delete(live, true)
    fs.mkdirs(live)
    fs.rename(tmp, dst)
  }

  /** Explicitly plant the `_SUCCESS` completeness sentinel in `dir`,
    * in program order AFTER the write returned. The write-once gates
    * ([[recoverSwap]]'s tmp-complete arbitration, the finalize gates in
    * both vacuums) key on `_SUCCESS`; the default Hadoop committer only
    * writes one when `mapreduce.fileoutputcommitter.marksuccessfuljobs`
    * is true — disabled under common cloud committers, which would make
    * every gate read "incomplete" forever and (for the finalize gates)
    * recompute a finalized aggregate from live rows the compaction
    * already dropped. So completeness is asserted here, never inferred
    * from committer config (the same move as ExactlyOnceSink's own
    * marker). Idempotent.
    */
  def ensureSuccess(fs: FileSystem, dir: Path): Unit = {
    val s = new Path(dir, "_SUCCESS")
    if (!fs.exists(s)) fs.create(s, true).close()
  }

  /** Start-of-vacuum crash recovery — see the module scaladoc. */
  def recoverSwap(fs: FileSystem, root: String, name: String): Unit = {
    val tmp = new Path(s"$root/$name.tmp")
    if (fs.exists(tmp)) {
      if (fs.exists(new Path(tmp, "_SUCCESS")))
        installTmp(fs, root, name)
      else fs.delete(tmp, true)
    }
  }

  /** Crash-recoverable PARTIAL FOLD of a `batch=<id>`-partitioned state
    * dir (the `.SWAP`-marker protocol — module scaladoc): every
    * partition strictly below the newest folds into the single
    * partition `merged(foldedParts)` writes; fewer than 3 partitions is
    * a no-op (nothing worth folding below the newest). Also performs
    * the recovery step when a previous fold crashed, so callers just
    * invoke it — no separate recover entry point.
    */
  def foldCompact(spark: SparkSession, live: String)(
      merged: Seq[String] => DataFrame): Unit = {
    val fs = new Path(live)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def path(s: String) = new Path(s)
    def idOf(p: String) = p.split("batch=").last.toLong
    def parts(root: String) =
      IncrementalDedupStream.parts(spark, root, -1L)
    val tmp = live + ".tmp"
    val marker = path(live + ".SWAP")

    // marker present ⇒ the tmp merged copy is authoritative: finish the
    // crashed swap (idempotent — deletes already-deleted sources, then
    // renames). An EMPTY tmp under a marker means the crash fell
    // between the rename and the marker delete: only cleanup remains.
    def finishSwap(): Unit = {
      val tmpParts = parts(tmp)
      if (tmpParts.isEmpty) {
        fs.delete(marker, false)
        if (fs.exists(path(tmp))) fs.delete(path(tmp), true)
        return
      }
      val mergedPart = tmpParts.head
      val foldId = idOf(mergedPart)
      parts(live).filter(idOf(_) <= foldId)
        .foreach(p => fs.delete(path(p), true))
      fs.rename(path(mergedPart), path(s"$live/batch=$foldId"))
      fs.delete(marker, false)
      fs.delete(path(tmp), true)
    }

    if (fs.exists(marker)) { finishSwap(); return }
    if (fs.exists(path(tmp))) fs.delete(path(tmp), true) // half-write
    val ps = parts(live)
    if (ps.size < 3) return
    val lastId = ps.map(idOf).max
    val fold = ps.filter(idOf(_) < lastId)
    val foldId = fold.map(idOf).max
    // localCheckpoint truncates the merged frame's lineage off the
    // source partitions BEFORE the destructive window opens — the
    // write must never lazily re-list files the finish step deletes
    merged(fold).localCheckpoint(true)
      .write.mode("overwrite").parquet(s"$tmp/batch=$foldId")
    fs.create(marker, true).close()
    finishSwap()
  }
}
