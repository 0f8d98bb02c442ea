package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-recoverable live-table compaction swap, shared by the ingest
  * twins that vacuum row state ([[AttributionStream]],
  * [[TransitionsStream]]): the kept rows are written to `<name>.tmp`,
  * then [[installTmp]] replaces the live dir with it. The swap is not
  * atomic, but every intermediate state is recoverable by running
  * [[recoverSwap]] at the next vacuum start, BEFORE anything reads the
  * live dirs:
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

  /** Start-of-vacuum crash recovery — see the module scaladoc. */
  def recoverSwap(fs: FileSystem, root: String, name: String): Unit = {
    val tmp = new Path(s"$root/$name.tmp")
    if (fs.exists(tmp)) {
      if (fs.exists(new Path(tmp, "_SUCCESS")))
        installTmp(fs, root, name)
      else fs.delete(tmp, true)
    }
  }
}
