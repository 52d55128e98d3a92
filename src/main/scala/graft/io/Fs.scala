package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Marker-file plumbing through Hadoop's FileSystem API, so the
  * commit-marker protocols ([[Sinks.appendOnceWriter]], the
  * materialized layouts/indexes) hold on ANY supported store —
  * HDFS, S3A, local — not just `java.io.File`'s local disk. A
  * java.io.File existence probe on an `s3a://` path silently never
  * matches: writes would succeed while readers see nothing, quietly
  * degrading the exactly-once contract. */
object Fs {

  def fs(spark: SparkSession, p: String): (FileSystem, Path) = {
    val hp = new Path(p)
    (hp.getFileSystem(spark.sparkContext.hadoopConfiguration), hp)
  }

  def exists(spark: SparkSession, p: String): Boolean = {
    val (f, hp) = fs(spark, p)
    f.exists(hp)
  }

  /** Atomically create an empty marker file (parents included). */
  def touch(spark: SparkSession, p: String): Unit = {
    val (f, hp) = fs(spark, p)
    if (!f.exists(hp)) f.create(hp, false).close()
  }

  /** Names under `dir` ending with `suffix` (empty if `dir` absent). */
  def listWithSuffix(spark: SparkSession, dir: String,
                     suffix: String): Seq[String] = {
    val (f, hp) = fs(spark, dir)
    if (!f.exists(hp)) Seq.empty
    else f.listStatus(hp).toIndexedSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(suffix))
      .map(_.getPath.getName)
  }

  /** Write a small UTF-8 text file (metadata, not data) — create-only,
    * so a concurrent duplicate write fails loudly instead of tearing. */
  def writeText(spark: SparkSession, p: String, content: String): Unit = {
    val (f, hp) = fs(spark, p)
    val out = f.create(hp, false)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  /** Write a small UTF-8 text file and PROMOTE it atomically: content
    * goes to a `.tmp` sibling first, then a single `rename` makes it
    * visible — a concurrent reader sees either the whole file or no
    * file, never a torn prefix (rename is atomic on HDFS and local
    * FS; on S3A pair this with a conditional-write layer). Duplicate
    * promotions fail via an existence pre-check: HDFS rename also
    * refuses an existing target, but the LOCAL FS delegates to
    * rename(2), which silently replaces — the pre-check restores the
    * fail-loud contract there (best-effort under a concurrent racer on
    * such stores; single-compactor by contract, like the upsert sink). */
  def writeTextAtomic(spark: SparkSession, p: String, content: String): Unit = {
    val (f, hp) = fs(spark, p)
    if (f.exists(hp))
      throw new java.io.IOException(s"refusing duplicate promotion: $p exists")
    val tmp = new Path(hp.getParent, hp.getName + ".tmp")
    val out = f.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    if (!f.rename(tmp, hp))
      throw new java.io.IOException(s"atomic promotion of $p failed (target exists?)")
  }

  /** Build-and-promote for materialized layouts (the TradeGraph /
    * PQ-index cache family): the builder writes its whole output tree
    * into a HIDDEN tmp sibling (leading-dot name — Hadoop's path filter
    * hides it from any concurrent reader's directory listing), then ONE
    * directory rename publishes it. Concurrent JVMs racing the same
    * cache path (Bench + a test run on the same testdata) each build
    * into their own tmp; exactly one rename wins, losers delete their
    * tmp and serve the winner's (complete, atomically-published)
    * output — no reader can ever observe a half-built listing, which
    * the old build-in-place `write.mode(overwrite).parquet(path)`
    * allowed (round-13 ADVICE).
    *
    * `marker` is the caller's completeness probe (a file path relative
    * to `path`, e.g. `_SUCCESS` or `assign/_SUCCESS`): a target
    * carrying the marker is COMPLETE and is never touched; a target
    * without it is a torn legacy build-in-place leftover and is
    * cleared — but only inside the NARROW window between the (long)
    * build and the rename, re-verified immediately before the delete.
    * Clearing at call-site-probe time instead would let this JVM
    * delete a cache a concurrent winner published during our build,
    * crashing its readers for our whole rebuild window (round-14
    * review catch). The tmp dir is removed on EVERY non-published
    * exit, including a throwing build, so failed runs leave no hidden
    * garbage. Worst-case race on stores whose rename moves INTO an
    * existing target (raw local FS): the loser's tmp lands nested
    * under the winner's dir — still leading-dot, still invisible to
    * readers, and both builders write identical content by
    * construction. */
  def promoteDir(spark: SparkSession, path: String, marker: String)
                (build: String => Unit): Unit = {
    val (f, hp) = fs(spark, path)
    val markerPath = new Path(hp, marker)
    if (f.exists(markerPath)) return // already published, nothing to do
    val suffix = java.util.UUID.randomUUID.toString.take(8)
    val tmp = new Path(hp.getParent, s".${hp.getName}.tmp-$suffix")
    var published = false
    try {
      build(tmp.toString)
      // a build that did not produce its own completeness marker is
      // miswired (wrong marker path, or the touch was dropped): fail at
      // the source — publishing it would put every future call into a
      // delete-and-rebuild loop over a dir that always looks torn
      if (!f.exists(new Path(tmp, marker)))
        throw new java.io.IOException(
          s"promoteDir build for $path did not write its marker '$marker'")
      // narrow publication section: re-verify right before clearing.
      // A torn target is moved ASIDE atomically rather than deleted —
      // a slow recursive delete under a racer that published between
      // the check and the clear would destroy COMPLETE data; a rename
      // merely hides it (identical content is republished micro-
      // seconds later), and the aside copy is dropped ONLY after our
      // own publication landed: if the publish rename fails (a
      // concurrent winner slipped in between the move-aside and our
      // rename), the moved-aside dir may be the only COMPLETE copy on
      // this store, so it is renamed BACK instead of deleted — an
      // unconditional delete here destroyed complete data until a
      // rebuild (round-14 ADVICE). A failed restore (winner now holds
      // the target) leaves the aside hidden; the loud no-winner check
      // below still decides the outcome from the marker.
      if (!f.exists(markerPath)) {
        val aside = new Path(hp.getParent, s".${hp.getName}.torn-$suffix")
        val movedAside = f.exists(hp) && f.rename(hp, aside)
        val cleared = movedAside || !f.exists(hp)
        if (cleared) {
          published = f.rename(tmp, hp)
          if (published) f.delete(aside, true) // redundant once ours landed
          else if (movedAside) f.rename(aside, hp) // restore, never discard
        }
        // !cleared (delete-less protocol: a failed move-aside) falls
        // through to the loud no-winner check below — renaming tmp onto
        // a surviving target would nest it invisibly on raw local FS
        // and report success over a torn cache
      }
    } finally {
      if (!published) f.delete(tmp, true) // loser or failed build
    }
    // a loser is only legitimate when a real winner's marker exists —
    // a surviving marker-less dir is NOT a winner (previously the
    // `exists(hp)` conjunct silently accepted exactly that)
    if (!published && !f.exists(markerPath))
      throw new java.io.IOException(
        s"promotion of $path failed with no published winner present")
  }

  /** Recursively delete a path if it exists (janitor passes). */
  def deleteRecursive(spark: SparkSession, p: String): Boolean = {
    val (f, hp) = fs(spark, p)
    !f.exists(hp) || f.delete(hp, true)
  }

  /** Read a small UTF-8 text file written by [[writeText]]. */
  def readText(spark: SparkSession, p: String): String = {
    val (f, hp) = fs(spark, p)
    val in = f.open(hp)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      buf.toString("UTF-8")
    } finally in.close()
  }
}
