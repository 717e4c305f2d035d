package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal transaction-log table format: the ACID read path of a
  * 100-TB lakehouse (Delta/Iceberg-shaped, implemented from the
  * published protocol idea — an ordered log of add/remove file
  * actions whose replay defines each snapshot).
  *
  * Layout under `root`:
  * {{{
  *   _log/00000000.json      one commit per version, one action per
  *   _log/00000001.json      line: {"op":"add"|"remove","file":"<rel>"}
  *   <data dirs/files>       parquet written by any engine
  * }}}
  *
  * Why this scales: the LOG is the only thing replayed — O(commits)
  * driver-side work (the documented bounded-artifact convention; real
  * systems checkpoint the log, same contract) — while the DATA is
  * never listed by directory walk at all. Snapshot isolation and time
  * travel both fall out of replaying a version prefix: readers pin a
  * version and are immune to concurrent appends; `VERSION AS OF n` is
  * the same replay stopped early. A remove is metadata-only — deletes
  * and compactions publish rewritten files and retract the old ones
  * without touching readers of earlier versions.
  *
  * Commit publication is atomic-rename of a staged file (the same
  * object-store discipline as the q170 exactly-once sink): a log
  * version is either fully visible or absent, never partial.
  *
  * reference: the reference refreshes whole tables in place
  * (src/ETL_OSM/loader.py full-reload transaction); this is that
  * operation's lake-scale form — publish a new snapshot, never
  * rewrite in place.
  */
object TxnLog {

  private def logDir(root: String): Path = Paths.get(root, "_log")

  private def versionFile(root: String, v: Long): Path =
    logDir(root).resolve(f"$v%08d.json")

  /** Atomically publish commit `version`: stage the action file, then
    * rename into the log. Fails loudly if the version already exists
    * (optimistic concurrency — the loser of a commit race must
    * re-replay and retry, not overwrite). */
  def commit(root: String, version: Long,
             adds: Seq[String], removes: Seq[String] = Nil): Unit = {
    Files.createDirectories(logDir(root))
    val target = versionFile(root, version)
    require(!Files.exists(target),
      s"txn log version $version already committed at $target")
    val body = (removes.map(f => s"""{"op":"remove","file":"$f"}""") ++
      adds.map(f => s"""{"op":"add","file":"$f"}"""))
      .mkString("", "\n", "\n")
    val stage = logDir(root).resolve(f".stage_$version%08d")
    Files.write(stage, body.getBytes(StandardCharsets.UTF_8))
    Files.move(stage, target, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Replay the log up to and including `asOf` (or the latest version
    * when None): returns (version read, live file set in first-added
    * order). Contiguity and referential integrity are REQUIREd — a
    * gap or a remove of an untracked file means a corrupted log, and
    * that must fail, not silently skip. */
  def liveFiles(root: String, asOf: Option[Long] = None): (Long, Seq[String]) = {
    val dir = logDir(root)
    require(Files.isDirectory(dir), s"no transaction log under $root")
    val committed: Seq[Long] = {
      val s = Files.list(dir)
      try {
        val names = scala.collection.mutable.ArrayBuffer.empty[Long]
        s.forEach { p =>
          val n = p.getFileName.toString
          if (n.endsWith(".json")) names += n.stripSuffix(".json").toLong
        }
        names.toSeq.sorted
      } finally s.close()
    }
    require(committed.nonEmpty, s"empty transaction log under $root")
    require(committed.zipWithIndex.forall { case (v, i) => v == i },
      s"non-contiguous txn log versions $committed under $root")
    val readTo = asOf.getOrElse(committed.last)
    require(committed.contains(readTo),
      s"version $readTo not in txn log (have 0..${committed.last})")
    // first-added order kept stable so snapshot row order is
    // reproducible run to run (LinkedHashSet)
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    (0L to readTo).foreach { v =>
      Files.readAllLines(versionFile(root, v)).forEach { line =>
        if (line.nonEmpty) {
          // the log is engine-authored with the fixed two-field shape
          // above; parse positionally and fail loudly on anything else
          val m = """\{"op":"(add|remove)","file":"([^"]+)"\}""".r
          line match {
            case m("add", f) =>
              require(live.add(f), s"double add of $f at version $v")
            case m("remove", f) =>
              require(live.remove(f), s"remove of untracked $f at version $v")
            case other =>
              sys.error(s"unparseable txn log line at version $v: $other")
          }
        }
      }
    }
    (readTo, live.toSeq.map(f => Paths.get(root, f).toString))
  }

  /** Snapshot read: replay to `asOf` (latest when None), scan exactly
    * the live files. No directory listing of the data tree ever
    * happens — the log IS the file manifest, which is what keeps a
    * million-file table readable. */
  def snapshot(spark: SparkSession, root: String,
               asOf: Option[Long] = None): DataFrame = {
    val (_, files) = liveFiles(root, asOf)
    require(files.nonEmpty, s"snapshot of $root has no live files")
    spark.read.parquet(files: _*)
  }
}
