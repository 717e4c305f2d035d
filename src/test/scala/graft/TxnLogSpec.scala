package graft

import graft.operators.TxnLog
import org.apache.spark.sql.functions._

/** Transaction-log table format (q174's engine): commit atomicity,
  * snapshot replay, time travel, optimistic concurrency, and the
  * fail-loud corruption contracts. */
class TxnLogSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String = {
    val root = java.nio.file.Files.createTempDirectory("graft_txn").toString
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.parquet(s"$root/f0")
    Seq((3L, "c")).toDF("k", "v").write.parquet(s"$root/f1")
    Seq((2L, "b2")).toDF("k", "v").write.parquet(s"$root/f2")
    root
  }

  test("snapshot replay: latest sees adds minus removes; time travel pins a prefix") {
    val root = freshTable()
    TxnLog.commit(root, 0, adds = Seq("f0"))
    TxnLog.commit(root, 1, adds = Seq("f1"))
    // copy-on-write update of k=2: publish f2, retract f0's successor
    TxnLog.commit(root, 2, adds = Seq("f2"), removes = Seq("f0"))

    val (vLatest, latest) = TxnLog.liveFiles(root, None)
    assert(vLatest == 2L)
    assert(latest.map(_.split('/').last).toSet == Set("f1", "f2"))

    // each version is a stable, independent snapshot
    assert(TxnLog.snapshot(spark, root, Some(0)).as[(Long, String)]
      .collect().toSet == Set((1L, "a"), (2L, "b")))
    assert(TxnLog.snapshot(spark, root, Some(1)).as[(Long, String)]
      .collect().toSet == Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(TxnLog.snapshot(spark, root, None).as[(Long, String)]
      .collect().toSet == Set((3L, "c"), (2L, "b2")))
  }

  test("commit is write-once: a version collision fails instead of overwriting") {
    val root = freshTable()
    TxnLog.commit(root, 0, adds = Seq("f0"))
    val e = intercept[IllegalArgumentException] {
      TxnLog.commit(root, 0, adds = Seq("f1"))
    }
    assert(e.getMessage.contains("already committed"))
    // the loser's attempt must not have corrupted the winner
    val (_, live) = TxnLog.liveFiles(root, None)
    assert(live.map(_.split('/').last) == Seq("f0"))
  }

  test("N racing committers of one version: exactly one wins, content intact") {
    val root = freshTable()
    val n = 16
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val losses = new java.util.concurrent.atomic.AtomicInteger(0)
    try {
      val futures = (0 until n).map { i =>
        pool.submit(new Runnable {
          def run(): Unit = {
            gate.await()
            try { TxnLog.commit(root, 0, adds = Seq(s"w$i")); wins.incrementAndGet() }
            catch { case _: IllegalArgumentException => losses.incrementAndGet() }
          }
        })
      }
      gate.countDown() // release all racers at once
      futures.foreach(_.get())
    } finally pool.shutdown()
    assert(wins.get() == 1 && losses.get() == n - 1,
      s"wins=${wins.get()} losses=${losses.get()}")
    // the winner's commit is whole and parseable, and names one file
    val (_, live) = TxnLog.liveFiles(root, None)
    assert(live.size == 1 && live.head.split('/').last.startsWith("w"))
    // no stage litter left behind
    val leftovers = new java.io.File(s"$root/_log").listFiles()
      .map(_.getName).filter(_.startsWith(".stage"))
    assert(leftovers.isEmpty, s"stage litter: ${leftovers.toSeq}")
  }

  test("corrupted logs fail loudly: version gap, remove-of-untracked, double add") {
    val root = freshTable()
    TxnLog.commit(root, 0, adds = Seq("f0"))
    TxnLog.commit(root, 2, adds = Seq("f1")) // gap: no v1
    assert(intercept[IllegalArgumentException] {
      TxnLog.liveFiles(root, None)
    }.getMessage.contains("non-contiguous"))

    val root2 = freshTable()
    TxnLog.commit(root2, 0, adds = Seq("f0"))
    TxnLog.commit(root2, 1, removes = Seq("f9"), adds = Nil)
    assert(intercept[IllegalArgumentException] {
      TxnLog.liveFiles(root2, None)
    }.getMessage.contains("untracked"))

    val root3 = freshTable()
    TxnLog.commit(root3, 0, adds = Seq("f0"))
    TxnLog.commit(root3, 1, adds = Seq("f0"))
    assert(intercept[IllegalArgumentException] {
      TxnLog.liveFiles(root3, None)
    }.getMessage.contains("double add"))
  }

  test("time travel to an unknown version fails instead of reading latest") {
    val root = freshTable()
    TxnLog.commit(root, 0, adds = Seq("f0"))
    assert(intercept[IllegalArgumentException] {
      TxnLog.liveFiles(root, Some(5))
    }.getMessage.contains("not in txn log"))
  }

  test("stats-pruned read skips non-intersecting files, keeps stat-less files") {
    val root = java.nio.file.Files.createTempDirectory("graft_txn_st").toString
    Seq((1L, "a"), (5L, "b")).toDF("k", "v").write.parquet(s"$root/lo")
    Seq((10L, "c"), (20L, "d")).toDF("k", "v").write.parquet(s"$root/hi")
    Seq((100L, "e")).toDF("k", "v").write.parquet(s"$root/nostat")
    TxnLog.commitFiles(root, 0, adds = Seq(
      TxnLog.AddFile("lo", Map("k" -> (1L, 5L))),
      TxnLog.AddFile("hi", Map("k" -> (10L, 20L))),
      TxnLog.AddFile("nostat"))) // no stats → must be read, never skipped
    val (df, read, total) = TxnLog.prunedSnapshot(spark, root, "k", 8L, 30L)
    assert(total == 3 && read == 2) // 'lo' skipped; 'nostat' kept
    assert(df.filter(col("k").between(8, 30)).as[(Long, String)]
      .collect().toSet == Set((10L, "c"), (20L, "d")))
    // stats survive a round trip through the log verbatim
    val (_, adds) = TxnLog.liveAdds(root, None)
    assert(adds.find(_.file == "hi").get.stats == Map("k" -> (10L, 20L)))
    // a range beyond every stat still keeps the stat-less file (it
    // could hold anything) — skipping must never drop a possible match
    val (_, readFar, _) = TxnLog.prunedSnapshot(spark, root, "k", 1000L, 2000L)
    assert(readFar == 1)
    // on a fully-stats'd table the same range fails loudly rather
    // than scanning zero files
    val root2 = java.nio.file.Files.createTempDirectory("graft_txn_st2").toString
    Seq((1L, "a")).toDF("k", "v").write.parquet(s"$root2/only")
    TxnLog.commitFiles(root2, 0,
      adds = Seq(TxnLog.AddFile("only", Map("k" -> (1L, 1L)))))
    assert(intercept[IllegalArgumentException] {
      TxnLog.prunedSnapshot(spark, root2, "k", 1000L, 2000L)
    }.getMessage.contains("prunes every file"))
  }

  test("change feed is the churn-bounded log diff; add+retract inside the range cancels") {
    val root = freshTable()
    TxnLog.commit(root, 0, adds = Seq("f0"))
    TxnLog.commit(root, 1, adds = Seq("f1"))          // transient file
    TxnLog.commit(root, 2, adds = Seq("f2"), removes = Seq("f1", "f0"))
    val (ins, del) = TxnLog.changes(root, 0, 2)
    assert(ins.map(_.split('/').last) == Seq("f2"))
    assert(del.map(_.split('/').last) == Seq("f0"))   // f1 cancelled out
    assert(intercept[IllegalArgumentException] {
      TxnLog.changes(root, 2, 0)
    }.getMessage.contains("backwards"))
  }

  test("vacuumable lists only files no retained version can still read") {
    val root = freshTable()
    TxnLog.commit(root, 0, adds = Seq("f0"))
    TxnLog.commit(root, 1, adds = Seq("f1"), removes = Seq("f0"))
    TxnLog.commit(root, 2, adds = Seq("f2"), removes = Seq("f1"))
    // retaining v1+: f0 (dropped at v1, dead in v1 and v2) is deletable;
    // f1 is still live AT v1, so a v1 reader needs it
    assert(TxnLog.vacuumable(root, 1).map(_.split('/').last) == Seq("f0"))
    // retaining v2 only: f0 and f1 both deletable
    assert(TxnLog.vacuumable(root, 2).map(_.split('/').last).sorted ==
      Seq("f0", "f1"))
    // retaining everything: nothing deletable
    assert(TxnLog.vacuumable(root, 0).isEmpty)
  }

  test("checkpoint is a pure replay shortcut: identical state at every version, history intact") {
    val root = freshTable()
    TxnLog.commit(root, 0, adds = Seq("f0"),
      removes = Nil)
    TxnLog.commitFiles(root, 1,
      adds = Seq(TxnLog.AddFile("f1", Map("k" -> (3L, 3L)))))
    TxnLog.commit(root, 2, adds = Seq("f2"), removes = Seq("f0"))
    // record the ground truth BEFORE any checkpoint exists
    val before = (0L to 2L).map(v => TxnLog.liveAdds(root, Some(v)))
    TxnLog.checkpoint(root, 1)
    TxnLog.checkpoint(root, 1) // idempotent
    // every version replays identically (stats included): versions > 1
    // go through the checkpoint + tail, versions ≤ 1 use it or the raw
    // prefix — all must equal the pre-checkpoint ground truth
    val after = (0L to 2L).map(v => TxnLog.liveAdds(root, Some(v)))
    assert(after == before, s"checkpoint changed replay: $before -> $after")
    assert(after(1)._2.find(_.file == "f1").get.stats == Map("k" -> (3L, 3L)))
    // appended commits replay from the checkpoint without rereading v0
    TxnLog.commit(root, 3, adds = Seq("f9999"), removes = Seq("f1"))
    val (_, tail) = TxnLog.liveFiles(root, None)
    assert(tail.map(_.split('/').last).toSet == Set("f2", "f9999"))
  }

  test("snapshot scan reads exactly the live files (no directory listing of data)") {
    val root = freshTable()
    TxnLog.commit(root, 0, adds = Seq("f0", "f1"))
    TxnLog.commit(root, 1, adds = Seq("f2"), removes = Seq("f0"))
    // f0 still exists on disk (readers of v0 may be mid-scan) but the
    // v1 snapshot must not see its rows
    assert(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(root, "f0")))
    val rows = TxnLog.snapshot(spark, root, None)
      .as[(Long, String)].collect().toSet
    assert(rows == Set((3L, "c"), (2L, "b2")))
  }
}
