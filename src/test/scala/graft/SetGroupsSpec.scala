package graft

import graft.operators.SetGroups
import org.apache.spark.sql.functions._

/** Pins for the round-14 identical-set group collapse in the
  * DISTRIBUTED prefix-filter family (q133/q143/q165). The sf0.001/
  * sf0.01 corpora are duplicate-free, so the standing
  * LocalExactParitySpec pins never engage the collapse — these do,
  * on a replicated-documents fixture (the adversarial case the 30×
  * sweep hit: dup² candidate pairs spilled ~78 GB on q133 before the
  * collapse). Parity target is the one-task LocalExact kernel, which
  * is oracle-pinned and duplication-insensitive.
  */
class SetGroupsSpec extends SparkSpec {

  test("collapse gate: duplicate-free frame returns None") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, Array(10L, 20L), 2L),
      (2L, Array(10L, 30L), 2L),
      (3L, Array(40L), 1L)).toDF("doc_id", "arr", "sz")
    assert(SetGroups.collapse(docs, "doc_id", Seq("arr", "sz")).isEmpty)
  }

  test("collapse: min-id reps, full membership, key columns preserved") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (5L, Array(10L, 20L), 2L), (3L, Array(10L, 20L), 2L),
      (9L, Array(10L, 20L), 2L),                       // g{3,5,9}
      (7L, Array(10L, 30L), 2L),                       // singleton
      (2L, Array.empty[Long], 0L), (8L, Array.empty[Long], 0L)) // empty g
      .toDF("doc_id", "arr", "sz")
    val Some((reps, mem)) =
      SetGroups.collapse(docs, "doc_id", Seq("arr", "sz"))
    val repRows = reps.collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSeq, r.getLong(2))).toSet
    assert(repRows == Set((3L, Seq(10L, 20L), 2L), (7L, Seq(10L, 30L), 2L),
      (2L, Seq(), 0L)))
    val memRows = mem.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(memRows == Set((3L, 3L), (3L, 5L), (3L, 9L), (7L, 7L),
      (2L, 2L), (2L, 8L)))
  }

  // ---- query-level parity on a mass-duplicate corpus ----

  private lazy val dupDir: String = {
    val out = java.nio.file.Files
      .createTempDirectory("setgroups_fixture").toString
    // 5× replicated documents: every text appears five times under
    // distinct doc_ids — countDistinct(arr) < count, so the collapse
    // engages on the forced-distributed path
    graft.util.ScaleTrial.replicate(spark, sf001, out,
      replicas = 5, tables = Seq("documents"))
    out
  }

  private def bothPaths(name: String): Unit = {
    assume(new java.io.File(sf001).isDirectory, s"$sf001 not present")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val q = graft.queries.Registry.byName(name)
    spark.conf.unset("spark.graft.localExactMaxRows")
    val local = q.run(spark, dupDir).collect().map(_.toString).toSeq
    spark.conf.set("spark.graft.localExactMaxRows", "0")
    try {
      val collapsed = q.run(spark, dupDir).collect().map(_.toString).toSeq
      assert(local == collapsed,
        s"$name: collapsed distributed plan != one-task exact kernel")
      assert(local.nonEmpty, s"$name returned no rows on the dup fixture")
    } finally spark.conf.unset("spark.graft.localExactMaxRows")
  }

  test("q133 all-pairs: collapsed Bayardo join equals exact kernel at 5× dup") {
    bothPaths("q133_allpairs_jaccard")
  }

  test("q143 containment: collapsed directed join equals exact kernel at 5× dup") {
    bothPaths("q143_containment_join")
  }

  test("q165 incremental: collapsed oriented join equals exact kernel at 5× dup") {
    bothPaths("q165_incremental_dedup")
  }
}
