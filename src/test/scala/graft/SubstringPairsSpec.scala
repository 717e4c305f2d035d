package graft

import graft.queries.Registry
import org.apache.spark.sql.functions._

/** Pins q151's boilerplate-cap semantics on a constructed hot-window
  * corpus — the canonical data's max window df is 3, so the df ≤ 50
  * exclusion path never fires there and only this spec exercises it.
  */
class SubstringPairsSpec extends SparkSpec {

  test("q151 excludes pairs that share only a boilerplate window " +
    "(df > 50) and keeps exact rare-window pairs") {
    import spark.implicits._
    val common = (1 to 8).map(i => s"c$i").mkString(" ")
    // 60 docs all containing the same 8-token window (df = 60 > 50),
    // otherwise pairwise-disjoint → the cap must yield ZERO pairs
    val boiler = (1L to 60L).map(i => (i, s"$common u${i}a u${i}b"))
    // two docs with identical 10-token text → 3 windows, each df = 2,
    // n_shared = 3 → exactly one pair covering 100% of both
    val dupText = (1 to 10).map(i => s"d$i").mkString(" ")
    val docs = boiler ++ Seq((100L, dupText), (101L, dupText))
    val dir = java.nio.file.Files.createTempDirectory("q151spec").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val rows = Registry.byName("q151_substring_pairs").run(spark, dir)
      .collect().toSeq
    assert(rows.map(r => (r.getLong(0), r.getLong(1))) === Seq((100L, 101L)))
    val r = rows.head
    assert(r.getLong(2) === 3L) // n_shared: all 3 windows
    assert(r.getLong(3) === 3L && r.getLong(4) === 3L) // nw_a, nw_b
    assert(r.getLong(5) === 10000L) // share_bp: full coverage
  }

  test("q151 pair counting is invariant under input partitioning") {
    val base = Registry.byName("q151_substring_pairs").run(spark, sf001)
      .collect().toSeq.map(_.toSeq)
    assert(base.nonEmpty) // sf0.001 contains duplicated documents
    // the kernel itself, re-run (localCheckpoint + distinct inside):
    // same rows regardless of session state / partition layout
    val again = Registry.byName("q151_substring_pairs").run(spark, sf001)
      .collect().toSeq.map(_.toSeq)
    assert(again === base)
  }
}
