package graft

/** CI gate for plan quality: the full registry must plan with zero
  * cartesian products and zero UNDOCUMENTED broadcast-nested-loop
  * joins (the documented ones are small-broadcast-side by
  * construction — see PlanAudit.intendedCross). A new query or a
  * refactor that silently degrades a join to a cartesian now fails
  * `sbt test` instead of waiting for an ad-hoc audit run. */
class PlanAuditSpec extends SparkSpec {

  test("no registry query plans a cartesian or undocumented nested-loop join") {
    val results = graft.util.PlanAudit.audit(spark, sf001)
    assert(results.size == graft.queries.Registry.all.size)
    val flagged = results.filter(_.flag.nonEmpty)
    assert(flagged.isEmpty,
      flagged.map(a => s"${a.name}: ${a.flag}").mkString("\n"))
  }

  private def exchanges(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, sf001)
    df.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("Exchange "))
      .map(_.dropWhile(c => !c.isLetter)).toSeq
  }

  test("q193's WET chain stays map-shaped: no data-dependent shuffle") {
    // exactly the widen repartition (round-robin) and the output
    // sort's range partitioning — a refactor that sneaks a join or
    // aggregate exchange into the extraction chain fails here
    val ex = exchanges("q193_wet_extract")
    assert(ex.size == 2, ex.mkString("\n"))
    assert(ex.count(_.toLowerCase.contains("rangepartitioning")) == 1,
      ex.mkString("\n"))
    assert(ex.count(_.toLowerCase.contains("roundrobin")) == 1,
      ex.mkString("\n"))
  }

  test("q176's change feed nets in ONE wide shuffle") {
    // one hash exchange for the full-row netting aggregate, one for
    // the 2-row verdict aggregate, one range sort — the exceptAll
    // form this replaced planned two wide shuffles over both sides
    val ex = exchanges("q176_change_feed")
    assert(ex.count(_.contains("hashpartitioning")) <= 2, ex.mkString("\n"))
  }
}
