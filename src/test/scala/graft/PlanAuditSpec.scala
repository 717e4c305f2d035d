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
}
