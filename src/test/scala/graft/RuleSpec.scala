package graft

import graft.functions.DifflibRatio
import graft.plans.FuzzyPrefilterRule
import org.apache.spark.sql.functions._

class RuleSpec extends SparkSpec {
  import spark.implicits._

  test("fuzzy prefilter rule injects the length bound and preserves results") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ FuzzyPrefilterRule
    try {
      // a file source so the optimizer can't constant-fold the filter away
      val part = graft.util.Tables(spark, sf001, "part")
      def fuzzy = part.filter(
        DifflibRatio(translate(col("p_brand"), "#", "-"), lit("Brand#13")) >= 0.85)
      val optimized = fuzzy.queryExecution.optimizedPlan.toString
      assert(optimized.contains("length("), s"no length bound injected:\n$optimized")
      // only the exact brand survives 0.85 (ratio('Brand-13','Brand#13')=.875;
      // any other digit pair scores .75)
      val expected = part.filter(col("p_brand") === "Brand#13").count()
      assert(expected > 0 && fuzzy.count() == expected)

      // without the rule: same results (the rule is purely a speedup)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == FuzzyPrefilterRule)
      assert(fuzzy.count() == expected)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == FuzzyPrefilterRule)
    }
  }
}
