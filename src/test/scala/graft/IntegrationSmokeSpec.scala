package graft

import graft.SparkSpec

/** Driver t1-gate parity: every registered query must execute end-to-end
  * on the smoke-scale testdata. Catches runtime breakage (analysis
  * errors, bad casts, missing columns) across the whole query surface. */
class IntegrationSmokeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name executes at sf0.001") {
      val n = fn(spark, sfDir).count()
      assert(n >= 0)
    }
  }

  test("entry() returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("nonempty results where the smoke data must produce them") {
    Seq("wordcount", "dataclean", "rolling_count", "flight_dist",
      "sessionize", "dedup_exact", "sim_topk", "text_langid", "mm_frames")
      .foreach { name =>
        assert(SparkEntry.queries(name)(spark, sfDir).count() > 0, name)
      }
  }
}
