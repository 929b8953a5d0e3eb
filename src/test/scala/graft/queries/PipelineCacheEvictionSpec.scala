package graft.queries

import graft.SparkSpec

/** Pins the clusterCache EVICTION contract: entries must not outlive
  * the SparkContext their frames' lineage lives in (pre-r10 they were
  * pinned for the JVM's life — a slow leak in long-lived services).
  *
  * This suite STOPS the shared SparkContext in its final test. That is
  * safe here because `Test / parallelExecution := false` (suites run
  * sequentially in the forked JVM) and every suite's SparkSpec session
  * is a per-suite `lazy val getOrCreate` — the next suite to touch
  * Spark transparently builds a fresh context.
  */
class PipelineCacheEvictionSpec extends SparkSpec {

  test("clusterCache entries are evicted when the SparkContext stops " +
      "(eviction listener fires before stop() returns)") {
    val sfDir = "/root/testdata/sf0.001"
    val uuid = org.apache.spark.sql.GraftColumnBridge.sessionUUID(spark)
    PipelineQueries.dedupClusters(spark, sfDir)
    assert(PipelineQueries.cachedClusterKeys.contains((uuid, sfDir)),
      "computing dedupClusters must populate the session's cache slot")

    // a sibling session on the same context gets its own slot — both
    // must go when the context ends, whichever session created them
    val sibling = spark.newSession()
    val sibUuid = org.apache.spark.sql.GraftColumnBridge.sessionUUID(sibling)
    assert(sibUuid != uuid)
    PipelineQueries.dedupClusters(sibling, sfDir)
    assert(PipelineQueries.cachedClusterKeys.contains((sibUuid, sfDir)))

    spark.stop() // SparkContext.stop drains the listener bus
    assert(PipelineQueries.cachedClusterKeys.isEmpty,
      "applicationEnd must clear every cached cluster frame " +
        "(their lineage died with the context)")
  }
}
