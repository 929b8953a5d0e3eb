package graft

import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._

/** Pins [[GraftColumnBridge.localCheckpointHashPartitioned]] — the
  * partitioning-preserving checkpoint under the iterative graph
  * engines: identical rows to a plain localCheckpoint, a truthful
  * recorded partitioning (keyed aggregates AND independently shuffled
  * co-partition joins both plan no extra Exchange and stay correct),
  * and the releaseTruncated handle contract. */
class PartitionedCheckpointSpec extends SparkSpec {
  import spark.implicits._

  private def exchanges(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.toString
      .linesIterator.count(l => l.contains("Exchange") &&
        !l.contains("BroadcastExchange"))

  test("rows == plain localCheckpoint; downstream keyed agg plans NO " +
      "shuffle Exchange over the preserved partitioning") {
    val df = (1 to 5000).map(i => (i % 321L, i.toLong)).toDF("k", "v")
    val pinned = GraftColumnBridge.localCheckpointHashPartitioned(df, Seq("k"))
    val plain = df.localCheckpoint()
    assert(pinned.orderBy("k", "v").collect().toSeq ==
      plain.orderBy("k", "v").collect().toSeq)
    val agg = pinned.groupBy("k").agg(sum("v").as("s"))
    assert(exchanges(agg) == 0,
      s"keyed agg over the pinned snapshot must not re-shuffle:\n" +
        agg.queryExecution.executedPlan)
    val plainAgg = plain.groupBy("k").agg(sum("v").as("s"))
    assert(exchanges(plainAgg) == 1,
      "control: the plain checkpoint pays the agg exchange")
    assert(agg.orderBy("k").collect().toSeq ==
      plainAgg.orderBy("k").collect().toSeq)
    graft.ops.DedupOps.releaseTruncated(pinned)
    graft.ops.DedupOps.releaseTruncated(plain)
  }

  test("the recorded partitioning is physically TRUE: an independently " +
      "shuffled co-partition join aligns (no Exchange on the pinned " +
      "side, results == the unpinned join)") {
    val left = (1 to 4000).map(i => (i % 173L, i.toLong)).toDF("k", "a")
    val right = (1 to 800).map(i => (i % 173L, -i.toLong)).toDF("k", "b")
    val pinned = GraftColumnBridge.localCheckpointHashPartitioned(left, Seq("k"))
    val n = spark.sessionState.conf.numShufflePartitions
    // force a shuffled (non-broadcast) join against a fresh exchange
    val rightRep = right.repartition(n, col("k"))
    val joined = pinned.join(rightRep.hint("shuffle_merge"), "k")
      .groupBy("k").agg(count(lit(1)).as("c"), sum("a").as("sa"),
        sum("b").as("sb"))
    val expected = left.join(right, "k")
      .groupBy("k").agg(count(lit(1)).as("c"), sum("a").as("sa"),
        sum("b").as("sb"))
    assert(joined.orderBy("k").collect().toSeq ==
      expected.orderBy("k").collect().toSeq,
      "co-partition alignment must reproduce the plain join exactly")
    // the pinned side must not have been re-shuffled: exactly ONE
    // shuffle exchange in the whole plan (the right side's)
    assert(exchanges(joined) == 1,
      s"expected only the right-side exchange:\n" +
        joined.queryExecution.executedPlan)
    graft.ops.DedupOps.releaseTruncated(pinned)
  }

  test("preserves the per-round shape the graph engines rely on: " +
      "BroadcastHashJoin + Project keep the partitioning, so the " +
      "round aggregate is exchange-free") {
    val edges = (1 to 3000).map(i => (i % 97L, (i * 7) % 89L))
      .toDF("src", "dst")
    val pinned = GraftColumnBridge
      .localCheckpointHashPartitioned(edges, Seq("dst"))
    val state = (0L to 96L).map(k => (k, k * 10)).toDF("node", "rank")
    val round = pinned
      .join(broadcast(state), pinned("src") === state("node"))
      .select(col("dst"), col("rank"))
      .groupBy("dst").agg(sum("rank").as("s"))
    assert(exchanges(round) == 0,
      s"round aggregate must reuse the pinned partitioning:\n" +
        round.queryExecution.executedPlan)
    val control = edges.localCheckpoint()
      .join(broadcast(state), col("src") === state("node"))
      .select(col("dst"), col("rank"))
      .groupBy("dst").agg(sum("rank").as("s"))
    assert(round.orderBy("dst").collect().toSeq ==
      control.orderBy("dst").collect().toSeq)
    graft.ops.DedupOps.releaseTruncated(pinned)
  }

  test("checkpointHashPartitionedAdaptive: a small relation re-hashes " +
      "to ceil(rows/rowsPerPartition) partitions with identical rows, " +
      "a truthful narrow partitioning (keyed agg exchange-free), and " +
      "the wide snapshot released; a large-enough target keeps the " +
      "session width") {
    val df = (1 to 5000).map(i => (i % 321L, i.toLong)).toDF("k", "v")
    val n = spark.sessionState.conf.numShufflePartitions
    assume(n > 2, s"needs a session shuffle width above 2, got $n")
    // 5000 rows at 2000 rows/partition -> ceil = 3 partitions
    val narrow = graft.ops.DedupOps
      .checkpointHashPartitionedAdaptive(df, Seq("k"),
        rowsPerPartition = 2000L)
    assert(narrow.rdd.getNumPartitions == 3,
      s"expected 3 partitions, got ${narrow.rdd.getNumPartitions}")
    assert(narrow.orderBy("k", "v").collect().toSeq ==
      df.orderBy("k", "v").collect().toSeq)
    val agg = narrow.groupBy("k").agg(sum("v").as("s"))
    assert(exchanges(agg) == 0,
      s"keyed agg over the narrow snapshot must not re-shuffle:\n" +
        agg.queryExecution.executedPlan)
    assert(agg.orderBy("k").collect().toSeq ==
      df.groupBy("k").agg(sum("v").as("s")).orderBy("k").collect().toSeq)
    // at a target >= the session width the relation stays wide (the
    // at-scale identity: no second shuffle)
    val wide = graft.ops.DedupOps
      .checkpointHashPartitionedAdaptive(df, Seq("k"),
        rowsPerPartition = 1L)
    assert(wide.rdd.getNumPartitions == n,
      s"expected the session width $n, got ${wide.rdd.getNumPartitions}")
    graft.ops.DedupOps.releaseTruncated(narrow)
    graft.ops.DedupOps.releaseTruncated(wide)
  }
}
