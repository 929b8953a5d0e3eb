package graft.queries

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Proves the sub-sharded two-pass prefix-sum packing
  * ([[PipelineQueries.packSequencesShardedOf]]) is bit-identical to
  * the plain per-source cumulative window
  * ([[PipelineQueries.packSequencesOf]]) — the property that lets the
  * skew-safe form share the plain form's DuckDB oracle. */
class PackShardingSpec extends SparkSpec {
  import spark.implicits._

  private def assertSame(tokens: DataFrame, width: Long): Unit = {
    val plain = PipelineQueries.packSequencesOf(tokens)
      .select("doc_id", "source", "n_tokens", "seq_id")
      .collect().map(_.toSeq).toSet
    val sharded = PipelineQueries.packSequencesShardedOf(tokens, width)
      .collect().map(_.toSeq).toSet
    assert(plain == sharded,
      s"width=$width: ${(plain diff sharded).take(3)} vs " +
        s"${(sharded diff plain).take(3)}")
  }

  test("sharded packing equals plain packing on the real table") {
    val tokens = PipelineQueries.packSequences(spark, "/root/testdata/sf0.001")
      .select("doc_id", "source", "n_tokens") // re-derive from the query's own input columns
    Seq(1L, 7L, PipelineQueries.PackShardWidth, 100000L).foreach { w =>
      assertSame(tokens, w)
    }
  }

  test("sharded packing equals plain packing under mega-source skew, " +
      "sparse doc_ids, and zero-token docs") {
    val rnd = new scala.util.Random(11)
    // 80% of docs in one mega source (the exact case the sub-shard
    // exists for), sparse non-contiguous doc_ids, some 0-token docs
    val rows = (0 until 2000).map { _ =>
      (rnd.nextInt(1000000).toLong,
        if (rnd.nextInt(10) < 8) "mega" else s"src${rnd.nextInt(3)}",
        (if (rnd.nextInt(20) == 0) 0 else rnd.nextInt(300)).toLong)
    }.distinctBy(_._1)
    val tokens = rows.toDF("doc_id", "source", "n_tokens")
    Seq(1L, 13L, PipelineQueries.PackShardWidth, 1 << 20).foreach { w =>
      assertSame(tokens, w.toLong)
    }
  }

  test("sharded packing handles an empty frame") {
    val tokens = Seq.empty[(Long, String, Long)]
      .toDF("doc_id", "source", "n_tokens")
    assertSame(tokens, PipelineQueries.PackShardWidth)
  }

  test("sharded packing materializes the corpus scan and its " +
      "(source, bkt) exchange ONCE (offsets branch reuses, no re-scan)") {
    // a second corpus pass here would re-run the token kernel over all
    // document text just to total three tiny columns — the offsets
    // branch must reuse the main branch's exchange instead
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
    val df = PipelineQueries.packSequencesSharded(spark, "/root/testdata/sf0.001")
    df.collect() // finalize THIS DataFrame's adaptive plan
    val scans = scala.collection.mutable.Set[Int]()
    val shuffles = scala.collection.mutable.Set[Int]()
    var shuffleRefs = 0
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case r: ReusedExchangeExec => walk(r.child)
      case s: ShuffleExchangeExec =>
        shuffleRefs += 1
        shuffles += System.identityHashCode(s)
        s.children.foreach(walk)
      case f: FileSourceScanExec =>
        scans += System.identityHashCode(f)
      case other => other.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    assert(scans.size == 1,
      s"corpus scanned ${scans.size} times — offsets branch re-scans")
    // identity-distinct shuffles: the (source, bkt) exchange + the tiny
    // per-source offsets window exchange; the (source, bkt) one is
    // referenced by both branches
    assert(shuffles.size == 2,
      s"expected 2 distinct shuffles, saw ${shuffles.size}")
    assert(shuffleRefs >= 3,
      s"expected the bucket exchange referenced by both branches ($shuffleRefs refs)")
  }
}
