package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The export sink's four contracts: training order on read (per-file
  * pos ascending with zero read-time sort), partition pruning for
  * shard-restricted reads, re-export determinism (content-keyed), and
  * completeness. */
class CorpusExportSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def withExport(f: String => Unit): Unit = {
    val dir = Files.createTempDirectory("corpus_export").toFile
    try f(dir.getAbsolutePath)
    finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("the export frame moves document bytes exactly once: one " +
      "Exchange, no Join, and its manifest equals the shuffle_shard " +
      "query row-for-row") {
    val frame = CorpusExport.exportFrame(spark, sfDir)
    val plan = frame.queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1,
      "expected exactly one exchange (the rank window's):\n" + plan)
    assert(!plan.contains("Join"), "export frame joins:\n" + plan)
    val manifest = frame
      .select(col("doc_id"), col("shard"), col("pos")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val query = graft.queries.PipelineQueries.shuffleShard(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(manifest == query,
      "export assignment diverged from the shuffle_shard query")
  }

  test("every shard file reads back in training order without a sort") {
    withExport { out =>
      CorpusExport.exportShards(spark, sfDir, out)
      val shardDirs = new java.io.File(out).listFiles()
        .filter(_.getName.startsWith("shard="))
      assert(shardDirs.length == graft.queries.PipelineQueries.ShuffleShards)
      shardDirs.foreach { d =>
        d.listFiles().filter(_.getName.endsWith(".parquet")).foreach { pf =>
          // a single file read by a single task preserves file order
          val pos = spark.read.parquet(pf.getAbsolutePath)
            .coalesce(1).select("pos").collect().map(_.getLong(0))
          assert(pos.nonEmpty, s"${d.getName} empty")
          assert(pos.sameElements(pos.sorted),
            s"${d.getName}/${pf.getName} not in training order")
        }
      }
    }
  }

  test("a shard-restricted read prunes at the partition level") {
    withExport { out =>
      CorpusExport.exportShards(spark, sfDir, out)
      val one = spark.read.parquet(out).filter(col("shard") === 3)
      val plan = one.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [isnotnull(shard"),
        "shard filter did not reach PartitionFilters:\n" + plan)
      assert(one.select("shard").distinct().collect()
        .map(_.getInt(0)).toSeq == Seq(3))
    }
  }

  test("re-export is byte-deterministic in assignment (content-keyed " +
      "manifest) and complete") {
    withExport { out1 =>
      withExport { out2 =>
        val m1 = CorpusExport.exportShards(spark, sfDir, out1).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        val m2 = CorpusExport.exportShards(spark, sfDir, out2).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        assert(m1 == m2, "re-export changed the assignment")
        val back = spark.read.parquet(out1)
        assert(back.count() == 500)
        val ids = back.select("doc_id").collect().map(_.getLong(0)).toSet
        assert(ids == (0L until 500L).toSet, "doc set changed in export")
        // exported rows carry the document payload, not just the manifest
        assert(back.columns.contains("text"))
      }
    }
  }
}
