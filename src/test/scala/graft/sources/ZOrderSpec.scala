package graft.sources

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout: kernel correctness against an independent
  * bit-string reference + per-dimension monotonicity, and the layout
  * claim MEASURED from the written parquet footers — row groups a 2-d
  * box predicate cannot skip, z-layout vs single-key layout — plus
  * read-back correctness. */
class ZOrderSpec extends SparkSpec {

  test("zInterleave matches an independent binary-string reference " +
      "and is monotone per dimension") {
    def ref(a: Long, b: Long, bits: Int): Long = {
      val as = a.toBinaryString.reverse.padTo(bits, '0').take(bits)
      val bs = b.toBinaryString.reverse.padTo(bits, '0').take(bits)
      val inter = as.zip(bs).flatMap { case (x, y) => Seq(x, y) }.mkString
      java.lang.Long.parseLong(inter.reverse, 2)
    }
    val rnd = new scala.util.Random(7L)
    (0 until 300).foreach { _ =>
      val bits = 1 + rnd.nextInt(20)
      val a = rnd.nextLong().abs % (1L << bits)
      val b = rnd.nextLong().abs % (1L << bits)
      assert(graft.functions.VectorMath.zInterleave(a, b, bits) ==
        ref(a, b, bits), s"a=$a b=$b bits=$bits")
      if (a + 1 < (1L << bits))
        assert(graft.functions.VectorMath.zInterleave(a + 1, b, bits) >
          graft.functions.VectorMath.zInterleave(a, b, bits))
      if (b + 1 < (1L << bits))
        assert(graft.functions.VectorMath.zInterleave(a, b + 1, bits) >
          graft.functions.VectorMath.zInterleave(a, b, bits))
    }
  }

  test("bits outside [1, 31] are rejected at plan build (32 would put " +
      "a dimension bit in the long sign bit and invert the sort)") {
    intercept[IllegalArgumentException] {
      graft.functions.ZInterleave(
        org.apache.spark.sql.catalyst.expressions.Literal(1L),
        org.apache.spark.sql.catalyst.expressions.Literal(1L), 32)
    }
    intercept[IllegalArgumentException] {
      graft.functions.ZInterleave(
        org.apache.spark.sql.catalyst.expressions.Literal(1L),
        org.apache.spark.sql.catalyst.expressions.Literal(1L), 0)
    }
  }

  test("empty input writes an empty dataset instead of crashing on " +
      "the null min/max row") {
    val dir = Files.createTempDirectory("zorder_empty").toFile
    try {
      val ev = graft.model.Tables.events(spark, "/root/testdata/sf0.001")
        .select(col("event_id"), col("user_id"), col("value"))
        .filter(lit(false))
      ZOrderLayout.writeZOrdered(ev, dir.getAbsolutePath,
        col("user_id"), floor(col("value")).cast("long"))
      assert(spark.read.parquet(dir.getAbsolutePath).count() == 0)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  /** Row groups the box predicate CANNOT skip, straight from the
    * parquet footers: min/max envelope of both columns intersects the
    * box. */
  private def unskippable(path: String, userLo: Long, userHi: Long,
      valLo: Double, valHi: Double): (Int, Int) = {
    val conf = spark.sessionState.newHadoopConf()
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    var total = 0
    var hit = 0
    files.foreach { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        reader.getFooter.getBlocks.asScala.foreach { block =>
          total += 1
          def stats(name: String) = block.getColumns.asScala
            .find(_.getPath.toDotString == name).get.getStatistics
          val u = stats("user_id")
          val v = stats("value")
          val uMin = u.genericGetMin.asInstanceOf[java.lang.Long].longValue
          val uMax = u.genericGetMax.asInstanceOf[java.lang.Long].longValue
          val vMin = v.genericGetMin.asInstanceOf[java.lang.Double].doubleValue
          val vMax = v.genericGetMax.asInstanceOf[java.lang.Double].doubleValue
          if (uMax >= userLo && uMin <= userHi &&
            vMax >= valLo && vMin <= valHi) hit += 1
        }
      } finally reader.close()
    }
    (hit, total)
  }

  test("z-layout skips on BOTH dimensions where the single-key layout " +
      "collapses on the non-sort dimension (measured from footers), " +
      "and reads back identically") {
    val ev = graft.model.Tables.events(spark, "/root/testdata/sf0.01")
      .select(col("event_id"), col("user_id"), col("value"))
    val zDir = Files.createTempDirectory("zorder").toFile
    val sDir = Files.createTempDirectory("singlekey").toFile
    try {
      ZOrderLayout.writeZOrdered(ev, zDir.getAbsolutePath,
        col("user_id"), floor(col("value")).cast("long"))
      ZOrderLayout.writeSorted(ev, sDir.getAbsolutePath, col("user_id"))
      val fullUser = (Long.MinValue, Long.MaxValue)
      // NegativeInfinity, NOT Double.MinValue (the smallest POSITIVE
      // double) - with MinValue an all-non-positive row group would
      // wrongly count as skippable
      val fullVal = (Double.NegativeInfinity, Double.MaxValue)
      // value-only predicate: the dimension the single-key sort does
      // NOT cover — every one of its row groups spans the full value
      // range, so NOTHING skips; the z layout must skip a majority
      val (zv, zTotal) = unskippable(zDir.getAbsolutePath,
        fullUser._1, fullUser._2, 200.0, 300.0)
      val (sv, sTotal) = unskippable(sDir.getAbsolutePath,
        fullUser._1, fullUser._2, 200.0, 300.0)
      assert(zTotal >= 8 && sTotal >= 8,
        s"need many row groups to measure pruning: z=$zTotal s=$sTotal")
      assert(sv >= sTotal - 2,
        s"single-key layout should skip (almost) nothing on its " +
          s"non-sort dim: $sv/$sTotal")
      assert(zv * 2 <= zTotal,
        s"z-layout should skip a majority on value: $zv/$zTotal")
      // user-only predicate: the single-key sort's home turf — z is
      // allowed to be worse here, but must still skip SOMETHING (the
      // documented trade: per-dim perfection exchanged for all-dims
      // adequacy)
      val (zu, _) = unskippable(zDir.getAbsolutePath,
        2L, 20L, fullVal._1, fullVal._2)
      assert(zu < zTotal, s"z-layout skipped nothing on user: $zu/$zTotal")
      // 2-d box, BOTH layouts measured (the first cut asserted
      // zb <= zv && zb <= zu, which holds for ANY layout by set
      // inclusion - the vacuous-assert class the round's reviews
      // keep catching): the honest pin is that the box prunes a
      // majority of z row groups; the single-key count rides in the
      // message (on ultra-selective solo dimensions a single-key
      // sort can legitimately tie or win the box)
      val (zb, _) = unskippable(zDir.getAbsolutePath, 2L, 20L, 200.0, 300.0)
      val (sb, _) = unskippable(sDir.getAbsolutePath, 2L, 20L, 200.0, 300.0)
      assert(zb * 2 <= zTotal,
        s"2-d box should prune a majority of z row groups: " +
          s"z $zb/$zTotal vs single-key $sb/$sTotal")
      val pred = col("user_id").between(2L, 20L) &&
        col("value").between(200.0, 300.0)
      val want = ev.filter(pred).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val got = spark.read.parquet(zDir.getAbsolutePath).filter(pred)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(got == want, "z-layout read-back diverged")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(zDir)
      org.apache.commons.io.FileUtils.deleteQuietly(sDir)
    }
  }

  /** Execute `pred` against the parquet at `path` and return (rows the
    * SCAN emitted — i.e. rows in row groups the reader could not skip,
    * before Spark's post-scan Filter — and the result set). The
    * engine-level twin of [[unskippable]]'s footer arithmetic. */
  private def scanAndCount(path: String,
      pred: org.apache.spark.sql.Column)
      : (Long, Set[(Long, Long, Double)]) = {
    val df = spark.read.parquet(path).filter(pred)
    val res = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case other => other.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
    }
    val scan = scans(df.queryExecution.executedPlan)
    assert(scan.nonEmpty, "no FileSourceScan in the executed plan")
    (scan.map(_.metrics("numOutputRows").value).sum, res)
  }

  test("the layout benefit holds in the ENGINE, not only in footer " +
      "geometry: the same value-range query scans a fraction of the " +
      "rows on the z layout that it scans on the single-key layout, " +
      "with identical results") {
    val ev = graft.model.Tables.events(spark, "/root/testdata/sf0.01")
      .select(col("event_id"), col("user_id"), col("value"))
    val total = ev.count()
    val zDir = Files.createTempDirectory("zorder_q").toFile
    val sDir = Files.createTempDirectory("singlekey_q").toFile
    try {
      ZOrderLayout.writeZOrdered(ev, zDir.getAbsolutePath,
        col("user_id"), floor(col("value")).cast("long"))
      ZOrderLayout.writeSorted(ev, sDir.getAbsolutePath, col("user_id"))
      // the value-only predicate — the dimension the single-key sort
      // does not cover, where the footer test proved the geometry
      val pred = col("value").between(200.0, 300.0)
      val (zScanned, zRes) = scanAndCount(zDir.getAbsolutePath, pred)
      val (sScanned, sRes) = scanAndCount(sDir.getAbsolutePath, pred)
      val want = ev.filter(pred).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(zRes == want && sRes == want,
        "both layouts must return identical query results")
      // single-key: every row group spans the full value range, so the
      // reader materializes (nearly) the whole table for this query
      assert(sScanned >= (total * 0.9).toLong,
        s"single-key layout should scan ~everything: $sScanned/$total")
      // z layout: the reader must actually SKIP the majority the
      // footers promised — the engine-level claim
      assert(zScanned * 2 <= sScanned,
        s"z layout must scan at most half of single-key's rows: " +
          s"z=$zScanned vs s=$sScanned of $total")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(zDir)
      org.apache.commons.io.FileUtils.deleteQuietly(sDir)
    }
  }
}
