package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-ORDER data layout over plain OSS parquet — the multi-dimensional
 * file-skipping lever Delta/Iceberg expose as OPTIMIZE ZORDER,
 * reduced to what it actually is: sort the write by a Morton
 * interleave of the clustering keys ([[graft.functions.ZInterleave]])
 * so every row group's min/max envelope is tight on EVERY clustered
 * column at once. Parquet's row-group statistics then prune a 2-d box
 * predicate (user range AND value range) that a single-key sort order
 * cannot: under sort-by-A, each row group spans the FULL range of B,
 * so the B half of the predicate skips nothing. ZOrderSpec MEASURES
 * this from the written footers themselves — row groups a box
 * predicate cannot skip, z-layout vs single-key layout — rather than
 * trusting any engine metric.
 *
 * Scale shape: `repartitionByRange` on the z key is one range
 * exchange (sampled bounds, balanced output files), then a
 * per-partition sort — no global single-partition sort; row-group
 * size is the pruning granularity knob (128 MiB default in
 * production; the spec shrinks it to get many groups from test data).
 * The z column is dropped before the write — the layout is carried
 * by ORDER, not by a stored column.
 */
object ZOrderLayout {

  /** Writes `df` z-clustered by (a, b). Each dimension is first
   *  min/max-scaled to the full `bits`-bit range (one tiny agg at
   *  write time) — WITHOUT this, dimensions of unequal cardinality
   *  interleave uselessly: a 4-bit user id against a 9-bit value
   *  leaves the z order value-major and the user envelopes full-width
   *  (measured — the first cut skipped scaling and the z layout LOST
   *  to a single-key sort even on 2-d boxes). Production ZORDER
   *  implementations make the same move with per-column range
   *  bucketing; linear min/max scaling is its skew-free core. */
  def writeZOrdered(df: DataFrame, path: String, a: Column, b: Column,
      bits: Int = 16, files: Int = 4, rowGroupBytes: Long = 16384L): Unit = {
    val zCol = "__graft_z_order_key"
    require(!df.columns.contains(zCol),
      s"input already has a $zCol column") // never silently drop data
    val top = (1L << bits) - 1
    val r = df.agg(min(a).cast("double"), max(a).cast("double"),
      min(b).cast("double"), max(b).cast("double")).head()
    if (r.isNullAt(0) || r.isNullAt(2)) {
      // empty input (or all-null keys): nothing to cluster — write as-is
      df.write.option("parquet.block.size", rowGroupBytes.toString)
        .mode("overwrite").parquet(path)
      return
    }
    def scaled(c: Column, lo: Double, hi: Double): Column =
      if (hi > lo) round((c.cast("double") - lit(lo))
        / lit(hi - lo) * lit(top.toDouble)).cast("long")
      else lit(0L)
    df.withColumn(zCol, graft.functions.native.z_interleave(
        scaled(a, r.getDouble(0), r.getDouble(1)),
        scaled(b, r.getDouble(2), r.getDouble(3)), bits))
      .repartitionByRange(files, col(zCol))
      .sortWithinPartitions(col(zCol))
      .drop(zCol)
      .write.option("parquet.block.size", rowGroupBytes.toString)
      .mode("overwrite").parquet(path)
  }

  /** The single-key baseline with the identical file/row-group
   *  geometry — what the z-layout is measured against. */
  def writeSorted(df: DataFrame, path: String, a: Column,
      files: Int = 4, rowGroupBytes: Long = 16384L): Unit =
    df.repartitionByRange(files, a)
      .sortWithinPartitions(a)
      .write.option("parquet.block.size", rowGroupBytes.toString)
      .mode("overwrite").parquet(path)
}
