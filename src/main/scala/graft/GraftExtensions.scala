package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import org.apache.spark.sql.catalyst.expressions.Literal

import graft.functions.{BpeishTokenCount, FloatVectorDot, LangId, LshBucket, ProjectedDist, QualityStats, ShingleHashes, SimHash64, WordHashes, WsTokenCount}

/**
 * Spark extension point: registers the engine's native expressions as
 * SQL functions, so `spark.sql("SELECT vec_dot(a, b) ...")` works in any
 * session created with
 * `.config("spark.sql.extensions", "graft.GraftExtensions")` (a static
 * conf — set it on the session that creates the SparkContext, e.g. via
 * spark-submit --conf) or `.withExtensions(new GraftExtensions)`.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "vec_dot"),
      (args: Seq[Expression]) => FloatVectorDot(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64(args.head)))
    ext.injectFunction((
      FunctionIdentifier("projected_dist"),
      new ExpressionInfo(classOf[ProjectedDist].getName, "projected_dist"),
      (args: Seq[Expression]) => ProjectedDist(args)))
    ext.injectFunction((
      FunctionIdentifier("ws_token_count"),
      new ExpressionInfo(classOf[WsTokenCount].getName, "ws_token_count"),
      (args: Seq[Expression]) => WsTokenCount(args.head)))
    ext.injectFunction((
      FunctionIdentifier("bpeish_token_count"),
      new ExpressionInfo(classOf[BpeishTokenCount].getName, "bpeish_token_count"),
      (args: Seq[Expression]) => BpeishTokenCount(args.head)))
    ext.injectFunction((
      FunctionIdentifier("bpe_token_count"),
      new ExpressionInfo(classOf[graft.functions.BpeTokenCount].getName,
        "bpe_token_count"),
      (args: Seq[Expression]) => graft.functions.BpeTokenCount(args.head)))
    // coalesce to 'und' so SQL callers get the same null contract as the
    // Scala path (TextAnalyticsOps.langId: null text -> 'und')
    ext.injectFunction((
      FunctionIdentifier("lang_id"),
      new ExpressionInfo(classOf[LangId].getName, "lang_id"),
      (args: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.Coalesce(
          Seq(LangId(args.head), Literal("und")))))
    ext.injectFunction((
      FunctionIdentifier("quality_stats"),
      new ExpressionInfo(classOf[QualityStats].getName, "quality_stats"),
      (args: Seq[Expression]) => QualityStats(args.head)))
    // int-literal second arguments (n / bits / portable flag)
    ext.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (args: Seq[Expression]) => ShingleHashes(args.head, intArg(args, 1, "n"))))
    ext.injectFunction((
      FunctionIdentifier("lsh_bucket"),
      new ExpressionInfo(classOf[LshBucket].getName, "lsh_bucket"),
      (args: Seq[Expression]) => LshBucket(args.head, intArg(args, 1, "bits"))))
    ext.injectFunction((
      FunctionIdentifier("word_hashes"),
      new ExpressionInfo(classOf[WordHashes].getName, "word_hashes"),
      (args: Seq[Expression]) =>
        WordHashes(args.head, boolArg(args, 1, "portable"))))
    ext.injectFunction((
      FunctionIdentifier("classify_score"),
      new ExpressionInfo(classOf[graft.functions.ClassifyScore].getName,
        "classify_score"),
      (args: Seq[Expression]) => graft.functions.ClassifyScore(args.head)))
  }

  private def intArg(args: Seq[Expression], i: Int, name: String): Int =
    args(i) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"argument $name must be an integer literal, got $other")
    }

  private def boolArg(args: Seq[Expression], i: Int, name: String): Boolean =
    args(i) match {
      case Literal(v: Boolean, _) => v
      case other => throw new IllegalArgumentException(
        s"argument $name must be a boolean literal, got $other")
    }
}
