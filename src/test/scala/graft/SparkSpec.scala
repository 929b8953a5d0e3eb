package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (one per suite; cheap on local[*]). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // managed tables (bucketing specs) land under target/, not the repo root
    .config("spark.sql.warehouse.dir", "target/spark-warehouse")
    .getOrCreate()

  override def afterAll(): Unit = {
    // keep the session alive across suites in the same JVM (sbt forks once)
    super.afterAll()
  }
}
