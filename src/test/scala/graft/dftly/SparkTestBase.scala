package graft.dftly

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs. ANSI mode stays on (Spark 4 default) —
  * it is what makes strict casts raise like Polars' strict=True.
  */
trait SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkTestBase.session

  override def afterAll(): Unit = super.afterAll()
}

object SparkTestBase {
  lazy val session: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("dftly-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    // TIME is feature-flagged in Spark 4.1 (spark.sql.timeType.enabled,
    // internal, default false); dftly's `time` type / `@` operator need it.
    .config("spark.sql.timeType.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
