package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line of per-query wall times.
  *
  * Results are forced through the `noop` sink — `count()` would let Catalyst
  * prune every projected expression and benchmark an empty scan.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
    // cold pass doubles as warm-up: JIT + codegen + parquet footer caches
    val cold = names.map(n => n -> once(n))
    // best-of-2 timed runs: single-JVM local mode has multi-second GC/JIT
    // jitter that would swamp real plan differences
    val results = names.map(n => n -> math.min(once(n), once(n)))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val coldTotal = cold.map(_._2).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","cold_total":$coldTotal}"""
    // stdout (own line; run/outputStrategy passes it through unprefixed) AND
    // a file, so the harness can parse per-query numbers either way.
    println(json)
    try {
      val p = java.nio.file.Paths.get("bench_out.json")
      java.nio.file.Files.write(p, (json + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable => System.err.println(s"[bench] file write: $e") }
    spark.stop()
  }
}
