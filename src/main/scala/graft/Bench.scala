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
    // best-of-3 timed runs: this box shows ±20% (occasionally 2×) jitter on
    // >1.5 s queries (GC/JIT in a single JVM); best-of-N is the standard
    // low-noise estimator, and the reported per-query SPREAD (max−min over
    // the timed runs) marks which numbers are trustworthy for regression
    // calls — a delta smaller than the spread is noise, not signal. A
    // System.gc() between queries keeps one query's garbage from being
    // collected on the next query's clock.
    val runs = names.map { n =>
      val ts = Seq.fill(3) { System.gc(); once(n) }
      n -> ts
    }
    // min/spread over SUCCESSFUL runs only: a −1 sentinel mixed into min()
    // would both be reported as the query's time and vanish from the total.
    val results = runs.map { case (n, ts) =>
      val ok = ts.filter(_ >= 0)
      n -> (if (ok.isEmpty) -1.0 else ok.min)
    }
    val spreads = runs.map { case (n, ts) =>
      val ok = ts.filter(_ >= 0)
      n -> (if (ok.size < 2) 0.0 else ok.max - ok.min)
    }
    // Failed queries (−1 sentinel) must not pollute the headline totals —
    // summing −1s both understates the total and hides the failure. A query
    // failing in ANY run (cold or warm) is flagged: an intermittent failure
    // that silently contributes a lucky-run time is the same invisibility
    // class as an always-failing one.
    val failed = (cold.filter(_._2 < 0).map(_._1) ++
      runs.filter(_._2.exists(_ < 0)).map(_._1)).distinct.sorted
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val sp = spreads.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val coldTotal = cold.map(_._2).filter(_ >= 0).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$sp,"sf":"$sfDir","cold_total":$coldTotal,"failed":$failedJson}"""
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
