package graft.tools

import org.apache.spark.sql.SparkSession
import scala.util.chaining._

/** Dumps `.explain("formatted")` for named SparkEntry queries to files —
  * the optimization rounds' plan-evidence artifact
  * (`plans/rNN/<query>_<label>.txt`).
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <label> <q1,q2,...|all>
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default 32).
  *
  * Runs each query's `prepare` hook first so fixture-backed queries plan
  * against real inputs, and releases fixtures after, mirroring Bench.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    if (args.length != 3) {
      System.err.println(
        "usage: runMain graft.tools.PlanDump <outDir> <label> <q1,q2,...|all>\n" +
          "env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), " +
          "SPARK_GRAFT_CPUS (default 32)")
      sys.exit(2)
    }
    val Array(outDir, label, qlist) = args
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .pipe(graft.SessionTuning.apply)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (qlist == "all") graft.SparkEntry.queries.keys.toSeq.sorted
      else qlist.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val fn = graft.SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query $n"))
      graft.SparkEntry.prepare.get(n).foreach { f =>
        try f(spark, sfDir)
        catch { case e: Throwable =>
          System.err.println(s"[plandump] prepare $n: $e") }
      }
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${n}_$label.txt"),
          txt.getBytes("UTF-8"))
        println(s"[plandump] wrote $outDir/${n}_$label.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $n failed: $e")
      } finally {
        try graft.SparkEntry.releaseFixture(n, sfDir)
        catch { case _: Throwable => () }
      }
    }
    spark.stop()
  }
}
