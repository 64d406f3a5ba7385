package graft.ops

import org.apache.spark.sql.DataFrame

/** Shared internals for the ops package. */
private[ops] object OpsUtil {

  /** Collision-free temp column names (withColumn silently replaces — a
    * caller column named like an internal would be destroyed otherwise).
    */
  def tempNames(df: DataFrame, bases: String*): Seq[String] =
    bases.map { b =>
      Iterator.from(0)
        .map(i => if (i == 0) s"__$b" else s"__$b$i")
        .find(n => !df.columns.contains(n)).get
    }
}
