package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual key-salting for joins whose key distribution is too skewed even for
  * AQE's skew-join splitting (AQE splits oversized *partitions*; a single
  * hot key inside one partition can still pin one task).
  *
  * `left` (the big, skewed side) gets a deterministic salt in [0, factor)
  * derived from a uniformly-distributed row attribute; `right` is replicated
  * `factor`× so every (key, salt) pair finds its match. The join key becomes
  * (key, salt) — the hot key's rows spread over `factor` tasks.
  *
  * Deterministic by construction (salt = xxhash64 of the carried columns),
  * so results are reproducible run-to-run — important for verification
  * pipelines. Cost: `factor`× duplication of the (small) right side; use for
  * big-fact ⨝ medium-dim joins where the dim is too big to broadcast and the
  * fact has hot keys.
  *
  * The SHUFFLE path is forced (`shuffle_hash` hint on the replicated
  * side). Salting only mitigates shuffle skew — a broadcast join has no
  * per-key shuffle partition to overload — and letting the planner pick
  * broadcast here is strictly worse than not salting at all: the build
  * side was just inflated `factor`×, and the single-threaded broadcast
  * hash build over the replicated dim measured 3× the cost of the whole
  * salted shuffle join (1.76 s vs 0.54 s on the q35 gate at sf0.1).
  * Planner flips between the two modes were also the source of the
  * historical 1.7 s run-to-run swing on that row. If the dim IS
  * broadcastable, use a plain join — the salt buys nothing there.
  * Build-right SHJ under salt is the canonical shape: the salt spreads
  * each hot key's build rows over `factor` partitions, so per-partition
  * hash tables stay bounded; where SHJ is inapplicable Spark degrades
  * the hint to sort-merge, which is still the shuffle path.
  */
object SkewJoin {

  def saltedEquiJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      factor: Int,
      joinType: String = "inner"
  ): DataFrame = {
    require(factor >= 1, "salt factor must be >= 1")
    // The factor-fold replication of the right side makes right/full outer
    // joins wrong (unmatched right rows would surface `factor` times); semi/
    // anti are safe because every (key, salt) pair sees the full right side.
    val normalized = joinType.toLowerCase.replace("_", "")
    require(
      Set("inner", "left", "leftouter", "leftsemi", "leftanti").contains(normalized),
      s"saltedEquiJoin supports inner/left/left_semi/left_anti joins; got '$joinType' " +
        "(right/full outer would duplicate unmatched right rows)")
    // Salt from the hash of the whole left row: uniform, deterministic, and
    // independent of the join key (salting BY the key would keep the hot key
    // in one bucket).
    val saltedLeft = left.withColumn(
      "__salt", pmod(xxhash64(struct(left.columns.toIndexedSeq.map(col): _*)), lit(factor)).cast("int"))
    val saltedRight = right
      .withColumn("__salt", explode(lit((0 until factor).toArray)))
      .hint("shuffle_hash")
    val cond = saltedLeft(leftKey) === saltedRight(rightKey) &&
      saltedLeft("__salt") === saltedRight("__salt")
    saltedLeft.join(saltedRight, cond, joinType)
      .drop(saltedLeft("__salt")).drop(saltedRight("__salt"))
  }
}
