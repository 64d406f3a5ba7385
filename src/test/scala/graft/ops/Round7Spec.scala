package graft.ops

import org.apache.spark.sql.functions._

import graft.dftly.SparkTestBase

/** Round-7 regressions: exact-dedup drop-path edge cases (all-null id
  * groups, dotted column names) and the ObjectHashAggregate plan pin for
  * the bounded bucket aggregation.
  */
class Round7Spec extends SparkTestBase {

  import spark.implicits._

  // ------------------------------------------------------------------
  // dropExactDuplicates edge cases
  // ------------------------------------------------------------------

  test("dropExactDuplicates: all-null-id content groups are dropped, not fabricated") {
    // group "a": null ids only → no min_by winner → dropped (same rows the
    // mark+filter path loses to null =!= null); group "b": null id loses to
    // the real id; group "c": plain keep-min
    val df = Seq(
      (Option.empty[Long], "a"),
      (Option.empty[Long], "a"),
      (Option.empty[Long], "b"),
      (Some(7L), "b"),
      (Some(2L), "c"),
      (Some(1L), "c")
    ).toDF("id", "text")
    val got = Dedup.dropExactDuplicates(df, "id", Seq("text"))
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getString(1)))
      .toSet
    assert(got == Set((Some(7L), "b"), (Some(1L), "c")))
    // no all-null fabricated row, ever
    assert(!got.exists { case (id, t) => id.isEmpty && t == null })
  }

  test("dropExactDuplicates survives dotted column names") {
    val df = Seq((1L, "x", "p"), (2L, "x", "q"), (3L, "y", "r"))
      .toDF("id", "a.b", "payload")
    val got = Dedup.dropExactDuplicates(df, "id", Seq("a.b"))
    assert(got.columns.toSeq == Seq("id", "a.b", "payload"))
    assert(got.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet ==
      Set((1L, "x", "p"), (3L, "y", "r")))
  }

  // ------------------------------------------------------------------
  // BoundedCollectList plan pin
  // ------------------------------------------------------------------

  test("bounded bucket aggregation plans through ObjectHashAggregate, not sort-based fallback") {
    // the r6 memory-bound claim ("bucket exchange shape unchanged, buffers
    // O(cap)") presumes the TypedImperativeAggregate stays on the hash
    // aggregation path; a silent SortAggregate fallback would add a
    // corpus-wide sort below every bucket exchange
    import org.apache.spark.sql.execution.aggregate.{ObjectHashAggregateExec, SortAggregateExec}
    val docs = (1L to 40L).map(i => (i, s"alpha beta gamma ${i % 3} delta epsilon zeta eta"))
      .toDF("doc_id", "text")
    val plans = Seq(
      Dedup.nearDuplicatePairs(docs, "doc_id", "text", threshold = 0.5),
      Dedup.jaccardPairs(docs, "doc_id", "text", 0.5))
    for (q <- plans) {
      val before = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val p = q.queryExecution.executedPlan
        val objHash = p.collect { case o: ObjectHashAggregateExec => o }
        val sortAgg = p.collect { case s: SortAggregateExec => s }
        assert(objHash.nonEmpty, s"expected ObjectHashAggregate for the bucket collect:\n$p")
        assert(sortAgg.isEmpty, s"bucket collect fell back to sort-based aggregation:\n$p")
      } finally spark.conf.set("spark.sql.adaptive.enabled", before)
    }
  }
}
