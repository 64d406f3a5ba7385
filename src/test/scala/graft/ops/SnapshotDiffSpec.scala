package graft.ops

import org.apache.spark.sql.functions._

import graft.dftly.SparkTestBase

/** Snapshot diff/delta: status classification, separator injection
  * resistance, and the incremental-delta semi-join.
  */
class SnapshotDiffSpec extends SparkTestBase {

  private lazy val sq = spark
  import sq.implicits._

  test("added / removed / changed / unchanged classification") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
    val neu = Seq((2L, "b"), (3L, "c-edited"), (4L, "d")).toDF("id", "text")
    val got = SnapshotDiff.diff(old, neu, "id", Seq("text"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("column boundaries hash distinctly ((ab, c) != (a, bc))") {
    val old = Seq((1L, "ab", "c")).toDF("id", "x", "y")
    val neu = Seq((1L, "a", "bc")).toDF("id", "x", "y")
    val got = SnapshotDiff.diff(old, neu, "id", Seq("x", "y"))
      .as[(Long, String)].head()
    assert(got == ((1L, "changed")))
  }

  test("delta: exactly the new/changed rows of the new snapshot") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
    val neu = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("id", "text")
    val d = SnapshotDiff.delta(old, neu, "id", Seq("text"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    assert(d == Seq((3L, "c2"), (4L, "d")))
  }

  test("identical snapshots: everything unchanged, delta empty") {
    val snap = Seq((1L, "a"), (2L, "b")).toDF("id", "text")
    val statuses = SnapshotDiff.diff(snap, snap, "id", Seq("text"))
      .select("status").distinct().as[String].collect().toSeq
    assert(statuses == Seq("unchanged"))
    assert(SnapshotDiff.delta(snap, snap, "id", Seq("text")).count() == 0)
  }
}
