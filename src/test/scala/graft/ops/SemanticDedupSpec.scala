package graft.ops

import org.apache.spark.sql.functions._

import graft.dftly.SparkTestBase

/** SemDeDup semantic dedup: dominance semantics, cell confinement, and the
  * contrast with connected-components family dedup.
  */
class SemanticDedupSpec extends SparkTestBase {

  private lazy val sq = spark
  import sq.implicits._

  // two well-separated 2-d cells
  private val cents = Array(Array(10.0, 0.0), Array(0.0, 10.0))

  private def df(rows: (Long, Array[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("identical vectors in one cell: min id survives") {
    val v = Array(9.0f, 1.0f)
    val out = Similarity.semanticDedup(
      df(1L -> v, 2L -> v, 3L -> v), "vec_id", "embedding",
      threshold = 0.99, centroids = cents)
      .select(col("vec_id")).as[Long].collect().toSeq.sorted
    assert(out == Seq(1L))
  }

  test("dominance, not connected components: hub dropped, spokes kept") {
    // 1 and 2 are dissimilar; 3 is similar to both. CC would merge all
    // three into one family (keeping only 1); dominance drops only 3 —
    // the two genuinely distinct items both survive.
    val a = Array(9.0f, 0.0f)
    val b = Array(6.5f, 6.2f)       // same cell (cell 0 by L2), low cosine to a
    val mid = Array(8.0f, 3.2f)     // cosine ≥ t to both a and b
    val data = df(1L -> a, 2L -> b, 3L -> mid)
    val kept = Similarity.semanticDedup(
      data, "vec_id", "embedding", threshold = 0.90, centroids = cents)
      .select(col("vec_id")).as[Long].collect().toSeq.sorted
    assert(kept == Seq(1L, 2L))
    // contrast: CC family dedup keeps only the min id of the merged family
    val pairs = Similarity.cosineNearDuplicatePairsIvf(
      data, "vec_id", "embedding", 0.90, cents, nProbe = 1)
    val ccKept = Cluster.keepClusterRepresentatives(data, "vec_id", pairs)
      .select(col("vec_id")).as[Long].collect().toSeq.sorted
    assert(ccKept == Seq(1L))
  }

  test("cross-cell near-dups both survive (the SemDeDup recall trade)") {
    val v1 = Array(0.8f, 0.6f) // nearer cell 0
    val v2 = Array(0.6f, 0.8f) // nearer cell 1; cosine(v1,v2) = 0.96
    val out = Similarity.semanticDedup(
      df(1L -> v1, 2L -> v2), "vec_id", "embedding",
      threshold = 0.90, centroids = cents)
      .count()
    assert(out == 2)
  }

  test("auto-trained centroids path runs end to end") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val n = emb.count()
    val kept = Similarity.semanticDedup(
      emb, "vec_id", "embedding", threshold = 0.85, targetCellSize = 100)
    val k = kept.count()
    assert(k > 0 && k <= n)
  }
}
