package graft.ops

import org.apache.spark.sql.functions._
import graft.dftly.SparkTestBase

class PqSpec extends SparkTestBase {
  import spark.implicits._

  /** Deterministic synthetic embeddings: dim 16, 3 loose clusters + planted
    * exact duplicates of the first 10 vectors.
    */
  private lazy val vecs = {
    val r = new scala.util.Random(7)
    val base = (0 until 300).map { i =>
      val center = i % 3
      val v = Array.tabulate(16)(d => center * 2.0 + r.nextGaussian() * 0.5)
      (i.toLong, v.map(_.toFloat))
    }
    val dups = base.take(10).map { case (id, v) => (id + 10000L, v) }
    (base ++ dups).toDF("vec_id", "embedding")
  }

  test("codes are m bytes, identical vectors get identical codes") {
    val cb = Pq.train(vecs, "embedding", m = 4, ksub = 16, iters = 5)
    val coded = vecs.select(col("vec_id"), Pq.encode(col("embedding"), cb).as("codes"))
    val lens = coded.select(size(col("codes"))).distinct().as[Int].collect()
    assert(lens.toSeq == Seq(4))
    val byCodes = vecs.as("a").join(vecs.as("b"),
        col("a.vec_id") + 10000L === col("b.vec_id"))
      .select(
        Pq.encode(col("a.embedding"), cb).as("ca"),
        Pq.encode(col("b.embedding"), cb).as("cb"))
      .where(not(col("ca") === col("cb")))
    assert(byCodes.count() == 0)
  }

  test("training is partitioning-invariant (hash-ordered sample)") {
    val a = Pq.train(vecs.repartition(3), "embedding", m = 4, ksub = 16, iters = 5)
    val b = Pq.train(vecs.repartition(11), "embedding", m = 4, ksub = 16, iters = 5)
    assert(a.flat.toSeq == b.flat.toSeq)
  }

  test("ADC cosine tracks exact cosine (mean abs error small, never NaN)") {
    val cb = Pq.train(vecs, "embedding", m = 8, ksub = 32, iters = 8)
    val q = vecs.where(col("vec_id") === 0L)
      .select(col("embedding")).as[Array[Float]].head().toSeq
    val scored = vecs.select(
      Similarity.cosine(col("embedding"), lit(q.toArray)).as("exact"),
      Pq.adcCosine(Pq.encode(col("embedding"), cb), cb, q).as("adc"))
    val rows = scored.as[(Double, Double)].collect()
    assert(rows.forall { case (_, a) => !a.isNaN })
    val mae = rows.map { case (e, a) => math.abs(e - a) }.sum / rows.length
    assert(mae < 0.08, s"ADC mean abs error too large: $mae")
  }

  test("full probe + full refine == brute force exactly") {
    val cells = Similarity.trainCentroids(vecs, "embedding", k = 4, iters = 3)
    val cb = Pq.train(vecs, "embedding", m = 4, ksub = 16, iters = 5)
    val q = vecs.where(col("vec_id") === 5L)
      .select(col("embedding")).as[Array[Float]].head().toSeq
    val exact = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", q, 15)
      .select(col("vec_id"), round(col("score"), 9).as("s")).collect().toSeq
    val pq = Pq.ivfTopKPqAdc(vecs, "vec_id", "embedding", cells, cb, q,
        k = 15, nProbe = 4, refine = Int.MaxValue / 15)
      .select(col("vec_id"), round(col("score"), 9).as("s")).collect().toSeq
    assert(pq == exact)
  }

  test("pruned search keeps high recall on clustered data") {
    val cells = Similarity.trainCentroids(vecs, "embedding", k = 6, iters = 3)
    val cb = Pq.train(vecs, "embedding", m = 8, ksub = 32, iters = 8)
    val q = vecs.where(col("vec_id") === 2L)
      .select(col("embedding")).as[Array[Float]].head().toSeq
    val exactIds = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", q, 10)
      .select("vec_id").as[Long].collect().toSet
    val pqIds = Pq.ivfTopKPqAdc(vecs, "vec_id", "embedding", cells, cb, q,
        k = 10, nProbe = 3, refine = 8)
      .select("vec_id").as[Long].collect().toSet
    val recall = (exactIds & pqIds).size.toDouble / exactIds.size
    assert(recall >= 0.7, s"recall too low: $recall")
  }

  test("decode reconstruction is closer than a wrong-cluster vector") {
    val cb = Pq.train(vecs, "embedding", m = 4, ksub = 32, iters = 8)
    val sample = vecs.limit(50)
      .select(col("embedding"), Pq.encode(col("embedding"), cb).as("codes"))
      .collect()
    sample.foreach { row =>
      val v = row.getSeq[Float](0).map(_.toDouble).toArray
      val codes = row.getSeq[Byte](1).toArray
      val rec = graft.ops.expr.PqKernels.decode(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(codes), cb.flat, cb.m, cb.ksub)
      val mse = v.zip(rec).map { case (a, b) => (a - b) * (a - b) }.sum / v.length
      assert(mse < 1.0, s"reconstruction MSE too large: $mse")
    }
  }
}
