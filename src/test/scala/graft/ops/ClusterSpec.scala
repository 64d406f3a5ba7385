package graft.ops

import org.apache.spark.sql.functions._

import graft.dftly.SparkTestBase

class ClusterSpec extends SparkTestBase {

  import spark.implicits._

  /** Brute-force union-find on the driver — the independent oracle. */
  private def bruteComponents(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  /** Regimes: (localSolveMaxEdges, broadcastMaxLabelRows) — the driver
    * union-find fast path, the broadcast-iterative path, and the pure
    * shuffle path. Every graph-shape test runs all three.
    */
  private val regimes = Seq(
    "local" -> (1000000L, 1000000L),
    "broadcast-iterative" -> (0L, 1000000L),
    "shuffle-iterative" -> (0L, 0L))

  private def ccMap(pairs: Seq[(Long, Long)], regime: (Long, Long)): Map[Long, Long] =
    Cluster.connectedComponents(pairs.toDF("id_a", "id_b"),
      localSolveMaxEdges = regime._1, broadcastMaxLabelRows = regime._2)
      .as[(Long, Long)].collect().toMap

  for ((name, regime) <- regimes) {
    test(s"[$name] two separate components resolve to their min ids") {
      val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L))
      assert(ccMap(pairs, regime) == bruteComponents(pairs))
      assert(ccMap(pairs, regime) ==
        Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    }

    test(s"[$name] long path graph converges (pointer jumping: log rounds, not n)") {
      // a 200-node path: plain neighbor propagation would need 200 rounds —
      // far beyond the maxIter cap — so the iterative regimes only pass if
      // pointer jumping actually compresses the chains.
      val pairs = (1L until 200L).map(i => (i, i + 1))
      val got = ccMap(pairs, regime)
      assert(got.size == 200)
      assert(got.values.forall(_ == 1L))
    }

    test(s"[$name] randomized graphs match union-find") {
      val rnd = new scala.util.Random(7)
      for (_ <- 1 to 3) {
        val n = 80
        val pairs = Seq.fill(60)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
          .filter { case (a, b) => a != b }
        assert(ccMap(pairs, regime) == bruteComponents(pairs))
      }
    }

    test(s"[$name] reversed/duplicated edges and either column order don't matter") {
      val pairs = Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 2L))
      assert(ccMap(pairs, regime) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    }

    test(s"[$name] string ids cluster by lexicographic min") {
      val got = Cluster.connectedComponents(
        Seq(("b", "c"), ("a", "b"), ("x", "y")).toDF("id_a", "id_b"),
        localSolveMaxEdges = regime._1, broadcastMaxLabelRows = regime._2)
        .as[(String, String)].collect().toMap
      assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
    }
  }

  for ((name, regime) <- regimes) {
    test(s"[$name] int ids take the generic ship-back branch correctly") {
      val got = Cluster.connectedComponents(
        Seq((5, 3), (3, 7), (20, 21)).toDF("id_a", "id_b"),
        localSolveMaxEdges = regime._1, broadcastMaxLabelRows = regime._2)
        .as[(Int, Int)].collect().toMap
      assert(got == Map(3 -> 3, 5 -> 3, 7 -> 3, 20 -> 20, 21 -> 20))
    }
  }

  test("wide string ids trip the BYTE cap and fall to the shuffle regime, still correct") {
    // 60 chained nodes with 1 KB ids: only 60 label rows (far under any row
    // cap) but ~120 KB of estimated label bytes — a 64 KB byte cap must
    // force the shuffle regime, and the answer must not change. This is the
    // guardrail for 250k × multi-KB ids blowing per-round broadcasts at
    // scale while the row cap looks fine.
    val pad = "x" * 1000
    def wid(i: Int): String = f"$i%04d-$pad"
    val pairs = (0 until 59).map(i => (wid(i), wid(i + 1))).toDF("id_a", "id_b")
    val got = Cluster.connectedComponents(pairs,
      localSolveMaxEdges = 0L, // force iterative
      broadcastMaxLabelRows = 1000000L, // row cap happily passes
      broadcastMaxLabelBytes = 64L * 1024) // byte cap must trip
      .as[(String, String)].collect().toMap
    assert(got.size == 60 && got.values.forall(_ == wid(0)))
    // same graph under the default byte cap takes the broadcast regime and
    // agrees — regime choice is a performance decision, never a semantic one
    val bc = Cluster.connectedComponents(pairs, localSolveMaxEdges = 0L)
      .as[(String, String)].collect().toMap
    assert(bc == got)
  }

  test("binary ids never take the local regime (identity-hashed keys) and still resolve") {
    // Array[Byte] is neither Comparable nor value-hashed on the JVM: the
    // local union-find would crash or mis-group, so the type gate must route
    // binary ids to the distributed path even under the local edge cap.
    def b(s: String): Array[Byte] = s.getBytes("UTF-8")
    val pairs = Seq((b("bb"), b("cc")), (b("aa"), b("bb")), (b("xx"), b("yy")))
      .toDF("id_a", "id_b")
    val got = Cluster.connectedComponents(pairs, localSolveMaxEdges = 1000000L)
      .as[(Array[Byte], Array[Byte])].collect()
      .map { case (id, comp) => (new String(id, "UTF-8"), new String(comp, "UTF-8")) }
      .toMap
    assert(got == Map("aa" -> "aa", "bb" -> "aa", "cc" -> "aa",
      "xx" -> "xx", "yy" -> "xx"))
  }

  test("non-BMP string ids: local regime agrees with Spark's UTF-8 ordering") {
    // U+FF21 (ＡFULLWIDTH A, 3 UTF-8 bytes efbca1) vs U+10400 (𐐀, 4 bytes
    // f0909080): UTF-16 order says 𐐀 < Ａ (surrogate D801 < FF21) but UTF-8
    // byte order says Ａ < 𐐀 — Spark's least() uses UTF-8 order, so the
    // component representative must be Ａ.
    val hi = "𐐀" // 𐐀
    val fw = "Ａ" // Ａ
    assert(fw.compareTo(hi) > 0, "precondition: UTF-16 order disagrees")
    val got = Cluster.connectedComponents(
      Seq((hi, fw)).toDF("id_a", "id_b"), localSolveMaxEdges = 1000000L)
      .as[(String, String)].collect().toMap
    assert(got == Map(hi -> fw, fw -> fw))
  }

  test("assignClusters: members get the family min, singletons keep their id") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (9L, "z")).toDF("id", "t")
    val pairs = Seq((2L, 3L)).toDF("id_a", "id_b")
    val got = Cluster.assignClusters(df, "id", pairs)
      .select($"id", $"cluster").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 9L -> 9L))
  }

  test("keepClusterRepresentatives keeps one row per family") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (9L, "z")).toDF("id", "t")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val full = Cluster.keepClusterRepresentatives(df, "id", pairs)
    assert(!full.columns.contains("cluster"))
    val kept = full.select($"id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 9L))
  }

  test("assignClusters refuses to clobber an existing 'cluster' column") {
    val df = Seq((1L, "a")).toDF("id", "cluster")
    val pairs = spark.emptyDataset[(Long, Long)].toDF("id_a", "id_b")
    intercept[IllegalArgumentException] {
      Cluster.assignClusters(df, "id", pairs)
    }
  }

  test("assignClusters leaves a caller's 'component' column untouched") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "component")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val got = Cluster.assignClusters(df, "id", pairs)
      .select($"id", $"component", $"cluster").as[(Long, String, Long)]
      .collect().toSet
    assert(got == Set((1L, "x", 1L), (2L, "y", 1L)))
  }

  test("empty pair table: everything is a singleton") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "t")
    val pairs = spark.emptyDataset[(Long, Long)].toDF("id_a", "id_b")
    val got = Cluster.assignClusters(df, "id", pairs)
      .select($"id", $"cluster").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L))
  }

  test("end-to-end on documents: clusters from exact-jaccard pairs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.5)
    val assigned = Cluster.assignClusters(docs, "doc_id", pairs)
    assert(assigned.count() == docs.count())
    // every cluster representative is a real doc id and ≤ its members
    val bad = assigned.filter($"cluster" > $"doc_id").count()
    assert(bad == 0)
  }
}
