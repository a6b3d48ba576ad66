package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the round-7 outlier/sampling/KNN additions on fixtures
  * with KNOWN answers — the driver corpus is statistically bland, so the
  * oracle alone never pins the interesting cases (exact moments, strata
  * smaller than k, cross-cluster isolation). */
class OutlierSamplingSuite extends AnyFunSuite {

  test("zscoreOutliers computes exact z against the group's own moments") {
    val s = TestSpark.spark
    import s.implicits._
    // group a: values 1,1,1,1,11 → mean 3, σ = sqrt((4·4+64)/5) = 4
    //   z(11) = 2.0, z(1) = -0.5
    // group b: constant + one spike, independent of a's moments
    val ev = Seq(
      (1L, "a", 1.0), (2L, "a", 1.0), (3L, "a", 1.0), (4L, "a", 1.0),
      (5L, "a", 11.0),
      (6L, "b", 5.0), (7L, "b", 5.0), (8L, "b", 5.0), (9L, "b", 9.0)
    ).toDF("event_id", "event_type", "value")
    val r = ScaleOps.zscoreOutliers(ev, "event_type", "event_id", "value", 2)
      .orderBy($"event_type", $"rk").collect()
    assert(r.length == 4)
    // a: rank 1 is the spike with z exactly 2; rank 2 ties on |z|=0.5,
    // broken by the lowest event_id
    assert(r(0).getLong(2) == 5L && r(0).getDouble(4) == 2.0, r(0))
    assert(r(1).getLong(2) == 1L && r(1).getDouble(4) == -0.5, r(1))
    // b's moments are its own: mean 6, σ = sqrt(3)
    assert(r(2).getLong(2) == 9L && r(2).getDouble(4) > 1.7, r(2))
  }

  test("groupSample keeps exactly k per stratum, everything when |stratum| <= k") {
    val s = TestSpark.spark
    import s.implicits._
    val docs = ((0 until 30).map(i => (i.toLong, "big")) ++
      Seq((100L, "small"), (101L, "small"), (102L, "small")))
      .toDF("doc_id", "lang")
    val r = CorpusOps.groupSample(docs, Seq("lang"), "doc_id", 5)
    val byLang = r.groupBy($"lang").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(byLang == Map("big" -> 5L, "small" -> 3L))
    // rk is dense 1..n within each stratum
    assert(r.filter($"lang" === "small").select($"rk").collect()
      .map(_.getInt(0)).sorted.sameElements(Array(1, 2, 3)))
  }

  test("groupSample is reproducible across partitionings") {
    val s = TestSpark.spark
    import s.implicits._
    val docs = (0 until 200).map(i => (i.toLong * 7919L, s"l${i % 3}"))
      .toDF("doc_id", "lang")
    val a = CorpusOps.groupSample(docs, Seq("lang"), "doc_id", 4)
      .orderBy($"lang", $"rk").collect().map(_.toString)
    val b = CorpusOps.groupSample(docs.repartition(13), Seq("lang"), "doc_id", 4)
      .orderBy($"lang", $"rk").collect().map(_.toString)
    assert(a.sameElements(b))
  }

  test("knnGraphBucketed finds neighbors only inside the bucket, never self") {
    val s = TestSpark.spark
    graft.functions.DotF32.ensureRegistered(s)
    import s.implicits._
    // cluster 0: three near-collinear vectors; cluster 1: two orthogonal
    // ones. A cross-cluster pair would have sim ≈ 1 (vec 10 is parallel
    // to vec 0) — it must NOT appear.
    val assigned = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.9f, 0.1f), 0),
      (2L, Array(0.8f, 0.2f), 0),
      (10L, Array(2.0f, 0.0f), 1),
      (11L, Array(0.0f, 3.0f), 1)
    ).toDF("vec_id", "embedding", "cluster")
      .withColumn("norm", expr("sqrt(dot_f32(embedding, embedding))"))
    val r = LlmQueries.knnGraphBucketed(assigned.localCheckpoint(), k = 2)
      .orderBy($"vec_id", $"rk").collect()
    // cluster 0 members get 2 neighbors each; cluster 1 members get 1
    assert(r.count(_.getLong(0) < 10L) == 6)
    assert(r.count(_.getLong(0) >= 10L) == 2)
    r.foreach { row =>
      assert(row.getLong(0) != row.getLong(2), s"self pair: $row")
      val sameSide = (row.getLong(0) < 10L) == (row.getLong(2) < 10L)
      assert(sameSide, s"cross-bucket pair: $row")
    }
    // vec 1 at 6.3° sits between vec 0 (0°, Δ6.3°) and vec 2 (14.0°,
    // Δ7.7°) — nearest is vec 0, runner-up vec 2
    val v1 = r.filter(_.getLong(0) == 1L)
    assert(v1.head.getLong(2) == 0L && v1(1).getLong(2) == 2L, v1.mkString(";"))
  }

  test("Graft.knnGraph adapts ivfAssign output (no norm column) to the core") {
    val s = TestSpark.spark
    graft.functions.DotF32.ensureRegistered(s)
    import s.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(0.1f, 0.9f))
    ).toDF("id", "v")
    val cents = Seq((0, Array(1.0f, 0.0f)), (1, Array(0.0f, 1.0f)))
      .toDF("cid", "cv")
    val assigned = graft.api.Graft.ivfAssign(vecs, "id", "v", cents, "cid", "cv")
    val r = graft.api.Graft.knnGraph(assigned, "id", "v", k = 1)
      .orderBy($"id").collect()
    assert(r.length == 4)
    assert(r.map(x => x.getLong(0) -> x.getLong(2)).toMap ==
      Map(0L -> 1L, 1L -> 0L, 2L -> 3L, 3L -> 2L))
  }
}
