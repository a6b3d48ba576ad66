package graft.operators

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[FuzzyJoin.qErIncrement]] — incremental ≡ recompute, the operator's
  * whole contract: resolving yesterday's state + the new batch through
  * the contraction closure (new links mapped to their endpoints'
  * converged components, CC over the O(batch) contracted graph) must
  * equal running the full batch pipeline from scratch, row for row.
  * Plus the fixture-shape guards that make the equality non-vacuous. */
class ErIncrementSuite extends AnyFunSuite {
  private val s = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("increment equals the full-recompute pipeline row for row") {
    val inc = SparkEntry.queries("q_er_increment")(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val full = SparkEntry.queries("q_er_pipeline")(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(inc.length === full.length)
    assert(inc.toSeq === full.toSeq)
  }

  test("the fixture split is non-vacuous: both batches land in the output") {
    val out = SparkEntry.queries("q_er_increment")(s, sf)
      .withColumn("is_new", expr("(mention_id div 4) % 5 = 4"))
    val byBatch = out.groupBy(col("is_new")).count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(byBatch.getOrElse(true, 0L) > 0, "new batch resolved no mentions")
    assert(byBatch.getOrElse(false, 0L) > 0, "old state contributed no mentions")
  }

  test("streaming maintenance equals the batch pipeline row for row") {
    val st = SparkEntry.queries("s_er_increment")(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val full = SparkEntry.queries("q_er_pipeline")(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(st.toSeq === full.toSeq)
  }

  test("foreachBatch replay rewrites the batch, never double-counts") {
    val root = java.nio.file.Files
      .createTempDirectory("er_replay").toFile.getAbsolutePath
    val (catalog, mentions) = FuzzyJoin.erFixture(s, sf)
    val b0 = mentions.filter(expr("(mention_id div 4) % 2 = 0"))
    val b1 = mentions.filter(expr("(mention_id div 4) % 2 = 1"))
    graft.streaming.ErStream.processBatch(b0, 0L, catalog,
      s"$root/pairs", s"$root/labels")
    graft.streaming.ErStream.processBatch(b1, 1L, catalog,
      s"$root/pairs", s"$root/labels")
    val once = graft.streaming.ErStream
      .resolved(s, catalog, s"$root/pairs", s"$root/labels").collect().toSeq
    // replay batch 1 (the crash-after-write, before-commit scenario)
    graft.streaming.ErStream.processBatch(b1, 1L, catalog,
      s"$root/pairs", s"$root/labels")
    val twice = graft.streaming.ErStream
      .resolved(s, catalog, s"$root/pairs", s"$root/labels").collect().toSeq
    assert(once === twice)
  }

  test("retraction equals the recompute over surviving mentions") {
    val got = SparkEntry.queries("q_er_retract")(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val (catalog, mentions) = FuzzyJoin.erFixture(s, sf)
    val survivors = mentions.filter(expr("(mention_id div 4) % 29 <> 3"))
    val want = FuzzyJoin.resolve(catalog, "entity_id",
        FuzzyJoin.editJoin1(catalog, "entity_id", "ename", survivors,
          "mention_id", "mname")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === want.toSeq)
    // deleted mentions are gone from the assignment table
    assert(got.forall { case (mid, _, _, _) => (mid / 4) % 29 != 3 })
  }

  test("retracting the only bridge mention SPLITS the component") {
    import s.implicits._
    // entities 1, 2; mentions: 10→{1}, 11→{1,2} (the bridge), 12→{2}.
    val entities = Seq(1L, 2L).toDF("entity_id")
    val pairs = Seq((10L, 1L, 0L), (11L, 1L, 1L), (11L, 2L, 1L),
      (12L, 2L, 0L)).toDF("mention_id", "entity_id", "dist")
    val labels = Seq((1L, 1L), (2L, 1L)).toDF("id", "comp") // merged via 11
    val out = FuzzyJoin.resolveRetract(entities, "entity_id", pairs,
        labels, Seq(11L).toDF("mention_id"), "mention_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === Map(10L -> 1L, 12L -> 2L)) // split: 2 is its own comp
  }

  test("retracting a non-bridge mention leaves the component intact") {
    import s.implicits._
    val entities = Seq(1L, 2L).toDF("entity_id")
    val pairs = Seq((10L, 1L, 0L), (11L, 1L, 1L), (11L, 2L, 1L),
      (12L, 2L, 0L)).toDF("mention_id", "entity_id", "dist")
    val labels = Seq((1L, 1L), (2L, 1L)).toDF("id", "comp")
    val out = FuzzyJoin.resolveRetract(entities, "entity_id", pairs,
        labels, Seq(10L).toDF("mention_id"), "mention_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === Map(11L -> 1L, 12L -> 1L)) // bridge 11 still merges
  }

  test("label compaction keeps reads and newest-batch replay intact " +
      "(through an explicit file:// URI — the FS-API port's contract)") {
    // the URI form exercises snapshot discovery/retention through the
    // Hadoop FileSystem API end to end; java.io.File would reject it
    val root = "file://" + java.nio.file.Files
      .createTempDirectory("er_compact").toFile.getAbsolutePath
    val (catalog, mentions) = FuzzyJoin.erFixture(s, sf)
    val batches = (0 until 4).map(b =>
      mentions.filter(expr(s"(mention_id div 4) % 4 = $b")))
    batches.zipWithIndex.foreach { case (b, i) =>
      graft.streaming.ErStream.processBatch(b, i.toLong, catalog,
        s"$root/pairs", s"$root/labels")
    }
    val before = graft.streaming.ErStream
      .resolved(s, catalog, s"$root/pairs", s"$root/labels").collect().toSeq
    val removed = graft.streaming.ErStream.compactLabels(s, s"$root/labels")
    assert(removed == 2) // 4 snapshots -> newest two survive
    val after = graft.streaming.ErStream
      .resolved(s, catalog, s"$root/pairs", s"$root/labels").collect().toSeq
    assert(before === after)
    // replay of the NEWEST batch (id 3) must still find snapshot 2
    graft.streaming.ErStream.processBatch(batches(3), 3L, catalog,
      s"$root/pairs", s"$root/labels")
    val replayed = graft.streaming.ErStream
      .resolved(s, catalog, s"$root/pairs", s"$root/labels").collect().toSeq
    assert(before === replayed)
  }

  test("yesterday's persisted labels cover strictly fewer links than today") {
    // Guards the state fixture itself: the old link table must be a real
    // proper subset of the full link table (old mentions only), so the
    // increment is demonstrably NOT a disguised recompute.
    val (pairsPath, _) = FuzzyJoin.ErBase.ensure(s, sf)
    val oldPairs = s.read.parquet(pairsPath)
    assert(oldPairs.filter(expr("(mention_id div 4) % 5 = 4")).isEmpty,
      "old state contains new-batch mentions")
    val (catalog, mentions) = FuzzyJoin.erFixture(s, sf)
    val fullPairs = FuzzyJoin.editJoin1(catalog, "entity_id", "ename",
      mentions, "mention_id", "mname")
    assert(oldPairs.count() < fullPairs.count())
  }
}
