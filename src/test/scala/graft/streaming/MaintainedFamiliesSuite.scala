package graft.streaming

import graft.TestSpark
import graft.api.Graft
import graft.operators.{FuzzyJoin, RetrievalIndex}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Graft.maintain]]'s per-batch tick over the NON-TEXT index-family
  * shapes (r17 — r16 verdict #3: the policy path was depth-tested only
  * on the text family's band store + pair log + label log;
  * `indexRoots` accepts any `batch=` layout, so prove it on the other
  * run structures an installation maintains):
  *
  *  - the BM25 `tb=`-partitioned postings root (plus its flat doclens
  *    and 1-row stats partials — the stats rows are ADDITIVE, so folds
  *    must preserve them for the serve-time re-sum);
  *  - the vector `cluster=`-partitioned ANN root (rows assigned under
  *    frozen creation-time centroids);
  *  - the ER family: a flat link log plus the entity-sized label
  *    SNAPSHOT root, whose maintenance verb is retention, not
  *    consolidation (`snapshotRoots`).
  *
  * Each leg ticks maintain() after EVERY micro-batch (fanIn = 2 so
  * folds actually fire at these batch counts), then pins stream ≡
  * recompute on the maintained layout, fold fan-in bounded, and the
  * run structure bounded well below one-run-per-batch. The text-family
  * 64-batch depth leg lives in [[MaintainedHistorySuite]]; the
  * auto-tick REPLAY leg (a mid-stream tick inside foreachBatch) is the
  * last test here. */
class MaintainedFamiliesSuite extends AnyFunSuite {

  private def s = TestSpark.spark

  private def dirCount(dir: String): Int = {
    val p = new Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else fs.listStatus(p).count(st =>
      st.isDirectory && st.getPath.getName.startsWith("batch="))
  }

  private val policy = Graft.MaintenancePolicy(fanIn = 2)

  test("BM25 tb= root under the maintain() tick: serve ≡ recompute, " +
      "bounded folds, bounded runs") {
    val sp = s
    import sp.implicits._
    val root = java.nio.file.Files.createTempDirectory("maint_bm25").toString
    val (post, dl, st) = (s"$root/postings", s"$root/doclens", s"$root/stats")

    // 12 batches of 3 docs; texts hit the standard query's Terms with
    // varying tf/dl so scores are non-trivial
    def batchDocs(k: Int): Seq[(Long, String)] = (0 until 3).map { i =>
      val id = k * 3L + i
      val words = Seq.fill((id % 4).toInt + 1)("table") ++
        Seq.fill((id % 3).toInt)("window") ++
        Seq.fill((id % 2).toInt)("agg") ++
        Seq.fill(5)(s"filler$id")
      (id, words.mkString(" "))
    }

    var maxConsumed = 0
    (0 until 12).foreach { k =>
      Bm25Stream.processBatch(batchDocs(k).toDF("doc_id", "text"),
        k.toLong, post, dl, st)
      val stats = Graft.maintain(sp, indexRoots = Seq(post, dl, st),
        policy = policy)
      maxConsumed = math.max(maxConsumed, stats.indexFolds.maxFoldConsumed)
    }
    assert(maxConsumed <= policy.fanIn,
      "a maintenance fold exceeded the fan-in barrier")

    // bounded run structure: folds kept the roots near fanIn·log(12),
    // never one run per batch
    Seq("postings" -> post, "doclens" -> dl, "stats" -> st).foreach {
      case (name, dir) =>
        assert(dirCount(dir) <= 6,
          s"$name run count unbounded after 12 batches: ${dirCount(dir)}")
    }

    // stream ≡ recompute on the MAINTAINED layout
    val all = (0 until 12).flatMap(batchDocs).toDF("doc_id", "text")
    val (fullPost, fullDl) = RetrievalIndex.tokenize(all)
    val expect = RetrievalIndex.serve(
      fullPost.filter(col("token").isin(RetrievalIndex.Terms: _*)).drop("tb"),
      RetrievalIndex.statsOf(fullDl)).collect().map(_.toString).sorted.toSeq
    val got = Bm25Stream.serveFrom(sp, post, st)
      .collect().map(_.toString).sorted.toSeq
    assert(got == expect, "maintained BM25 serve diverged from recompute")
  }

  test("vector cluster= root under the maintain() tick: index ≡ batch " +
      "assignment, bounded folds, bounded runs") {
    val sp = s
    import sp.implicits._
    val root = java.nio.file.Files.createTempDirectory("maint_vec").toString
    val idx = s"$root/index"

    // 48 deterministic dim-4 vectors, 8 batches of 6
    def vec(id: Long): Array[Float] = Array(
      ((id * 31 + 7) % 97).toFloat, ((id * 17 + 3) % 89).toFloat,
      ((id * 13 + 11) % 83).toFloat, ((id * 7 + 29) % 79).toFloat)
    val allVecs = (0L until 48L).map(id => (id, vec(id)))
    val allDf = allVecs.toDF("vec_id", "vec")
    VectorIndexStream.createIndex(allDf, "vec_id", "vec", idx)

    var maxConsumed = 0
    (0 until 8).foreach { k =>
      val batch = allVecs.slice(k * 6, k * 6 + 6).toDF("vec_id", "vec")
      VectorIndexStream.processBatch(batch, k.toLong, "vec_id", "vec", idx)
      val stats = Graft.maintain(sp, indexRoots = Seq(idx), policy = policy)
      maxConsumed = math.max(maxConsumed, stats.indexFolds.maxFoldConsumed)
    }
    assert(maxConsumed <= policy.fanIn,
      "a maintenance fold exceeded the fan-in barrier")
    assert(dirCount(idx) <= 5,
      s"index run count unbounded after 8 batches: ${dirCount(idx)}")

    // the maintained index equals the batch assignment row for row
    // (under stored centroids a row's cluster depends only on itself)
    val cents = VectorIndexStream.readCentroids(sp, idx)
    val expect = Graft.ivfAssign(allDf, "vec_id", "vec", cents, "cid", "cv")
      .select(col("vec_id"), col("cluster").cast("bigint"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = VectorIndexStream.readIndex(sp, idx)
      .select(col("vec_id"), col("cluster").cast("bigint"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect, "maintained vector index diverged from batch assignment")
  }

  test("ER link log + label snapshots under the maintain() tick: " +
      "resolved ≡ one-batch recompute, snapshots retained to the policy") {
    val sp = s
    import sp.implicits._
    val root = java.nio.file.Files.createTempDirectory("maint_er").toString

    val catalog = (0 until 24)
      .map(i => (i.toLong, f"entity_name_$i%03d")).toDF("entity_id", "ename")
    // mentions: exact for %3==0, a 1-char deletion for the rest —
    // editJoin1 links both forms; ids disjoint from entity ids
    def mname(i: Int): String = {
      val n = f"entity_name_${i % 24}%03d"
      if (i % 3 == 0) n else n.substring(0, 4) + n.substring(5)
    }
    val mentions = (0 until 48).map(i => (1000L + i, mname(i)))

    def run(dirs: (String, String), batches: Seq[Seq[(Long, String)]],
        tick: Boolean): DataFrame = {
      batches.zipWithIndex.foreach { case (b, k) =>
        ErStream.processBatch(b.toDF("mention_id", "mname"), k.toLong,
          catalog, dirs._1, dirs._2)
        if (tick)
          Graft.maintain(sp, indexRoots = Seq(dirs._1),
            snapshotRoots = Seq(dirs._2), policy = policy): Unit
      }
      ErStream.resolved(sp, catalog, dirs._1, dirs._2)
    }

    val ticked = run((s"$root/p", s"$root/l"),
      mentions.grouped(8).toSeq, tick = true)
      .collect().map(_.toString).sorted.toSeq
    val oneShot = run((s"$root/p1", s"$root/l1"),
      Seq(mentions), tick = false)
      .collect().map(_.toString).sorted.toSeq
    assert(ticked == oneShot, "maintained ER stream diverged from recompute")

    // snapshot retention: the entity-sized label root holds the policy
    // pair (+ at most the in-flight one), never one snapshot per batch
    assert(dirCount(s"$root/l") <= policy.snapshotKeep + 1,
      s"label snapshots unretained: ${dirCount(s"$root/l")}")
    assert(dirCount(s"$root/p") <= 4,
      s"link-log run count unbounded: ${dirCount(s"$root/p")}")
  }

  test("small-state monolithic branch: below monolithicBelowBytes a " +
      "tick contracts via compactState when pressure trips — labels ≡ " +
      "recompute, alias log cleared, tiered machinery never runs") {
    val sp = s
    import sp.implicits._
    val root = java.nio.file.Files.createTempDirectory("maint_mono").toString
    val (idx, prs, lbl) = (s"$root/i", s"$root/p", s"$root/l")
    // the DEFAULT policy: 4 MiB threshold — this toy state sits far
    // below it, so the tick must take the monolithic branch
    val policy = Graft.MaintenancePolicy(aliasPartialBudget = 4)

    val base = (1 to 30).map(i => s"m$i").mkString(" ")
    def mut(at: Int) = (1 to 30)
      .map(i => if (i == at) "Y" else s"m$i").mkString(" ")
    def batchDocs(k: Int): Seq[(Long, String)] =
      if (k == 0) Seq((1L, base))
      else Seq((100L + k, mut((k % 28) + 2)))

    var monoTicks = 0
    var tieredFolds = 0
    (0 until 16).foreach { k =>
      ClusterStream.processBatch(batchDocs(k).toDF("doc_id", "text"),
        k.toLong, "doc_id", "text", idx, prs, lbl, 0.5)
      val st = Graft.maintain(sp, labelDirs = Seq(lbl), policy = policy)
      monoTicks += st.monolithicContractions
      tieredFolds += st.labelFolds.folds
    }
    assert(monoTicks >= 1,
      "pressure above the alias budget never took the monolithic branch")
    assert(tieredFolds == 0,
      "the tiered path ran below the monolithic threshold")
    // the barrier actually contracted: alias partials at the
    // kept-newest working set, never one per batch
    assert(dirCount(s"$lbl/alias") <= policy.aliasPartialBudget + 1,
      s"alias log uncleared: ${dirCount(s"$lbl/alias")} partials")

    val allDocs = (0 until 16).flatMap(batchDocs).toDF("doc_id", "text")
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(rows(ClusterStream.clusterLabels(sp, lbl)) ==
      rows(graft.operators.DedupClusters.clusters(allDocs,
        "doc_id", "text", 0.5)),
      "monolithic-branch maintenance diverged from recompute")

    // replay of the NEWEST batch across the monolithic barrier — the
    // crash-between-tick-and-checkpoint-commit window the auto-tick
    // sits in: compactStateSafe's newest−1 closure must leave the
    // replay's inputs (and so its partials and the served labels)
    // bit-identical. This is exactly where the newest-INCLUSIVE
    // compactState would diverge (merges pre-applied → empty alias
    // partial + singleton delta rows on replay).
    assert(ClusterStream.compactStateSafe(sp, lbl) >= 0)
    val before = rows(ClusterStream.clusterLabels(sp, lbl))
    ClusterStream.processBatch(batchDocs(15).toDF("doc_id", "text"),
      15L, "doc_id", "text", idx, prs, lbl, 0.5)
    assert(rows(ClusterStream.clusterLabels(sp, lbl)) == before,
      "a replay across the monolithic tick barrier changed the labels")
  }

  test("auto-tick replay safety: a foreachBatch replay after a " +
      "mid-stream maintain() tick is a verbatim no-op") {
    val sp = s
    import sp.implicits._
    val root = java.nio.file.Files.createTempDirectory("tick_replay").toString
    val (idx, prs) = (s"$root/i", s"$root/p")

    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    def mut(at: Int) = (1 to 30)
      .map(i => if (i == at) "X" else s"w$i").mkString(" ")
    def batchDocs(k: Int): Seq[(Long, String)] =
      Seq((k * 2L, if (k == 0) base else mut(k + 1)),
          (k * 2L + 1, (1 to 30).map(i => s"b${k}z$i").mkString(" ")))

    // the stream with the builder-declared tick (the s_dedup_index
    // schedule): folds fire mid-stream at fanIn=2
    val docDir = s"$root/docs"
    (0 until 4).foreach { b =>
      batchDocs(b).toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(s"$docDir/b$b")
    }
    val schema = "doc_id BIGINT, text STRING"
    DedupStream.start(
      sp.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$docDir/*"),
      "doc_id", "text", idx, prs, s"$root/chk", 0.5,
      maintainEvery = 1, policy = policy)
      .awaitTermination()

    def state() = (
      sp.read.parquet(prs).drop("batch").collect()
        .map(_.toString).sorted.toSeq,
      IdSidecar.knownIds(sp, idx, "doc_id",
        (0L until 8L).toDF("doc_id"), 99L)
        .collect().map(_.getLong(0)).sorted.toSeq)
    val before = state()
    // a replay of the NEWEST batch over the ticked (folded) layout —
    // the crash-between-tick-and-checkpoint-commit case
    DedupStream.processBatch(batchDocs(3).toDF("doc_id", "text"), 3L,
      "doc_id", "text", idx, prs, 0.5): Unit
    assert(state() == before,
      "a replay across the auto-tick changed the maintained state")
  }
}
