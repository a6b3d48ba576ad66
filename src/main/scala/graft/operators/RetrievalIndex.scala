package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maintained lexical retrieval index — incremental BM25 (r13): the
  * increment/takedown discipline applied to the RETRIEVAL family, which
  * completes the maintenance matrix across every index this library
  * serves (MinHash signature index, embedding sketch index, ANN serving
  * index, ER link/label state — and now the inverted index).
  *
  * State = the classical inverted-index pair:
  *   - `postings(doc_id, token, tf)` — one row per distinct (doc, term);
  *   - `doclens(doc_id, dl)` — per-document token counts.
  *
  * Every global in the BM25 formula (df, n_docs, total_dl) is an
  * ADDITIVE count derived from that state at query time
  * ([[LlmQueries.bm25Score]], the one scoring tail shared with the
  * from-text `q_bm25_topk` path), which is what makes maintenance EXACT
  * with no rescoring step:
  *   - ADDING a document batch appends its postings and doclens rows —
  *     df/n_docs/total_dl shift implicitly for every term, including
  *     terms the batch never mentions (their idf falls as N grows), and
  *     the derived scores equal a full-corpus recompute to the bit;
  *   - DELETING a batch anti-joins both tables — again every derived
  *     global lands exactly on the recompute-over-survivors value. A
  *     score CACHE would go stale on every add (idf moves globally);
  *     derived-at-query-time counts cannot.
  *
  * 100 TB shape: postings are token-keyed — bucket/partition them by
  * token so a query's scan prunes to its terms' postings lists (the
  * demo shows the pushed `In(token, …)` filter on the flat layout;
  * production buckets). Appends are new `batch=` partials and takedowns
  * fold into the [[graft.streaming.IndexCompaction]] write-then-swap,
  * exactly like the signature and vector indexes. The query-time work
  * is |terms| bounded: postings rows for the query terms, one bounded
  * df aggregate, the MAINTAINED 1-row (n_docs, total_dl) stats pair
  * (additive like everything else — increments add the batch's row,
  * takedowns subtract the deleted batch's; a query never pays a
  * corpus-wide doclens pass for two longs), top-k via
  * TakeOrderedAndProject. */
object RetrievalIndex {

  private val Terms = Seq("table", "window", "agg")
  private val K = 15

  /** Tokenize `docs` into the two state frames: postings = the
    * (doc, term) tf aggregate, doclens = a map-side projection. Shared
    * by the batch state builder and the streaming ingest
    * ([[graft.streaming.Bm25Stream]]) so the indexed form can never
    * drift between them. */
  private[graft] def tokenize(docs: DataFrame): (DataFrame, DataFrame) = {
    val base = docs.selectExpr("doc_id", "split(text, ' ') AS _toks")
    val postings = base
      .select(col("doc_id"), explode(col("_toks")).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val doclens = base.select(col("doc_id"),
      expr("cast(size(_toks) AS bigint)").as("dl"))
    (postings, doclens)
  }

  /** Serve the standard query from ANY (postings, doclens) pair — the
    * read path shared by the batch increment/takedown and the streaming
    * ingest. */
  private[graft] def serve(postings: DataFrame,
      doclens: DataFrame): DataFrame =
    LlmQueries.bm25Score(
      postings.filter(col("token").isin(Terms.distinct: _*)),
      doclens, K)

  private def writeState(docs: DataFrame, postingsPath: String,
      doclensPath: String, statsPath: String): Unit = {
    val (postings, doclens) = tokenize(docs)
    postings.write.mode("overwrite").parquet(postingsPath)
    doclens.write.mode("overwrite").parquet(doclensPath)
    // the maintained running pair — both additive, so increments add
    // the batch's row and takedowns subtract the deleted batch's; a
    // query never pays a corpus-wide pass for two longs
    statsOf(doclens).write.mode("overwrite").parquet(statsPath)
  }

  private def statsOf(doclens: DataFrame): DataFrame =
    doclens.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))

  /** Sum 1-row (n_docs, total_dl) frames with signs — the additive
    * stats maintenance (increment: +batch; takedown: −deleted). */
  private def statsMerge(parts: (DataFrame, Int)*): DataFrame =
    parts.map { case (st, sign) =>
      st.select((col("n_docs") * sign).as("n_docs"),
        (col("total_dl") * sign).as("total_dl"))
    }.reduce(_ unionByName _)
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("total_dl")).as("total_dl"))

  /** Build-once index state (the LabelBase discipline): `old` = the
    * corpus minus the incoming `doc_id % 5 = 4` batch (the increment
    * starts here), `all` = the full corpus (the takedown starts here). */
  private[graft] object Bm25Base {
    def ensure(s: SparkSession, d: String): (String, String, String) = {
      val root = FixtureBase.ensure("graft_bm25_base", 2, d,
          Seq("postings_old", "doclens_old", "stats_old")) { r =>
        writeState(Tables.spread(s, Tables.documents(s, d))
          .filter(expr("doc_id % 5 <> 4")),
          s"$r/postings_old", s"$r/doclens_old", s"$r/stats_old")
      }
      (s"$root/postings_old", s"$root/doclens_old", s"$root/stats_old")
    }

    def ensureAll(s: SparkSession, d: String): (String, String, String) = {
      val root = FixtureBase.ensure("graft_bm25_base", 2, d,
          Seq("postings_all", "doclens_all", "stats_all")) { r =>
        writeState(Tables.spread(s, Tables.documents(s, d)),
          s"$r/postings_all", s"$r/doclens_all", s"$r/stats_all")
      }
      (s"$root/postings_all", s"$root/doclens_all", s"$root/stats_all")
    }
  }

  /** The query-term tf rows of a NEW document batch — the only
    * tokenization an increment performs (the indexed corpus is state,
    * never re-read as text). */
  private def batchTf(batch: DataFrame): (DataFrame, DataFrame) = {
    val base = batch.selectExpr("doc_id", "split(text, ' ') AS _toks")
    val tf = base.select(col("doc_id"), explode(col("_toks")).as("token"))
      .filter(col("token").isin(Terms.distinct: _*))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dls = base.select(col("doc_id"),
      expr("cast(size(_toks) AS bigint)").as("dl"))
    (tf, dls)
  }

  /** INCREMENT (`q_bm25_increment`): serve the query from the persisted
    * state UNION the incoming batch's delta. The state side reads only
    * the query terms' postings (pushed `In(token, …)` — the bucketed
    * pruned scan at production layout) plus the doclens table; the
    * batch side tokenizes ONLY the batch. Scores ≡ the full-corpus
    * recompute (`q_bm25_topk`'s oracle, shared verbatim) because every
    * derived global is additive over the union. */
  private def qBm25Increment(s: SparkSession, d: String): DataFrame = {
    val (postingsPath, doclensPath, statsPath) = Bm25Base.ensure(s, d)
    val (btf, bdl) = batchTf(Tables.spread(s, Tables.documents(s, d))
      .filter(expr("doc_id % 5 = 4")))
    val tf = s.read.parquet(postingsPath)
      .filter(col("token").isin(Terms.distinct: _*))
      .unionByName(btf)
    val bdlM = Materialize(bdl) // feeds both the dl join and the stats add
    val doclens = s.read.parquet(doclensPath).unionByName(bdlM)
    // the maintained running pair + the batch's — never a corpus pass
    val stats = statsMerge(
      (s.read.parquet(statsPath), 1), (statsOf(bdlM), 1))
    LlmQueries.bm25ScoreStats(tf, doclens, stats, K)
  }

  /** TAKEDOWN (`q_bm25_retract`): anti-join the deleted batch out of
    * both state tables and serve — no tokenization anywhere (the plan
    * pin asserts it), no rescoring step, and the derived df/n_docs/
    * total_dl land exactly on the recompute-over-survivors values. */
  private def qBm25Retract(s: SparkSession, d: String): DataFrame = {
    val (postingsPath, doclensPath, statsPath) = Bm25Base.ensureAll(s, d)
    val del = Tables.documents(s, d)
      .filter(expr("doc_id % 7 = 3")).select(col("doc_id").as("_did"))
    val tf = s.read.parquet(postingsPath)
      .filter(col("token").isin(Terms.distinct: _*))
      .join(del, col("doc_id") === col("_did"), "left_anti")
    val doclens = s.read.parquet(doclensPath)
      .join(del, col("doc_id") === col("_did"), "left_anti")
    // running pair MINUS the deleted batch's — the deleted dl rows are
    // a |batch|-bounded semi-join read, never a survivor pass
    val stats = statsMerge(
      (s.read.parquet(statsPath), 1),
      (statsOf(s.read.parquet(doclensPath)
        .join(del, col("doc_id") === col("_did"), "left_semi")), -1))
    LlmQueries.bm25ScoreStats(tf, doclens, stats, K)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bm25_increment" -> qBm25Increment _,
    "q_bm25_retract" -> qBm25Retract _)

  val oracle: Map[String, String] = Map(
    // increment ≡ full recompute — the oracle IS q_bm25_topk's, shared
    // verbatim (one string, zero drift)
    "q_bm25_increment" -> LlmQueries.oracle("q_bm25_topk"),
    // takedown ≡ recompute over survivors — the same shared CTE chain
    // over the survivor corpus
    "q_bm25_retract" ->
      s"""WITH ${LlmQueries.bm25CteFrom(
             "(SELECT * FROM documents WHERE NOT (doc_id % 7 = 3))")}
         |SELECT doc_id, n_hit, score_micro FROM bm
         |ORDER BY score_micro DESC, doc_id LIMIT $K""".stripMargin)
}
