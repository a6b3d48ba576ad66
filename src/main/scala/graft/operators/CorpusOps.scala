package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline runs
  * between dedup and export (builder brief: first-class alongside the
  * dedup/similarity/text-analysis families):
  *
  *  - deterministic hash sampling (reproducible sub-corpora — a `rand()`
  *    sample can't be re-derived or oracle-checked; a key-hash sample is
  *    stable across runs, partitionings, and engines);
  *  - group-wise top-k selection (keep the best k documents per stratum);
  *  - decontamination (drop training documents whose exact text appears
  *    in an evaluation set — the left-anti fingerprint join every eval
  *    pipeline runs before training).
  *
  * Scale: the sample is a pure map-side filter (no shuffle); top-k per
  * group is one shuffle on the stratum key with WindowGroupLimit pruning
  * per partition; decontamination is a shuffled left-anti join on the
  * fingerprint where AQE broadcasts the (small) eval side.
  */
object CorpusOps {

  /** Knuth's multiplicative constant — an integer-exact stratifier both
    * Spark and DuckDB compute identically (no float, no hex parsing). */
  private val HashA = 2654435761L
  private val HashM = 4294967296L // 2^32

  /** 20% reproducible sample, stratified per document key: keep doc when
    * `(doc_id * A mod 2^32) mod 5 == 0`. */
  private def qStratifiedSample(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter((col("doc_id") * HashA % HashM) % 5 === 0)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** Top-3 documents per (lang, source) stratum by length, doc_id
    * tie-break — the keep-best-k selection step. */
  private def qGroupTopk(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("lang"), col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .orderBy(col("lang"), col("source"), col("rk"))
  }

  /** Decontamination: documents sharing an exact text fingerprint with the
    * evaluation set (stand-in: every 97th doc_id) are removed — including
    * non-eval duplicates of eval texts, which is the point of matching on
    * the fingerprint rather than the id. */
  private def qDecontaminate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), md5(col("text")).as("fp"))
    val evalFps = docs.filter(col("doc_id") % 97 === 0).select(col("fp"))
    docs.join(evalFps, Seq("fp"), "left_anti")
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stratified_sample" -> qStratifiedSample _,
    "q_group_topk" -> qGroupTopk _,
    "q_decontaminate" -> qDecontaminate _
  )

  val oracle: Map[String, String] = Map(
    "q_stratified_sample" ->
      s"""SELECT doc_id, lang, source, n_chars FROM documents
         |WHERE (doc_id * $HashA % $HashM) % 5 = 0
         |ORDER BY doc_id""".stripMargin,
    "q_group_topk" ->
      """SELECT doc_id, lang, source, n_chars,
        |       cast(row_number() OVER (PARTITION BY lang, source
        |                               ORDER BY n_chars DESC, doc_id) AS int) AS rk
        |FROM documents
        |QUALIFY rk <= 3
        |ORDER BY lang, source, rk""".stripMargin,
    "q_decontaminate" ->
      """WITH fp AS (SELECT doc_id, lang, md5(text) AS h FROM documents),
        |ev AS (SELECT DISTINCT h FROM fp WHERE doc_id % 97 = 0)
        |SELECT doc_id, lang FROM fp
        |WHERE h NOT IN (SELECT h FROM ev)
        |ORDER BY doc_id""".stripMargin
  )
}
