package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The pure-SQL-text frontend of the engine: the same native Catalyst
  * kernels every DataFrame query uses, driven entirely from a
  * `spark.sql(...)` string over registered temp views — how a SQL-only
  * consumer (BI tool, notebook cell, `spark-sql` shell) runs this library.
  *
  * The kernels are injected as SQL functions at session build
  * ([[graft.Session]] calls `SparkSessionExtensions.injectFunction` for
  * `simhash32` / `h60_array` / `bpe_count` / `shingle_h60` / ... via
  * `TextHash.install`; `ensureRegistered` is the idempotent per-session
  * form for sessions built elsewhere). Because they register as NATIVE
  * functions, the SQL text plans through the same codegen'd expressions
  * as the DataFrame API — two frontends, one engine, one plan. The
  * oracle replicates each kernel with the same shared builders the
  * DataFrame queries' oracles use, so the SQL path is held to the same
  * bit-exactness bar.
  */
object SqlSurface {

  private def qSqlSurface(s: SparkSession, d: String): DataFrame = {
    graft.functions.TextHash.ensureRegistered(s)
    Tables.spread(s, Tables.documents(s, d))
      .createOrReplaceTempView("graft_documents")
    s.sql(
      """SELECT doc_id,
        |       simhash32(h60_array(split(text, ' '))) AS simhash,
        |       cast(bpe_count(text) AS bigint) AS n_bpe,
        |       cast(size(shingle_h60(text, 4)) AS bigint) AS n_grams
        |FROM graft_documents
        |ORDER BY doc_id""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sql_surface" -> qSqlSurface _)

  val oracle: Map[String, String] = Map(
    "q_sql_surface" -> {
      val h60t = LlmQueries.h60Duck("t")
      val h60s = LlmQueries.h60Duck("s")
      s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
         |           FROM documents),
         |h AS (SELECT doc_id, text, toks,
         |             list_transform(toks, t -> $h60t) AS hs
         |      FROM t),
         |sh AS (SELECT doc_id, text, hs,
         |              ${LlmQueries.duckShingles4} AS shingles
         |       FROM h)
         |SELECT doc_id,
         |       cast(${LlmQueries.simhashBitsDuck} AS bigint) AS simhash,
         |       cast(${graft.functions.BpeCount.duckExpr("text")} AS bigint) AS n_bpe,
         |       cast(len(list_distinct(list_transform(shingles, s -> $h60s))) AS bigint) AS n_grams
         |FROM sh ORDER BY doc_id""".stripMargin
    })
}
