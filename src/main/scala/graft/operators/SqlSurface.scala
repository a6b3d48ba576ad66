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
  * `TextHash.install`, plus `dot_f32` via [[graft.functions.DotF32]] and
  * the `sample_k` aggregate via [[graft.functions.SampleK]];
  * `ensureRegistered` is the idempotent per-session form for sessions
  * built elsewhere). Because they register as NATIVE functions, the SQL
  * text plans through the same codegen'd expressions as the DataFrame
  * API — two frontends, one engine, one plan. The oracle replicates each
  * kernel with the same shared builders the DataFrame queries' oracles
  * use, so the SQL path is held to the same bit-exactness bar.
  *
  * The family covers the whole registered kernel set (r13):
  *  - `q_sql_surface` — the scalar text kernels (simhash32, h60_array,
  *    bpe_count, shingle_h60) in one SQL projection;
  *  - `q_sql_vector` — the vector kernel `dot_f32` driving cosine top-k
  *    from SQL text, with the 1-row query side pinned to a broadcast by
  *    an in-text `/*+ BROADCAST(q) */` hint (the SQL spelling of the
  *    DataFrame `broadcast(q)` call in `q_cosine_topk`);
  *  - `q_sql_sample` — the `sample_k` AGGREGATE from SQL text: grouped
  *    bottom-k reservoir sampling with the k-bounded partial state, then
  *    `LATERAL VIEW posexplode` back to rows — all inside one string;
  *  - `q_sql_analytics` — a join + window query in engine-portable ANSI
  *    SQL: ONE shared string (modulo table names) runs verbatim on both
  *    Spark and DuckDB, so the twins cannot drift by construction.
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

  /** Cosine top-100 driven entirely from SQL text — `q_cosine_topk`'s
    * exact semantics (same query vector, same 6-dp rounding, same
    * tie-break) through the other frontend. The `/*+ BROADCAST(q) */`
    * hint pins the 1-row query side to a broadcast nested-loop join from
    * inside the string, and `ORDER BY … LIMIT` still plans as
    * TakeOrderedAndProject — the full-scan side streams map-side, no
    * global sort (plan-pinned in PlanAuditSuite). The oracle is
    * `q_cosine_topk`'s, shared verbatim: identical arithmetic must mean
    * identical hashes. */
  private def qSqlVector(s: SparkSession, d: String): DataFrame = {
    graft.functions.DotF32.ensureRegistered(s)
    Tables.embeddings(s, d).createOrReplaceTempView("graft_embeddings")
    s.sql(
      """WITH q AS (SELECT embedding AS qv,
        |                  sqrt(dot_f32(embedding, embedding)) AS qn
        |           FROM graft_embeddings WHERE vec_id = 0)
        |SELECT /*+ BROADCAST(q) */ vec_id, label,
        |       round(dot_f32(embedding, qv)
        |             / (sqrt(dot_f32(embedding, embedding)) * qn), 6) AS sim
        |FROM graft_embeddings CROSS JOIN q
        |ORDER BY sim DESC, vec_id
        |LIMIT 100""".stripMargin)
  }

  /** The `sample_k` aggregate from SQL text: per-language deterministic
    * bottom-10 sampling — `q_sample_agg`'s exact semantics (same
    * [[CorpusOps.hashDrawDuck]] draw string in BOTH engines and BOTH
    * frontends) with grouping, the k-bounded aggregate, and the
    * `posexplode` back to (rk, doc_id, draw) rows all inside one string.
    * The aggregate's partial state is what makes this the 100 TB shape:
    * each mapper folds its rows into ≤ k pairs per language before
    * anything shuffles. Oracle = `q_sample_agg`'s window form, shared
    * verbatim. */
  private def qSqlSample(s: SparkSession, d: String): DataFrame = {
    graft.functions.SampleK.ensureRegistered(s)
    Tables.spread(s, Tables.documents(s, d))
      .createOrReplaceTempView("graft_documents")
    s.sql(
      s"""SELECT lang, cast(pos + 1 AS int) AS rk, pid AS doc_id,
         |       ${CorpusOps.hashDrawDuck("pid")} AS draw
         |FROM (SELECT lang, sample_k(${CorpusOps.hashDrawDuck("doc_id")},
         |                            doc_id, 10) AS picks
         |      FROM graft_documents GROUP BY lang)
         |LATERAL VIEW posexplode(picks) p AS pos, pid
         |ORDER BY lang, rk""".stripMargin)
  }

  /** Join + window purely from SQL text: top-5 customers by exact micro
    * revenue per market segment — orders ⋈ customer, grouped sum, ranked
    * window, top-k filter, one string. Spark plans the `rk <= 5` filter
    * over `row_number` as WindowGroupLimit (per-partition group limits
    * BEFORE the exchange — plan-pinned), so the window never sorts more
    * than each mapper's top 5 per segment past the shuffle. */
  private def qSqlAnalytics(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("graft_orders")
    Tables.customer(s, d).createOrReplaceTempView("graft_customer")
    s.sql(portableAnalyticsSql("graft_orders", "graft_customer"))
  }

  /** ONE engine-portable SQL string for the join + window query — the
    * same text (modulo the two table names) runs on Spark over temp
    * views and on DuckDB over the driver's parquet views, so the oracle
    * twin cannot drift from the query by construction. Revenue is
    * micro-quantized BEFORE the sum (the integer-exactness discipline),
    * and the outer `cast(sum(…) AS bigint)` narrows DuckDB's HUGEINT sum
    * back to the long Spark produces (a no-op on the Spark side). */
  private[graft] def portableAnalyticsSql(orders: String,
      customer: String): String =
    s"""WITH rev AS (
       |  SELECT c.c_mktsegment AS segment, o.o_custkey AS custkey,
       |         cast(sum(cast(round(o.o_totalprice * 1000000) AS bigint))
       |            AS bigint) AS rev_micro,
       |         count(*) AS n_orders
       |  FROM $orders o JOIN $customer c ON o.o_custkey = c.c_custkey
       |  GROUP BY c.c_mktsegment, o.o_custkey),
       |ranked AS (
       |  SELECT segment, custkey, rev_micro, n_orders,
       |         cast(row_number() OVER (PARTITION BY segment
       |                                 ORDER BY rev_micro DESC, custkey)
       |            AS int) AS rk
       |  FROM rev)
       |SELECT segment, rk, custkey, rev_micro, n_orders
       |FROM ranked WHERE rk <= 5
       |ORDER BY segment, rk""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sql_surface" -> qSqlSurface _,
    "q_sql_vector" -> qSqlVector _,
    "q_sql_sample" -> qSqlSample _,
    "q_sql_analytics" -> qSqlAnalytics _)

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
    },
    // Same semantics, same arithmetic, same oracle — shared verbatim with
    // the DataFrame-frontend twins so the two frontends are held to one
    // truth.
    "q_sql_vector" -> LlmQueries.oracle("q_cosine_topk"),
    "q_sql_sample" -> CorpusOps.oracle("q_sample_agg"),
    // The ONE portable string: DuckDB runs the identical text over its
    // parquet views.
    "q_sql_analytics" -> portableAnalyticsSql("orders", "customer"))
}
