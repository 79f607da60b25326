package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Retrieval-pipeline compositions [N]: CCNet-style per-language
  * perplexity bucketing (the quality gate CCNet/RedPajama apply before
  * training) and a chunked BM25 retrieval pass (the RAG serving shape:
  * chunk → index → score → top-k per query) — both assembled from the
  * shipped text operators' disciplines as ONE declarative plan each.
  *
  * Scale shape: token/bigram explodes are the only data-scale stages;
  * count relations are vocabulary-scale (equi-joined, small side
  * broadcast), per-doc/per-chunk scores come from ONE hash agg of
  * pinned-decimal terms (order-invariant), and the tertile/top-k
  * windows partition by language/query — never a global sort of the
  * corpus. */
object Retrieval extends graft.QueryModule {

  private def dd(c: Column): Column = c.cast("double")

  /** Signed half-even integer division as a SQL expression (`div` on
    * Spark, `//` in the oracle — both applied to the positive
    * magnitude, the `ts_holt_linear` walk arithmetic). The mean-of-
    * pinned-decimals division MUST run on the integer grid: an exact
    * 6dp sum over an integer count lands exactly on the half grid
    * whenever the count divides the scaled sum (measured: doc 602 at
    * sf0.1, −129.563603/38 = −3.4095685), and Spark's bround (exact
    * BigDecimal) and DuckDB's round_even (scaled double) disagree on
    * that half. */
  private def divHESql(n: String, den: String, div: String): String = {
    def pos(m: String) =
      s"(($m) $div ($den) + (case when (($m) % ($den)) * 2 > ($den) then 1 " +
        s"when (($m) % ($den)) * 2 = ($den) then ((($m) $div ($den))) % 2 " +
        s"else 0 end))"
    s"(case when ($n) < 0 then -${pos(s"-($n)")} else ${pos(n)} end)"
  }

  /** CCNet bucketing: score each doc with the per-LANGUAGE add-one
    * bigram LM (its own language's counts and vocabulary — the per-lang
    * LM is the point of CCNet), then cut head/middle/tail tertiles
    * WITHIN each language by rank (ntile over a fully tie-broken
    * order). Head = most-fluent-in-language. 1-word docs carry no
    * bigram evidence and are excluded, as in `text_bigram_lm`. */
  private def ccnetBuckets(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), col("lang"), explode(expr(
        "transform(sequence(1, size(ws) - 1)," +
          " i -> struct(ws[i - 1] AS w1, ws[i] AS w2))")).as("p"))
      .select(col("doc_id"), col("lang"),
        col("p.w1").as("w1"), col("p.w2").as("w2"))
    val big = pairs.groupBy("lang", "w1", "w2").agg(count(lit(1)).as("cb"))
    val uni = pairs.groupBy("lang", "w1").agg(count(lit(1)).as("cu"))
    val vocab = Tables.documents(s, d)
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .groupBy("lang").agg(countDistinct(col("w")).as("v"))
    val scored = pairs
      .join(big, Seq("lang", "w1", "w2"))
      .join(broadcast(uni), Seq("lang", "w1"))
      .join(broadcast(vocab), Seq("lang"))
      .withColumn("lp",
        bround(log(dd(col("cb") + 1) / dd(col("cu") + col("v"))), 6)
          .cast("decimal(12,6)"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("lp")).as("ssum"), count(lit(1)).as("cnt"))
      .select(col("doc_id"), col("lang"),
        (expr(divHESql("cast(ssum * 1000000 as bigint)", "cnt", "div"))
          .cast("double") / lit(1.0e6)).as("score"))
    scored
      .withColumn("t", ntile(3).over(Window.partitionBy(col("lang"))
        .orderBy(col("score").desc, col("doc_id"))))
      .select(col("doc_id"), col("lang"), col("score"),
        when(col("t") === 1, "head").when(col("t") === 2, "middle")
          .otherwise("tail").as("ppl_bucket"))
      .orderBy("doc_id")
  }

  private def ccnetBucketsOracle: String =
    """WITH pairs AS MATERIALIZED (
      |  SELECT doc_id, lang, ws[i] AS w1, ws[i + 1] AS w2
      |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS ws
      |        FROM documents),
      |       LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i)),
      |big AS (SELECT lang, w1, w2, count(*) AS cb FROM pairs GROUP BY 1, 2, 3),
      |uni AS (SELECT lang, w1, count(*) AS cu FROM pairs GROUP BY 1, 2),
      |vocab AS (
      |  SELECT lang, count(DISTINCT w) AS v FROM (
      |    SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
      |  GROUP BY 1),
      |sums AS (
      |  SELECT p.doc_id, p.lang,
      |         CAST(sum(CAST(round_even(
      |             ln(CAST(b.cb + 1 AS DOUBLE)
      |                / CAST(u.cu + vocab.v AS DOUBLE)), 6)
      |           AS DECIMAL(12,6))) * 1000000 AS HUGEINT) AS sm,
      |         count(*) AS c
      |  FROM pairs p JOIN big b USING (lang, w1, w2)
      |  JOIN uni u USING (lang, w1) JOIN vocab USING (lang)
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT doc_id, lang,
      |         CAST(__DIVHE__ AS DOUBLE) / 1.0e6 AS score
      |  FROM sums)
      |SELECT doc_id, lang, score,
      |       CASE ntile(3) OVER (PARTITION BY lang
      |                           ORDER BY score DESC, doc_id)
      |         WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
      |         ELSE 'tail' END AS ppl_bucket
      |FROM scored ORDER BY doc_id""".stripMargin
      .replace("__DIVHE__", divHESql("sm", "c", "//"))

  private val ragQueries = Seq(
    (1, Seq("stream", "window", "agg")),
    (2, Seq("join", "hash", "merge")),
    (3, Seq("scan", "filter", "column")))

  /** RAG retrieval: 32-token chunks, BM25(k1=1.2, b=0.75) per chunk
    * against each query's term set (same pinned idf/term arithmetic as
    * `text_bm25`), top-5 chunks per query with a fully tie-broken
    * rank. The chunk token explode is the data-scale stage; query
    * terms and per-term document frequencies broadcast. */
  private def ragRetrieve(s: SparkSession, d: String): DataFrame = {
    val q = s.createDataFrame(
      ragQueries.flatMap { case (id, ts) => ts.map(t => (id, t)) })
      .toDF("qid", "term")
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), expr("cast(pos div 32 as int)").as("chunk_id"),
        col("col").as("w"))
    val dl = toks.groupBy("doc_id", "chunk_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("nd"), sum("dl").as("toktot"))
    val tf = toks.join(broadcast(q), col("w") === col("term"))
      .groupBy("qid", "doc_id", "chunk_id", "w")
      .agg(count(lit(1)).as("tf"))
    val dfq = tf.select("w", "doc_id", "chunk_id").distinct()
      .groupBy("w").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfq), "w")
      .join(dl, Seq("doc_id", "chunk_id"))
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", dd(col("toktot")) / dd(col("nd")))
      .withColumn("idf",
        bround(log(lit(1.0) + (dd(col("nd")) - dd(col("df")) + lit(0.5)) /
          (dd(col("df")) + lit(0.5))), 6))
      .withColumn("c", bround(col("idf") * (dd(col("tf")) * lit(2.2)) /
        (dd(col("tf")) + lit(1.2) *
          (lit(0.25) + lit(0.75) * dd(col("dl")) / col("avgdl"))), 8)
        .cast("decimal(18,8)"))
      .groupBy("qid", "doc_id", "chunk_id")
      .agg(sum(col("c")).as("sc"))
    scored
      .withColumn("rank", row_number().over(Window.partitionBy(col("qid"))
        .orderBy(col("sc").desc, col("doc_id"), col("chunk_id"))))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("rank"), col("doc_id"), col("chunk_id"),
        dd(col("sc")).as("score"))
      .orderBy("qid", "rank")
  }

  private def ragRetrieveOracle: String = {
    val values = ragQueries
      .flatMap { case (id, ts) => ts.map(t => s"($id, '$t')") }
      .mkString(", ")
    s"""WITH q(qid, term) AS (VALUES $values),
       |t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |toks AS MATERIALIZED (
       |  SELECT doc_id, CAST((i - 1) // 32 AS INTEGER) AS chunk_id,
       |         ws[i] AS w
       |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i)),
       |dl AS (SELECT doc_id, chunk_id, count(*) AS dl
       |       FROM toks GROUP BY 1, 2),
       |stats AS (SELECT count(*) AS nd, sum(dl) AS toktot FROM dl),
       |tf AS (SELECT q.qid, doc_id, chunk_id, w, count(*) AS tf
       |       FROM toks JOIN q ON toks.w = q.term GROUP BY 1, 2, 3, 4),
       |dfq AS (SELECT w, count(*) AS df FROM
       |          (SELECT DISTINCT w, doc_id, chunk_id FROM tf) GROUP BY 1),
       |terms AS (
       |  SELECT tf.qid, tf.doc_id, tf.chunk_id,
       |         CAST(round_even(
       |           round_even(ln(1.0 + (CAST(nd AS DOUBLE)
       |               - CAST(df AS DOUBLE) + 0.5)
       |             / (CAST(df AS DOUBLE) + 0.5)), 6)
       |           * (CAST(tf AS DOUBLE) * 2.2)
       |           / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75
       |              * CAST(dl AS DOUBLE)
       |              / (CAST(toktot AS DOUBLE) / CAST(nd AS DOUBLE)))), 8)
       |         AS DECIMAL(18,8)) AS c
       |  FROM tf JOIN dfq USING (w) JOIN dl USING (doc_id, chunk_id), stats),
       |sc AS (SELECT qid, doc_id, chunk_id, sum(c) AS sc
       |       FROM terms GROUP BY 1, 2, 3),
       |ranked AS (
       |  SELECT qid, CAST(row_number() OVER (PARTITION BY qid
       |           ORDER BY sc DESC, doc_id, chunk_id) AS INTEGER) AS rank,
       |         doc_id, chunk_id, CAST(sc AS DOUBLE) AS score
       |  FROM sc)
       |SELECT qid, rank, doc_id, chunk_id, score
       |FROM ranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin
  }

  /** LLM-watermark detection [N] (Kirchenbauer et al. 2023's green-list
    * scheme, detection side): a watermarking sampler seeds a "green"
    * half of the vocabulary from each previous token; watermarked text
    * over-selects green tokens. Detection needs only the hash: per
    * bigram, green = md5(w1 ‖ w2) parity; per doc
    * z = (2g − n)/√n (the binomial z against p = ½ — exact integers,
    * one mirrored sqrt/divide). Over an UNWATERMARKED corpus the spec
    * expects a centered z distribution and no 4σ flags — this is the
    * filter a training pipeline runs to keep synthetic text out. */
  private def watermarkDetect(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(ws) - 1)," +
          " i -> struct(ws[i - 1] AS w1, ws[i] AS w2))")).as("p"))
      .select(col("doc_id"),
        (expr("cast(graft_hex_long(md5(concat(p.w1, ':wm:', p.w2))," +
          " 1, 4) as int)") % 2).as("green"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"),
        sum(when(col("green") === 0, 1L).otherwise(0L)).as("g"))
      .select(col("doc_id"), col("n"), col("g"),
        (dd(col("g") * 2 - col("n")) / sqrt(dd(col("n")))).as("z"))
      .withColumn("flagged", col("z") > 4.0)
      .orderBy("doc_id")
  }

  private def watermarkDetectOracle: String =
    """WITH pairs AS (
      |  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |       LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i)),
      |scored AS (
      |  SELECT doc_id,
      |         ((strpos('0123456789abcdef', substr(md5(w1 || ':wm:' || w2),
      |             1, 1)) - 1) * 4096
      |          + (strpos('0123456789abcdef', substr(md5(w1 || ':wm:' || w2),
      |             2, 1)) - 1) * 256
      |          + (strpos('0123456789abcdef', substr(md5(w1 || ':wm:' || w2),
      |             3, 1)) - 1) * 16
      |          + (strpos('0123456789abcdef', substr(md5(w1 || ':wm:' || w2),
      |             4, 1)) - 1)) % 2 AS green
      |  FROM pairs),
      |agg AS (
      |  SELECT doc_id, count(*) AS n,
      |         sum(CASE WHEN green = 0 THEN 1 ELSE 0 END) AS g
      |  FROM scored GROUP BY 1)
      |SELECT doc_id, CAST(n AS BIGINT) AS n, CAST(g AS BIGINT) AS g,
      |       CAST(g * 2 - n AS DOUBLE) / sqrt(CAST(n AS DOUBLE)) AS z,
      |       CAST(g * 2 - n AS DOUBLE) / sqrt(CAST(n AS DOUBLE)) > 4.0
      |         AS flagged
      |FROM agg ORDER BY doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_ccnet_buckets" -> ccnetBuckets,
    "text_watermark_detect" -> watermarkDetect,
    "text_rag_retrieve" -> ragRetrieve)

  def oracles: Map[String, String] = Map(
    "text_ccnet_buckets" -> ccnetBucketsOracle,
    "text_watermark_detect" -> watermarkDetectOracle,
    "text_rag_retrieve" -> ragRetrieveOracle)
}
