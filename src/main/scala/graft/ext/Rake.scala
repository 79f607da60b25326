package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** RAKE keyword extraction [N] (Rose et al. 2010, "Rapid Automatic
  * Keyword Extraction"): candidate phrases are the maximal stopword-free
  * token runs; each content word scores degree/frequency, where freq
  * counts the word's occurrences and degree sums the lengths of the
  * phrases it appears in (co-occurrence within phrase, self included —
  * the standard formulation).
  *
  * The phrase segmentation is the gaps-and-islands trick, not regex: a
  * per-document running count of stopwords numbers each stopword-free
  * island, which both engines compute identically as a window sum.
  * Everything is exact-integer hash aggs over one corpus scan; the one
  * division happens once per vocabulary word (bounded domain). */
object Rake extends graft.QueryModule {

  private val stops = Seq("a", "the")

  private def rake(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .filter(col("w") =!= "")
      .withColumn("stop", col("w").isin(stops: _*))
      .withColumn("ph", sum(when(col("stop"), 1).otherwise(0)).over(
        Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
      .filter(!col("stop"))
      .select(col("doc_id"), col("ph"), col("w"))
    val plen = toks.groupBy(col("doc_id"), col("ph"))
      .agg(count(lit(1)).as("len"))
    toks.join(plen, Seq("doc_id", "ph"))
      .groupBy(col("w").as("word"))
      .agg(count(lit(1)).as("freq"), sum(col("len")).as("degree"))
      .selectExpr("word", "cast(freq as bigint) as freq",
        "cast(degree as bigint) as degree",
        "cast(degree as double) / cast(freq as double) as score")
      .orderBy(col("score").desc, col("word"))
  }

  private val rakeOracle =
    """WITH toks AS MATERIALIZED (
      |  SELECT doc_id, CAST(i AS BIGINT) AS pos, ws[CAST(i AS INTEGER)] AS w
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |       unnest(range(1, len(ws) + 1)) t(i)
      |  WHERE ws[CAST(i AS INTEGER)] <> ''),
      |isl AS (
      |  SELECT doc_id, w, w IN ('a', 'the') AS stop,
      |         sum(CASE WHEN w IN ('a', 'the') THEN 1 ELSE 0 END)
      |           OVER (PARTITION BY doc_id ORDER BY pos
      |                 ROWS UNBOUNDED PRECEDING) AS ph
      |  FROM toks),
      |nonstop AS (SELECT doc_id, ph, w FROM isl WHERE NOT stop),
      |plen AS (
      |  SELECT doc_id, ph, count(*) AS len FROM nonstop GROUP BY 1, 2)
      |SELECT n.w AS word, CAST(count(*) AS BIGINT) AS freq,
      |       CAST(sum(p.len) AS BIGINT) AS degree,
      |       CAST(sum(p.len) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS score
      |FROM nonstop n JOIN plen p USING (doc_id, ph)
      |GROUP BY n.w
      |ORDER BY score DESC, word""".stripMargin

  // ---- TextRank ------------------------------------------------------

  private val trIters = 10
  private val One12 = 1000000000000L

  /** TextRank keyword scores [N] (Mihalcea & Tarau 2004): weighted
    * PageRank over the word co-occurrence graph — stopwords dropped,
    * then every content-word pair within distance ≤ 2 of the filtered
    * sequence becomes an undirected edge weighted by corpus count.
    *
    * Scale shape: tokenization + the window-2 pair expansion + the
    * (a, b) hash agg are the data-scale passes (per-doc window joins,
    * map-side combinable); the graph itself is bounded by the
    * VOCABULARY, so the damped fixpoint runs on the collected ≤|V|²
    * edge relation (metadata-scale, the `attr_markov_removal`
    * precedent). Determinism: transition weights quantize once to the
    * ×10¹² integer grid (`round_even` of exact-int ratios — identical
    * IEEE both engines); each of the 10 damped rounds is exact integer
    * arithmetic (85·S/(100·10¹²) with explicit half-even division), so
    * the scores are bit-identical and the oracle unrolls the same
    * rounds as generated CTEs. */
  private def textRank(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .filter(col("w") =!= "" && !col("w").isin(stops: _*))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
      .select(col("doc_id"), col("rn"), col("w"))
    val edges = toks.as("x").join(toks.as("y"),
        col("x.doc_id") === col("y.doc_id") &&
          col("y.rn") > col("x.rn") && col("y.rn") <= col("x.rn") + 2 &&
          col("x.w") =!= col("y.w"))
      .select(least(col("x.w"), col("y.w")).as("a"),
        greatest(col("x.w"), col("y.w")).as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // vocabulary-bounded fixpoint on the collected graph
    val dirW = edges.flatMap { case (a, b, n) => Seq((a, b, n), (b, a, n)) }
    val outW = dirW.groupBy(_._1).map { case (j, rows) => j -> rows.map(_._3).sum }
    val prob12 = dirW.map { case (j, i, n) =>
      (j, i, math.rint(n.toDouble / outW(j).toDouble * 1e12).toLong)
    }
    val vocab = outW.keys.toSeq.sorted
    val nV = vocab.size
    val base12 = math.rint(0.15 / nV * 1e12).toLong
    val inbound = prob12.groupBy(_._2)
    var p12: Map[String, Long] =
      vocab.map(_ -> math.rint(1e12 / nV).toLong).toMap
    for (_ <- 1 to trIters) {
      p12 = vocab.map { i =>
        val s85 = inbound.getOrElse(i, Array.empty[(String, String, Long)])
          .map { case (j, _, pr) => BigInt(pr) * BigInt(p12(j)) * 85 }.sum
        val den = BigInt(100) * One12
        val b0 = s85 / den; val r = s85 % den; val half = den / 2
        i -> (base12 +
          (b0 + (if (r > half) 1 else if (r < half) 0 else b0 % 2)).toLong)
      }.toMap
    }
    val out = vocab.map(w => (w, p12(w).toDouble / 1e12))
    s.createDataFrame(out).toDF("word", "score")
      .orderBy(col("score").desc, col("word"))
  }

  private def textRankOracle: String = {
    val den = s"(100 * ${One12}::HUGEINT)"
    val iters = (1 to trIters).map { k =>
      s"""p$k AS (
         |  SELECT v.w AS w, b.base12 +
         |         (x.s85 // $den
         |          + CASE WHEN x.s85 % $den > $den // 2 THEN 1
         |                 WHEN x.s85 % $den = $den // 2
         |                   THEN (x.s85 // $den) % 2
         |                 ELSE 0 END) AS p12
         |  FROM vocab v CROSS JOIN basec b
         |  LEFT JOIN (
         |    SELECT t.i AS w, sum(t.prob12 * p.p12 * 85) AS s85
         |    FROM prob t JOIN p${k - 1} p ON p.w = t.j
         |    GROUP BY t.i) x ON x.w = v.w)""".stripMargin
    }.mkString(",\n")
    s"""WITH toks AS MATERIALIZED (
       |  SELECT doc_id, row_number() OVER (PARTITION BY doc_id ORDER BY pos)
       |           AS rn, w
       |  FROM (
       |    SELECT doc_id, CAST(i AS BIGINT) AS pos, ws[CAST(i AS INTEGER)] AS w
       |    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |         unnest(range(1, len(ws) + 1)) t(i)) u
       |  WHERE w <> '' AND w NOT IN ('a', 'the')),
       |edges AS MATERIALIZED (
       |  SELECT least(x.w, y.w) AS a, greatest(x.w, y.w) AS b,
       |         CAST(count(*) AS HUGEINT) AS n
       |  FROM toks x JOIN toks y
       |    ON x.doc_id = y.doc_id AND y.rn > x.rn AND y.rn <= x.rn + 2
       |   AND x.w <> y.w
       |  GROUP BY 1, 2),
       |dirw AS (SELECT a AS j, b AS i, n FROM edges
       |         UNION ALL SELECT b, a, n FROM edges),
       |outw AS (SELECT j, sum(n) AS wout FROM dirw GROUP BY j),
       |prob AS MATERIALIZED (
       |  SELECT d.j, d.i,
       |         CAST(round_even(CAST(d.n AS DOUBLE) / CAST(o.wout AS DOUBLE)
       |              * 1000000000000.0, 0) AS HUGEINT) AS prob12
       |  FROM dirw d JOIN outw o USING (j)),
       |vocab AS (SELECT DISTINCT j AS w FROM dirw),
       |nv AS (SELECT count(*) AS n FROM vocab),
       |basec AS (
       |  SELECT CAST(round_even(0.15 / CAST(n AS DOUBLE)
       |              * 1000000000000.0, 0) AS HUGEINT) AS base12,
       |         CAST(round_even(1000000000000.0 / CAST(n AS DOUBLE), 0)
       |              AS HUGEINT) AS init12
       |  FROM nv),
       |p0 AS (SELECT v.w, b.init12 AS p12 FROM vocab v CROSS JOIN basec b),
       |$iters
       |SELECT w AS word, CAST(p12 AS DOUBLE) / 1e12 AS score
       |FROM p$trIters
       |ORDER BY score DESC, word""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_rake" -> rake,
    "text_textrank" -> textRank)

  val oracles: Map[String, String] = Map(
    "text_rake" -> rakeOracle,
    "text_textrank" -> textRankOracle)
}
