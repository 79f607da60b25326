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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_rake" -> rake)

  val oracles: Map[String, String] = Map(
    "text_rake" -> rakeOracle)
}
