package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Exact duplicated-substring removal [N] — the ExactSubstr discipline of
  * Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
  * Better"), adapted to token granularity so the whole pass is relational:
  * any span of >= K consecutive tokens that occurs at least twice ANYWHERE
  * in the corpus (across documents or repeated within one) is cut from
  * every document that contains it, and the surviving tokens are stitched
  * back together in order. Unlike the minhash/simhash family (which drops
  * whole near-duplicate documents), this removes boilerplate SPANS —
  * headers, license blocks, navigation chrome — while keeping the unique
  * remainder of each page.
  *
  * Relational shape (no suffix array needed at token granularity):
  *   1. positional K-gram explode: (doc_id, start, md5(gram)) — map-side,
  *      amplification exactly x(n-K+1) per doc;
  *   2. global gram frequency (ONE hash exchange on the gram hash,
  *      partial counts combine map-side) -> the duplicated-gram set;
  *   3. join occurrences back to the duplicated set (same gram-hash key,
  *      so AQE plans it off the same exchange) -> covered intervals
  *      [start, start+K-1];
  *   4. per-document gaps-and-islands merge of overlapping intervals
  *      (window cumulative max — partitioned by doc, never global);
  *   5. one equi-join of islands back to the token arrays, then a
  *      map-side HOF filter drops covered positions and re-joins the
  *      survivors.
  *
  * Every wide stage keys on either the gram hash or doc_id — both
  * uniformly distributed — and per-doc state (the merged island list) is
  * bounded by document length, so the same plan holds on a 100 TB corpus:
  * the gram exchange is the only stage that sees corpus-scale cardinality
  * and it is a plain hash aggregation. Determinism: md5 gram hashes, no
  * floats anywhere; the DuckDB oracle mirrors the construction token for
  * token and the output hashes the cleaned text, so hash_match certifies
  * the exact surviving-token sequence of every document.
  */
object SubstrDedup extends graft.QueryModule {

  /** Minimum duplicated run length, in tokens. Lee et al. use 50 BPE
    * tokens on web crawl; the synthetic docs are short, so K=8 exercises
    * the same machinery with actual hits. */
  private val K = 8

  /** Library form: docs(idCol, textCol) -> (idCol, n_tokens, n_removed,
    * clean_md5). See the object doc for the plan shape. */
  def removeDuplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                            k: Int = K): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      split(col(textCol), " ").as("ws"))
    // 1. positional k-grams (docs shorter than k contribute none and are
    //    re-attached whole by the left join in step 5)
    val grams = toks.filter(size(col("ws")) >= k)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(ws) - ${k - 1}), " +
          s"i -> struct(i as st, md5(array_join(slice(ws, i, $k), ' ')) as g))"))
        .as("sg"))
      .select(col("doc_id"), col("sg.st").as("st"), col("sg.g").as("g"))
    // 2. duplicated grams: global occurrence count >= 2
    val dupG = grams.groupBy(col("g")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2).select(col("g"))
    // 3. covered intervals
    val ivl = grams.join(dupG, "g")
      .select(col("doc_id"), col("st"), (col("st") + (k - 1)).as("en"))
    // 4. merge overlapping/adjacent intervals per doc (start is unique per
    //    doc, so the window order is total and the cumulative max is
    //    deterministic)
    val wPrev = Window.partitionBy(col("doc_id")).orderBy(col("st"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy(col("doc_id")).orderBy(col("st"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val islands = ivl
      .withColumn("brk",
        when(col("st") > coalesce(max(col("en")).over(wPrev), lit(0)) + 1,
          lit(1L)).otherwise(lit(0L)))
      .withColumn("iid", sum(col("brk")).over(wCum))
      .groupBy(col("doc_id"), col("iid"))
      .agg(min(col("st")).as("st"), max(col("en")).as("en"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("st"), col("en")))).as("cov"))
    // 5. drop covered positions, stitch the remainder (map-side HOFs; the
    //    island list is tiny relative to the doc, so exists() is cheap)
    toks.join(islands, Seq("doc_id"), "left")
      .select(col("doc_id"), size(col("ws")).cast("long").as("n_tokens"),
        expr("filter(transform(ws, (w, i) -> struct(i + 1 as p, w as w)), " +
          "x -> cov is null or " +
          "not exists(cov, c -> x.p between c.st and c.en))").as("kept"))
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - size(col("kept"))).cast("long").as("n_removed"),
        md5(expr("array_join(transform(kept, x -> x.w), ' ')"))
          .as("clean_md5"))
  }

  private def substringDedup(s: SparkSession, d: String): DataFrame =
    removeDuplicatedSpans(Tables.documents(s, d), "doc_id", "text")
      .orderBy("doc_id")

  private val substringDedupOracle =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |grams AS (
       |  SELECT doc_id, CAST(i AS INTEGER) AS st, CAST(i + ${K - 1} AS INTEGER) AS en,
       |         md5(array_to_string(list_slice(ws, i, i + ${K - 1}), ' ')) AS g
       |  FROM toks, unnest(range(1, len(ws) - ${K - 2})) t(i)
       |  WHERE len(ws) >= $K),
       |dupg AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
       |ivl AS (SELECT doc_id, st, en FROM grams
       |        WHERE g IN (SELECT g FROM dupg)),
       |m AS (
       |  SELECT doc_id, st, en,
       |         CASE WHEN st > COALESCE(max(en) OVER (
       |                PARTITION BY doc_id ORDER BY st
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |              0) + 1 THEN 1 ELSE 0 END AS brk
       |  FROM ivl),
       |isl AS (
       |  SELECT doc_id, st, en,
       |         sum(brk) OVER (PARTITION BY doc_id ORDER BY st
       |                        ROWS UNBOUNDED PRECEDING) AS iid
       |  FROM m),
       |merged AS (
       |  SELECT doc_id, iid, min(st) AS st, max(en) AS en
       |  FROM isl GROUP BY doc_id, iid),
       |pos AS (
       |  SELECT doc_id, ws, CAST(p AS INTEGER) AS p
       |  FROM toks, unnest(range(1, len(ws) + 1)) t(p)),
       |kept AS (
       |  SELECT t.doc_id, t.p, t.ws[t.p] AS w
       |  FROM pos t
       |  WHERE NOT EXISTS (SELECT 1 FROM merged m
       |                    WHERE m.doc_id = t.doc_id
       |                      AND t.p BETWEEN m.st AND m.en))
       |SELECT t.doc_id,
       |       CAST(len(t.ws) AS BIGINT) AS n_tokens,
       |       CAST(len(t.ws) - count(k.p) AS BIGINT) AS n_removed,
       |       md5(COALESCE(string_agg(k.w, ' ' ORDER BY k.p), ''))
       |         AS clean_md5
       |FROM toks t LEFT JOIN kept k ON k.doc_id = t.doc_id
       |GROUP BY t.doc_id, len(t.ws)
       |ORDER BY t.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_substring_dedup" -> substringDedup)

  val oracles: Map[String, String] = Map(
    "text_substring_dedup" -> substringDedupOracle)
}
