package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY.md §2.K — deduplication operators for LLM training-data
  * pipelines: exact (hash-groupBy), word-set Jaccard (oracle-checked),
  * MinHash-LSH banding (deterministic seeded hashes, candidate-verify),
  * and SimHash (64-bit, banded hamming pairs).
  *
  * Scale posture: every stage is a pure DataFrame plan — shingle explode →
  * hash-agg signatures → band-bucket equi-join (shuffle on band hash, so
  * candidate generation is O(collisions), never O(n²)) → exact verify only
  * on candidates. At 100 TB the band join is the only wide stage and it
  * partitions by band hash; no driver-side state.
  */
object Dedup extends graft.QueryModule {

  private def docs(s: SparkSession, d: String): DataFrame = Tables.documents(s, d)

  /** Distinct words per doc as (doc_id, w) rows. */
  private def wordRows(df: DataFrame): DataFrame =
    df.select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("w"))

  /** Exact dedup by key (hash-groupBy form of `dropDuplicates`): one
    * surviving id + duplicate count per (lang, source, n_chars) bucket. */
  private def exact(s: SparkSession, d: String): DataFrame =
    docs(s, d).groupBy(col("lang"), col("source"), col("n_chars"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
      .orderBy("lang", "source", "n_chars")

  /** Exact n-gram (word-set) Jaccard near-dup pairs — the oracle-checked
    * ground truth the MinHash variant approximates. Bounded probe set. */
  private def ngramJaccard(s: SparkSession, d: String): DataFrame = {
    val w = wordRows(docs(s, d).filter(col("doc_id") < 150))
    val cnt = w.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = w.as("a").join(w.as("b"),
        col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(cnt.as("na"), col("i") === col("na.doc_id"))
      .join(cnt.as("nb"), col("j") === col("nb.doc_id"))
      .select(col("i"), col("j"),
        (col("c") / (col("na.n") + col("nb.n") - col("c"))).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
      .orderBy("i", "j")
  }

  private val NumHashes = 16
  private val NumBands = 2 // 8 rows per band: fewer, higher-precision buckets
  // this synthetic corpus draws every doc from one small vocabulary, so
  // word-set similarity is pervasive; bound the self-join probe set the
  // same way the oracle-checked ngram query does (explicit, not silent)
  private val MinhashProbeLimit = 1000

  /** MinHash signature: ONE xxhash64 per word + the single-pass custom
    * aggregate [[graft.functions.MinHashAgg]] (16 derived permutations
    * via splitmix64 mixing, one 16-long buffer update per word — replaces
    * 16 independent seeded-hash evaluations feeding 16 agg slots). */
  private def minhashSig(w: DataFrame): DataFrame =
    w.groupBy(col("doc_id")).agg(
      graft.functions.VectorFunctions.minhash(xxhash64(col("w")), NumHashes).as("sig"))

  /** MinHash+LSH near-dup detection: seeded signatures → band buckets →
    * bucket equi-join candidates → exact Jaccard verify (>= 0.8) computed
    * per candidate pair with array_intersect (no shuffle explosion — the
    * verify stage is a scalar op on the pair, not a re-join over words).
    * Deterministic but not SQL-mirrorable (xxhash64) — rows-only check. */
  private def minhash(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val bounded = docs(s, d).filter(col("doc_id") < MinhashProbeLimit)
    val w = wordRows(bounded)
    val sig = minhashSig(w)
    val rowsPerBand = NumHashes / NumBands
    val bandStructs = (0 until NumBands).map { b =>
      val cols = (0 until rowsPerBand).map(r => element_at(col("sig"), b * rowsPerBand + r + 1))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("h"))
    }
    val bands = sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bh"))
      .select(col("doc_id"), col("bh.band").as("band"), col("bh.h").as("h"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.h") === col("y.h") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("i"), col("y.doc_id").as("j"))
      .distinct()
    val wordArrs = bounded.select(col("doc_id"),
      array_distinct(split(col("text"), " ")).as("ws"))
    val inter = size(array_intersect(col("wa"), col("wb")))
    cand
      .join(wordArrs.select(col("doc_id").as("i"), col("ws").as("wa")), Seq("i"))
      .join(wordArrs.select(col("doc_id").as("j"), col("ws").as("wb")), Seq("j"))
      // necessary condition for J >= 0.8: |smaller| / |larger| >= 0.8 —
      // a cheap size-ratio gate before the O(n) array_intersect
      .filter(least(size(col("wa")), size(col("wb"))) * 5 >=
        greatest(size(col("wa")), size(col("wb"))) * 4)
      .select(col("i"), col("j"),
        (inter / (size(col("wa")) + size(col("wb")) - inter)).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
      .orderBy("i", "j")
  }

  /** The same near-dup problem through MLlib's `MinHashLSH` (HashingTF
    * term vectors → seeded hash tables → approxSimilarityJoin), as the
    * library-integration alternative to the hand-rolled signature
    * pipeline above. Deterministic via setSeed; rows-only check. */
  private def minhashMllib(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
    val bounded = docs(s, d).filter(col("doc_id") < 500)
      .select(col("doc_id"), split(col("text"), " ").as("words"))
    val featurized = new HashingTF()
      .setInputCol("words").setOutputCol("features").setNumFeatures(1 << 16)
      .transform(bounded)
    val model = new MinHashLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(4).setSeed(42)
      .fit(featurized)
    model.approxSimilarityJoin(featurized, featurized, 0.2, "jaccard_dist")
      .select(col("datasetA.doc_id").as("i"), col("datasetB.doc_id").as("j"),
        bround(lit(1.0) - col("jaccard_dist"), 6).as("similarity"))
      .filter(col("i") < col("j"))
      .orderBy("i", "j")
  }

  /** 64-bit SimHash per doc (sign-of-weighted-bit-sums over word hashes).
    * One xxhash64 per word, folded by the single-pass custom Catalyst
    * aggregate [[graft.functions.SimHashAgg]] (one 64-int buffer update
    * per word, map-side partials — replaces 64 separate bit-test
    * aggregate slots), banded into 4×16-bit buckets with a length
    * block; near-dup pairs at hamming <= 8. Rows-only check. */
  private def simhash(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val wh = docs(s, d)
      .select(col("doc_id"), col("n_chars"),
        explode(array_distinct(split(col("text"), " "))).as("w"))
      .withColumn("h", xxhash64(col("w")))
    val sig = wh.groupBy(col("doc_id"), col("n_chars"))
      .agg(graft.functions.VectorFunctions.simhash(col("h")).as("simhash"))
      .select(col("doc_id"), col("n_chars"), col("simhash"))
    val bands = sig.select(col("doc_id"), col("simhash"),
      // length block alongside the 16-bit band: near-dups have near lengths
      (col("n_chars") / 50).cast("int").as("lenb"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          expr(s"shiftright(simhash, ${b * 16}) & 65535").as("h"))): _*)).as("bh"))
      .select(col("doc_id"), col("simhash"), col("lenb"),
        col("bh.band").as("band"), col("bh.h").as("h"))
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.h") === col("y.h") &&
          col("x.lenb") === col("y.lenb") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("i"), col("y.doc_id").as("j"),
        expr("bit_count(x.simhash ^ y.simhash)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 8)
      .orderBy("i", "j")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> exact,
    "dedup_ngram_jaccard" -> ngramJaccard,
    "dedup_minhash" -> minhash,
    "dedup_minhash_mllib" -> minhashMllib,
    "dedup_simhash" -> simhash)

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT lang, source, n_chars, min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM documents GROUP BY lang, source, n_chars
        |ORDER BY lang, source, n_chars""".stripMargin,
    "dedup_ngram_jaccard" ->
      """WITH words AS (
        |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
        |  FROM documents WHERE doc_id < 150),
        |cnt AS (SELECT doc_id, count(*) AS n FROM words GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
        |  FROM words a JOIN words b ON a.w = b.w AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT i, j, c * 1.0 / (na.n + nb.n - c) AS jaccard
        |FROM inter JOIN cnt na ON i = na.doc_id JOIN cnt nb ON j = nb.doc_id
        |WHERE c * 1.0 / (na.n + nb.n - c) >= 0.8
        |ORDER BY i, j""".stripMargin)
}
