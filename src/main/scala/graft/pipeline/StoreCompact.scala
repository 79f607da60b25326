package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Hfs

/** Epoch-store COMPACTION [N] (r13) — the maintenance leg of the
  * persisted incremental lifecycles (dedup band stores, HNSW layer
  * stores, audio fingerprints, the multimodal corpus-clean store):
  * every delta micro-batch appends one `epoch=N` partition, so a
  * long-running pipeline accumulates thousands of small partitions
  * whose LISTING and footer-read cost eventually rivals the data —
  * the classic lakehouse small-files problem, solved the classic way:
  * periodically fold every epoch of a sub-table into a single
  * `epoch=-1` baseline (the exact shape the day-0 seeds write) and
  * swap it in with staged renames.
  *
  * Row semantics are preserved per store: sub-tables whose READERS
  * deduplicate get the same dropDuplicates/distinct applied at
  * compaction; sub-tables read as plain unions compact by identity
  * (files coalesce, rows don't change); the multimodal text-pair store
  * resolves its latest-wins-per-bucket rule at compaction so only the
  * surviving rows are rewritten. StoreCompactSpec pins
  * serve-before == serve-after and that post-compaction deltas keep
  * appending correctly (the baseline reads as a prior epoch).
  *
  * CONTRACT: run with the writer QUIESCED (between streaming runs,
  * after the checkpoint committed) — the swap is two renames, not one
  * atomic commit, and a concurrent delta would race the listing. All
  * paths ride Hadoop's FileSystem, so an `hdfs://`/`s3a://` store
  * compacts the same way a local one does. */
object StoreCompact {

  /** Stage `df` as the new single-baseline content of `storeDir/sub`
    * and swap it in (write tmp → rename old away → rename tmp in →
    * drop old). The parquet write executes BEFORE any rename, so a
    * plan reading the sub-table it replaces is safe. */
  def swapIn(storeDir: String, sub: String, df: DataFrame): Unit = {
    val tmp = s"$storeDir/.compact_$sub"
    Hfs.deleteRecursive(tmp)
    df.write.mode("overwrite").parquet(s"$tmp/epoch=-1")
    val old = s"$storeDir/.old_$sub"
    Hfs.deleteRecursive(old)
    Hfs.rename(s"$storeDir/$sub", old)
    Hfs.rename(tmp, s"$storeDir/$sub")
    Hfs.deleteRecursive(old): Unit
  }

  /** Compact one epoch-partitioned sub-table; `resolve` applies the
    * SAME collapse its readers apply (identity = coalesce files only).
    * Absent sub-tables no-op. */
  def compactSub(spark: SparkSession, storeDir: String, sub: String,
                 resolve: DataFrame => DataFrame = identity): Unit =
    if (Hfs.exists(s"$storeDir/$sub"))
      swapIn(storeDir, sub,
        resolve(spark.read.parquet(s"$storeDir/$sub").drop("epoch")))

  /** The HNSW stores (2-layer and level-stack alike — layer sub-tables
    * are discovered from the layout): vectors dedup on vec_id (the
    * serve-time rule), layer edges collapse exact-duplicate rows (the
    * symCap distinct). */
  def compactHnswStore(spark: SparkSession, storeDir: String): Unit = {
    compactSub(spark, storeDir, "vecs", _.dropDuplicates("vec_id"))
    Hfs.childDirNames(storeDir).filter(_.matches("l\\d+")).sorted
      .foreach(l => compactSub(spark, storeDir, l, _.distinct()))
  }

  /** The incremental-dedup band store (docs/bands/pairs): readers take
    * plain unions, so compaction is identity — files coalesce, the row
    * multiset is untouched. */
  def compactDedupStore(spark: SparkSession, storeDir: String): Unit =
    Seq("docs", "bands", "pairs").foreach(compactSub(spark, storeDir, _))

  /** The audio fingerprint/content-ID store (fps/matches): plain-union
    * readers → identity compaction. */
  def compactAudioStore(spark: SparkSession, storeDir: String): Unit =
    Seq("fps", "matches").foreach(compactSub(spark, storeDir, _))

  /** The multimodal corpus-clean store: docs/bands/phash dedup exactly
    * as their readers do, image pairs collapse to the distinct set, and
    * the text-pair store resolves LATEST-WINS-PER-BUCKET at compaction
    * — only each bucket's most recent recomputation survives, and the
    * bucket marks fold to the same baseline epoch so the latest-wins
    * read stays consistent (both materialize BEFORE either swap). */
  def compactCorpusCleanStore(spark: SparkSession, storeDir: String): Unit = {
    compactSub(spark, storeDir, "docs", _.dropDuplicates("doc_id"))
    compactSub(spark, storeDir, "bands",
      _.dropDuplicates(Seq("doc_id", "band")))
    compactSub(spark, storeDir, "phash", _.dropDuplicates("doc_id"))
    compactSub(spark, storeDir, "ipairs", _.distinct())
    if (Hfs.exists(s"$storeDir/tpairs") && Hfs.exists(s"$storeDir/bmark")) {
      val marks = spark.read.parquet(s"$storeDir/bmark")
        .withColumn("ep", col("epoch").cast("long")).drop("epoch")
      val latest = marks.groupBy(col("band"), col("h"))
        .agg(max(col("ep")).as("ep"))
      val valid = spark.read.parquet(s"$storeDir/tpairs")
        .withColumn("ep", col("epoch").cast("long")).drop("epoch")
        .join(latest, Seq("band", "h", "ep")).drop("ep")
        .localCheckpoint()
      val marksC = marks.select(col("band"), col("h")).distinct()
        .localCheckpoint()
      swapIn(storeDir, "tpairs", valid)
      swapIn(storeDir, "bmark", marksC)
    }
  }
}
