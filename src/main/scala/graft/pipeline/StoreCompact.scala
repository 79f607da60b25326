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
  * swap it in.
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
  * COMMIT PROTOCOL (r14 — VERDICT #2 + ADVICE r13): a compaction run
  * is stage-everything-then-commit with two markers, both through
  * [[Hfs]] so any filesystem scheme behaves alike:
  *
  *   1. `_compacting` LEASE — written before the store is read,
  *      removed only on successful completion. Delta writers probe it
  *      ([[assertNotCompacting]]) and fail LOUDLY: a delta landing
  *      mid-swap would race the listing and silently lose rows (the
  *      r13 "writer QUIESCED" contract, now enforced, not documented).
  *      Symmetrically the compactor probes each epoch partition for a
  *      Spark `_temporary` staging dir and refuses to start over an
  *      in-flight write. A crashed compaction leaves the lease in
  *      place — writers stay blocked (loud) until compaction is
  *      re-run to completion, which is the safe direction.
  *   2. ALL staged sub-tables are fully written (parquet job
  *      committed) under `.compact_<sub>` BEFORE the `_compact_commit`
  *      marker lands; only then does any rename run. A crash BEFORE
  *      the marker leaves the store byte-identical (recovery discards
  *      half-staged dirs); a crash AFTER the marker rolls FORWARD on
  *      the next run (every staged dir publishes — the staged set is
  *      complete by construction). Multi-sub stores (the corpus-clean
  *      tpairs/bmark latest-wins pair) therefore swap ATOMICALLY with
  *      respect to failures: readers never see one side folded and the
  *      other not (ADVICE r13 medium #2).
  *   3. Per-sub publish is rename(sub -> .old_sub), rename(.compact_sub
  *      -> sub), delete .old_sub — each state in that chain is
  *      distinguishable and [[recover]] completes it idempotently, so
  *      the "no sub-table at all" stranding of the r13 two-rename swap
  *      (ADVICE r13 medium #1) cannot persist past the next run.
  *
  * All paths ride Hadoop's FileSystem, so an `hdfs://`/`s3a://` store
  * compacts the same way a local one does. The lease probe is
  * probe-then-act (same caveat as Hfs.rename): a writer racing the
  * lease write itself can still slip through on a store with no
  * coordination at all, but every orderly overlap now fails loudly
  * instead of corrupting silently. */
object StoreCompact {

  private def leasePath(storeDir: String) = s"$storeDir/_compacting"
  private def commitPath(storeDir: String) = s"$storeDir/_compact_commit"

  /** Writer-side lease probe — every delta writer calls this before
    * reading or appending to a persisted store and fails loudly while
    * a compaction is in flight (or died mid-run and must be re-run). */
  def assertNotCompacting(storeDir: String): Unit =
    if (Hfs.exists(leasePath(storeDir)))
      sys.error(s"store $storeDir is under compaction (_compacting lease " +
        "present): a delta landing mid-swap races the listing and loses " +
        "rows; wait for compaction to finish, or re-run it to completion " +
        "if it crashed")

  /** Compactor-side probe: Spark stages an epoch write under
    * `<partition>/_temporary` until the job commits — an in-flight
    * writer means the quiesce contract is violated; refuse loudly. */
  private def assertNoInflightWriter(storeDir: String, sub: String): Unit =
    Hfs.childDirNames(s"$storeDir/$sub").foreach { ep =>
      if (Hfs.exists(s"$storeDir/$sub/$ep/_temporary"))
        sys.error(s"$storeDir/$sub/$ep has an in-flight writer " +
          "(_temporary present): quiesce delta writers before compacting")
    }

  /** Publish one staged sub-table; idempotent across every crash point
    * (missing staged dir -> just clear the backup; sub already moved
    * away -> skip the move). */
  private def publishStaged(storeDir: String, sub: String): Unit = {
    val tmp = s"$storeDir/.compact_$sub"
    val old = s"$storeDir/.old_$sub"
    if (Hfs.exists(tmp)) {
      if (Hfs.exists(s"$storeDir/$sub")) {
        Hfs.deleteRecursive(old)
        Hfs.rename(s"$storeDir/$sub", old)
      }
      Hfs.rename(tmp, s"$storeDir/$sub")
    }
    Hfs.deleteRecursive(old): Unit
  }

  /** Crash recovery, run on compactor entry: with the commit marker
    * present the staged set is complete — roll FORWARD (publish every
    * listed sub); without it, any `.old_<sub>` stranded next to a
    * missing sub is restored and half-staged `.compact_*` dirs are
    * discarded, leaving the store exactly as before the dead run. */
  private def recover(storeDir: String): Unit =
    if (Hfs.exists(commitPath(storeDir))) {
      Hfs.readUtf8(commitPath(storeDir)).split("\n").filter(_.nonEmpty)
        .foreach(publishStaged(storeDir, _))
      Hfs.deleteRecursive(commitPath(storeDir)): Unit
    } else {
      Hfs.childNames(storeDir).filter(_.startsWith(".old_")).foreach { o =>
        val sub = o.stripPrefix(".old_")
        if (!Hfs.exists(s"$storeDir/$sub"))
          Hfs.rename(s"$storeDir/$o", s"$storeDir/$sub")
        else Hfs.deleteRecursive(s"$storeDir/$o")
      }
      Hfs.childNames(storeDir).filter(_.startsWith(".compact_"))
        .foreach(n => Hfs.deleteRecursive(s"$storeDir/$n"))
    }

  /** Run one compaction under the lease: recover any dead run, take the
    * lease, stage (the block returns the staged sub names), mark,
    * publish, unmark, release. The lease is released ONLY on success. */
  private def withLease(storeDir: String)(stage: => Seq[String]): Unit = {
    recover(storeDir)
    Hfs.touch(leasePath(storeDir))
    val subs = stage
    Hfs.writeUtf8(commitPath(storeDir), subs.mkString("\n"))
    subs.foreach(publishStaged(storeDir, _))
    Hfs.deleteRecursive(commitPath(storeDir))
    Hfs.deleteRecursive(leasePath(storeDir)): Unit
  }

  /** Stage one epoch-partitioned sub-table as a single `epoch=-1`
    * baseline; `resolve` applies the SAME collapse its readers apply
    * (identity = coalesce files only). Absent sub-tables no-op. The
    * parquet write fully commits here — before any rename anywhere. */
  private def stageSub(spark: SparkSession, storeDir: String, sub: String,
                       resolve: DataFrame => DataFrame = identity)
      : Option[String] =
    if (!Hfs.exists(s"$storeDir/$sub")) None
    else {
      assertNoInflightWriter(storeDir, sub)
      val tmp = s"$storeDir/.compact_$sub"
      Hfs.deleteRecursive(tmp)
      resolve(spark.read.parquet(s"$storeDir/$sub").drop("epoch"))
        .write.mode("overwrite").parquet(s"$tmp/epoch=-1")
      Some(sub)
    }

  /** The HNSW stores (2-layer and level-stack alike — layer sub-tables
    * are discovered from the layout): vectors dedup on vec_id (the
    * serve-time rule), layer edges collapse exact-duplicate rows (the
    * symCap distinct). */
  def compactHnswStore(spark: SparkSession, storeDir: String): Unit =
    withLease(storeDir) {
      (stageSub(spark, storeDir, "vecs", _.dropDuplicates("vec_id")) ++
        Hfs.childDirNames(storeDir).filter(_.matches("l\\d+")).sorted
          .flatMap(l => stageSub(spark, storeDir, l, _.distinct()))).toSeq
    }

  /** The incremental-dedup band store (docs/bands/pairs): readers take
    * plain unions, so compaction is identity — files coalesce, the row
    * multiset is untouched. */
  def compactDedupStore(spark: SparkSession, storeDir: String): Unit =
    withLease(storeDir) {
      Seq("docs", "bands", "pairs").flatMap(stageSub(spark, storeDir, _))
    }

  /** The audio fingerprint/content-ID store (fps/matches): plain-union
    * readers → identity compaction. */
  def compactAudioStore(spark: SparkSession, storeDir: String): Unit =
    withLease(storeDir) {
      Seq("fps", "matches").flatMap(stageSub(spark, storeDir, _))
    }

  /** The incremental-ExactSubstr store (r14): docs dedup on doc_id (the
    * serve-time rule), occ/cnt are plain unions, and `res` resolves its
    * LATEST-PER-DOC read at compaction — only each doc's most recent
    * cleaned row survives into the baseline (which reads as the oldest
    * epoch, so later re-cleans still win). */
  def compactSubstrStore(spark: SparkSession, storeDir: String): Unit =
    withLease(storeDir) {
      import org.apache.spark.sql.expressions.Window
      val simple = Seq(
        stageSub(spark, storeDir, "docs", _.dropDuplicates("doc_id")),
        stageSub(spark, storeDir, "occ"),
        stageSub(spark, storeDir, "cnt")).flatten
      val res =
        if (!Hfs.exists(s"$storeDir/res")) None
        else {
          assertNoInflightWriter(storeDir, "res")
          Hfs.deleteRecursive(s"$storeDir/.compact_res")
          val w = Window.partitionBy(col("doc_id"))
            .orderBy(col("epoch").cast("long").desc)
          spark.read.parquet(s"$storeDir/res")
            .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
            .drop("rn", "epoch")
            .write.mode("overwrite")
            .parquet(s"$storeDir/.compact_res/epoch=-1")
          Some("res")
        }
      simple ++ res
    }

  /** The incremental-BM25 index store (dl/tf): serve folds aggregates
    * over plain unions → identity compaction. */
  def compactBm25Store(spark: SparkSession, storeDir: String): Unit =
    withLease(storeDir) {
      Seq("dl", "tf").flatMap(stageSub(spark, storeDir, _))
    }

  /** The incremental-centroid store: `parts` partial sums fold at
    * serve (plain union), `ids` dedups on vec_id (the re-delivery
    * guard's read rule). */
  def compactCentroidStore(spark: SparkSession, storeDir: String): Unit =
    withLease(storeDir) {
      (stageSub(spark, storeDir, "ids", _.dropDuplicates("vec_id")) ++
        stageSub(spark, storeDir, "parts")).toSeq
    }

  /** The multimodal corpus-clean store: docs/bands/phash dedup exactly
    * as their readers do, image pairs collapse to the distinct set, and
    * the text-pair store resolves LATEST-WINS-PER-BUCKET at compaction
    * — only each bucket's most recent recomputation survives, and the
    * bucket marks fold to the same baseline epoch so the latest-wins
    * read stays consistent. tpairs and bmark stage as ONE commit (both
    * parquet jobs finish before the marker, both publish under it), so
    * no failure can leave one folded and the other not. */
  def compactCorpusCleanStore(spark: SparkSession, storeDir: String): Unit =
    withLease(storeDir) {
      val simple = Seq(
        stageSub(spark, storeDir, "docs", _.dropDuplicates("doc_id")),
        stageSub(spark, storeDir, "bands",
          _.dropDuplicates(Seq("doc_id", "band"))),
        stageSub(spark, storeDir, "phash", _.dropDuplicates("doc_id")),
        stageSub(spark, storeDir, "ipairs", _.distinct())).flatten
      val pair =
        if (Hfs.exists(s"$storeDir/tpairs") && Hfs.exists(s"$storeDir/bmark")) {
          assertNoInflightWriter(storeDir, "tpairs")
          assertNoInflightWriter(storeDir, "bmark")
          val marks = spark.read.parquet(s"$storeDir/bmark")
            .withColumn("ep", col("epoch").cast("long")).drop("epoch")
          val latest = marks.groupBy(col("band"), col("h"))
            .agg(max(col("ep")).as("ep"))
          val valid = spark.read.parquet(s"$storeDir/tpairs")
            .withColumn("ep", col("epoch").cast("long")).drop("epoch")
            .join(latest, Seq("band", "h", "ep")).drop("ep")
          Seq("tpairs", "bmark").foreach(sub =>
            Hfs.deleteRecursive(s"$storeDir/.compact_$sub"))
          valid.write.mode("overwrite")
            .parquet(s"$storeDir/.compact_tpairs/epoch=-1")
          marks.select(col("band"), col("h")).distinct()
            .write.mode("overwrite")
            .parquet(s"$storeDir/.compact_bmark/epoch=-1")
          Seq("tpairs", "bmark")
        } else Seq.empty
      simple ++ pair
    }
}
