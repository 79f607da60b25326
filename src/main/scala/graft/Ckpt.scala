package graft

import org.apache.spark.sql.DataFrame

/** Lineage cut for the iterative fixpoints (r11, VERDICT #3 — the
  * SCALE.md "Session-level" one-line swap, now executable): by default a
  * `localCheckpoint` — executor-local blocks, no directory needed, the
  * right trade on local[*] and on a healthy cluster — or, when the
  * session conf `graft.checkpoint.dir` is set, a RELIABLE `checkpoint`
  * to that directory, which survives executor loss at the price of a
  * distributed filesystem write per cut. At 100 TB the reliable mode is
  * the degradation lever for long fixpoints (PageRank/CC/BFS rounds on
  * preemptible executors): losing an executor with localCheckpoint
  * blocks kills the job (the lineage was truncated — Spark cannot
  * recompute the missing blocks), while reliable checkpoints just
  * re-read from storage.
  *
  * Both modes only MATERIALIZE the same deterministic rows — they never
  * change plan semantics above the cut — so results are bit-identical
  * (CheckpointModeSpec pins pagerank / connected components / SSSP
  * hash-equal across modes).
  */
object Ckpt {
  // remember the last (context, dir) applied: setCheckpointDir creates a
  // fresh UUID subdirectory per call, so re-setting it on every cut
  // would scatter one directory per fixpoint round
  @volatile private var applied: Option[(org.apache.spark.SparkContext, String)] = None

  def cut(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    val dir = s.conf.get("graft.checkpoint.dir", "")
    if (dir.isEmpty) df.localCheckpoint()
    else {
      val sc = s.sparkContext
      if (!applied.contains((sc, dir))) {
        sc.setCheckpointDir(dir)
        applied = Some((sc, dir))
      }
      df.checkpoint()
    }
  }

  /** `df.cut()` sugar so the fixpoint loops read like the
    * localCheckpoint calls they replace. */
  implicit class CutOps(private val df: DataFrame) extends AnyVal {
    def cut(): DataFrame = Ckpt.cut(df)
  }
}
