package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance [N] — the materialized-view pattern
  * every 100 TB warehouse runs: keep a compact per-key PARTIAL-aggregate
  * state table (count, sum, min, max), and fold each arriving batch of
  * rows into it WITHOUT rescanning the base table. Refresh cost is
  * O(delta + state), not O(base) — at 100 TB of facts with a few GB of
  * state, that is the difference between minutes and a full-table job.
  *
  * Exactness contract: insert-only deltas. count/sum are abelian-group
  * aggregates (deletes could be folded as negative deltas); min/max are
  * only semigroup — a delete CAN'T be unfolded without the base rows, so
  * the API models appends, which is what fact streams are. The merged
  * state is EXACTLY the state of base ∪ delta (same partial/merge pairs
  * Spark's own hash aggregate uses), verified by the oracle equality.
  *
  * Sum state is decimal: exact, order-invariant, bit-identical across
  * engines; expose doubles only at the output boundary.
  */
object Incremental {

  /** Build the per-key partial-aggregate state for `valueCol`.
    * `n` counts non-null values (so merge math and avg share one base). */
  def state(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    require(keys.nonEmpty, "incremental state needs at least one key")
    df.groupBy(keys.map(col): _*)
      .agg(count(col(valueCol)).as("n"),
        sum(col(valueCol)).as("s"),
        min(col(valueCol)).as("mn"),
        max(col(valueCol)).as("mx"))
  }

  /** Merge two state tables (e.g. yesterday's state + today's delta
    * state): union + re-aggregate with the merge half of each pair.
    * Keys present in only one side pass through unchanged. */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).cast("bigint").as("n"),
        sum(col("s")).as("s"),
        min(col("mn")).as("mn"),
        max(col("mx")).as("mx"))

  /** Fold a batch of RAW delta rows into an existing state table. */
  def mergeDelta(st: DataFrame, delta: DataFrame, keys: Seq[String],
                 valueCol: String): DataFrame =
    merge(st, state(delta, keys, valueCol), keys)

  /** Fold an I/U/D CHANGELOG into (n, s) group state as SIGNED deltas —
    * retraction maintenance for the abelian-group aggregates (count,
    * sum), where a delete IS representable without the base rows:
    *
    *   I: n+1, s+new    D: n−1, s−old    U: n+0, s+(new−old)
    *
    * min/max stay out by design (semigroup only — see the class doc);
    * a view needing them under deletes must rescan the affected groups.
    * Groups whose count reaches zero are DROPPED, matching a
    * from-scratch recompute (their sum is exactly 0 too: the deltas are
    * exact decimals, so full retraction cancels bit-for-bit — a float
    * sum could NOT guarantee that).
    *
    * `log` carries `keys`, `op` ('I'/'U'/'D'), `oldCol`, `newCol`
    * (exact decimals; old null for I, new null for D). Cost is
    * O(changelog + state) — the base table is never rescanned. */
  def mergeChangelog(st: DataFrame, log: DataFrame, keys: Seq[String],
                     oldCol: String, newCol: String): DataFrame = {
    val zero = lit(0).cast("decimal(12,2)")
    val signed = log.groupBy(keys.map(col): _*)
      .agg(
        sum(when(col("op") === "I", 1L)
          .when(col("op") === "D", -1L).otherwise(0L)).as("n"),
        sum(coalesce(col(newCol), zero) - coalesce(col(oldCol), zero)).as("s"))
    st.select((keys.map(col) :+ col("n") :+ col("s")): _*)
      .unionByName(signed)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).cast("bigint").as("n"), sum(col("s")).as("s"))
      .filter(col("n") =!= 0)
  }

  /** Incremental JOIN maintenance (insert-only deltas) — the classic
    * delta-join identity from incremental view maintenance (Blakeley et
    * al., public):
    *
    *   (A₀∪ΔA) ⋈ (B₀∪ΔB) = (A₀⋈B₀) ∪ (ΔA ⋈ (B₀∪ΔB)) ∪ (A₀ ⋈ ΔB)
    *
    * `m0` is the already-materialized A₀⋈B₀ — the term that at 100 TB
    * you must NEVER recompute. The two delta terms each join a (small)
    * delta against one full side, so refresh cost is O(Δ × join-width),
    * not O(A × B); the deltas typically broadcast. The ΔA⋈ΔB cross term
    * is folded into ΔA⋈B₁ (B₁ = B₀∪ΔB) so no pair is emitted twice. */
  def joinDelta(m0: DataFrame, a0: DataFrame, deltaA: DataFrame,
                b0: DataFrame, deltaB: DataFrame,
                joinKeys: Seq[String]): DataFrame = {
    val b1 = b0.unionByName(deltaB)
    m0.unionByName(deltaA.join(b1, joinKeys))
      .unionByName(a0.join(deltaB, joinKeys))
  }
}
