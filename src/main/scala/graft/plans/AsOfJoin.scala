package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Native backward as-of join (SURVEY §2.D `join_asof_price`, §4 stretch
  * goal): for every probe row (key, t), attach the `value` of the most
  * recent series row with the same key and series-time <= t, by
  * (series-time, tiebreak) order; null when none exists.
  *
  * This is the operator Spark SQL lacks natively (the library also ships
  * the compositional rewrite — filter + max_by — in `ops.Joins.asofPrice`;
  * this node replaces that double-scan with ONE streaming merge pass):
  *
  *  - logical node [[AsOfJoin]] (built post-analysis from resolved child
  *    plans, so no resolution rule is needed),
  *  - physical [[AsOfJoinExec]]: requires both children hash-clustered on
  *    the key and sorted by (key, time, tiebreak) — EnsureRequirements
  *    inserts the exchanges/sorts — then merges each co-partition pair in
  *    one pass, O(|probes| + |series|) per partition, constant memory,
  *  - [[AsOfJoinStrategy]] registered through the public
  *    `spark.experimental.extraStrategies` seam (see [[AsOf.joinBackward]]).
  *
  * At scale this is the right shape: one shuffle per side on the join key
  * (AQE-coalescible), no row buffering beyond a single running value per
  * key, no skew amplification (a hot key still streams linearly).
  *
  * Key/time/tiebreak expressions may be ANY orderable type (numeric,
  * timestamp, string, date, decimal — compared through the type's
  * interpreted ordering); `value` may be any type. Null semantics follow
  * SQL join conventions: a null probe key or time matches nothing; null
  * series keys/times are skipped.
  */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression, rightValue: Attribute,
    forward: Boolean = false,
    strict: Boolean = false)
  extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output :+ rightValue
      .withName(if (forward) "next_value" else "last_value")
      .withNullability(true)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression, rightValue: Attribute,
    forward: Boolean = false,
    strict: Boolean = false)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output :+ rightValue
      .withName(if (forward) "next_value" else "last_value")
      .withNullability(true)

  override def requiredChildDistribution: Seq[Distribution] = {
    // pin the partition count so both sides stay strictly co-partitioned
    // (zipPartitions needs equal counts; a pinned requirement also keeps
    // AQE from coalescing the two shuffles differently)
    val n = Some(org.apache.spark.sql.internal.SQLConf.get.numShufflePartitions)
    Seq(ClusteredDistribution(Seq(leftKey), requiredNumPartitions = n),
      ClusteredDistribution(Seq(rightKey), requiredNumPartitions = n))
  }

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering

    val outAttrs = output
    val leftAttrs = left.output
    val rightAttrs = right.output
    val lKey = leftKey; val lTime = leftTime
    val rKey = rightKey; val rTime = rightTime
    val rVal = rightValue.asInstanceOf[Expression]
    val strictIneq = strict
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val valType = rightValue.dataType

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // Codegen inner loop (r3; was interpreted eval + interpreted
      // orderings): both sides project (key, time) through a generated
      // UnsafeProjection, and the merge compares those 2-col rows with
      // GENERATED orderings — `ordKey` over field 0, `ordLex` over
      // (key, time) lexicographically. The advance condition
      // "rk < k, or rk == k && rt <= t" is exactly lex((rk,rt),(k,t)) <= 0.
      val lKT = UnsafeProjection.create(Seq(lKey, lTime), leftAttrs)
      val rKT = UnsafeProjection.create(Seq(rKey, rTime), rightAttrs)
      val rValProj = UnsafeProjection.create(Seq(rVal), rightAttrs)
      val keyRef = BoundReference(0, keyType, nullable = true)
      val timeRef = BoundReference(1, timeType, nullable = true)
      val ordKey = GenerateOrdering.generate(Seq(SortOrder(keyRef, Ascending)))
      val ordLex = GenerateOrdering.generate(
        Seq(SortOrder(keyRef, Ascending), SortOrder(timeRef, Ascending)))

      val project = UnsafeProjection.create(outAttrs, leftAttrs :+ outAttrs.last)
      val valueRow = new GenericInternalRow(1)
      val joined = new JoinedRow

      val rBuf = rIter.buffered
      // running match state: the latest series value seen, tagged with the
      // (key, time) row it was consumed at — emitted only when its key
      // equals the probe's key, so values never leak across keys
      var lastKT: InternalRow = null
      var lastVal: Any = null

      lIter.map { lRow =>
        val kt = lKT(lRow)
        if (kt.isNullAt(0) || kt.isNullAt(1)) {
          // SQL convention: null probe key/time matches nothing; don't
          // advance the series (nulls sort first, so later probes of this
          // key still need its rows)
          valueRow.update(0, null)
          project(joined(lRow, valueRow))
        } else if (forward) {
          // FORWARD: match = EARLIEST series row with key == k and
          // time >= t, by (time, tiebreak). Consume rows strictly
          // before (k, t); the match is then a PEEK at the head (later
          // probes with larger t may still need it — never consume it)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rkt = rKT(rBuf.head)
            if (rkt.isNullAt(0) || rkt.isNullAt(1)) rBuf.next()
            else if ({ val c = ordLex.compare(rkt, kt)
                       if (strictIneq) c <= 0 else c < 0 }) rBuf.next()
            else advancing = false
          }
          val matched = rBuf.hasNext && {
            val rkt = rKT(rBuf.head)
            ordKey.compare(rkt, kt) == 0
          }
          valueRow.update(0,
            if (matched) rValProj(rBuf.head).get(0, valType) else null)
          project(joined(lRow, valueRow))
        } else {
          // BACKWARD: advance the series, consuming every row with
          // (key < k) or (key == k && time <= t); remember the last
          // value seen
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rRow = rBuf.head
            val rkt = rKT(rRow)
            if (rkt.isNullAt(0) || rkt.isNullAt(1)) {
              rBuf.next() // null series key/time matches nothing: skip
            } else if ({ val c = ordLex.compare(rkt, kt)
                         if (strictIneq) c < 0 else c <= 0 }) {
              // copy the tag row only on a key change (ordKey reads field
              // 0 alone, so a stale time field in the tag is never read) —
              // one allocation per distinct series key, not per row
              if (lastKT == null || ordKey.compare(lastKT, rkt) != 0)
                lastKT = rkt.copy()
              lastVal = InternalRow.copyValue(rValProj(rRow).get(0, valType))
              rBuf.next()
            } else advancing = false
          }
          valueRow.update(0,
            if (lastKT != null && ordKey.compare(lastKT, kt) == 0) lastVal else null)
          project(joined(lRow, valueRow))
        }
      }
    }
  }
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tie, rv, fwd, strict) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tie, rv,
        fwd, strict) :: Nil
    case _ => Nil
  }
}

/** Public API for the native as-of join. */
object AsOf {

  private def ensureStrategy(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }

  private def build(probes: DataFrame, series: DataFrame,
                    key: String, time: String, tiebreak: String,
                    value: String, forward: Boolean,
                    strict: Boolean = false): DataFrame = {
    val spark = probes.sparkSession
    ensureStrategy(spark)
    val lPlan = probes.queryExecution.analyzed
    // probes and series often derive from the same scan (self-join shape);
    // alias every series column so the right side gets fresh exprIds and
    // the analyzer's relation dedup never rewrites under this node
    val seriesFresh = series.select(
      series.columns.toIndexedSeq.map(c => org.apache.spark.sql.functions.col(c).as(c)): _*)
    val rPlan = seriesFresh.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found in ${plan.output}"))
    GraftSqlBridge.ofRows(spark, AsOfJoin(
      lPlan, rPlan,
      attr(lPlan, key), attr(rPlan, key),
      attr(lPlan, time), attr(rPlan, time),
      attr(rPlan, tiebreak), attr(rPlan, value), forward, strict))
  }

  /** SQL-text surface (VERDICT r3 #4): registers `graft_asof` as a
    * table-valued function in the session's table-function registry, so a
    * `spark.sql` analyst can reach this native operator without the Scala
    * API:
    *
    * {{{
    * SELECT * FROM graft_asof('probes_v', 'series_v',
    *                          'user_id', 'ts', 'event_id', 'value',
    *                          'backward')   -- direction optional
    * }}}
    *
    * Arguments are string literals: two table/view names resolved through
    * the session catalog, then the key, time, tiebreak and value column
    * names, and an optional 'backward' (default) / 'forward' direction.
    * The builder emits the same resolved [[AsOfJoin]] node as the Scala
    * API, so the strategy and exec operator are shared. Deployments using
    * `--conf spark.sql.extensions=graft.GraftExtensions` get the function
    * without calling this. */
  def registerSql(spark: SparkSession): Unit = {
    ensureStrategy(spark)
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "graft_asof", sqlBuilder, "built-in")
  }

  private[graft] def sqlBuilder(
      exprs: Seq[Expression]): LogicalPlan = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.StringType
    def str(i: Int, what: String): String = exprs(i) match {
      case Literal(v, StringType) if v != null => v.toString
      case other => throw new IllegalArgumentException(
        s"graft_asof: argument ${i + 1} ($what) must be a string literal, " +
          s"got ${other.sql}")
    }
    if (exprs.length < 6 || exprs.length > 7)
      throw new IllegalArgumentException(
        "graft_asof(probes, series, key, time, tiebreak, value[, direction]) " +
          s"takes 6 or 7 string-literal arguments, got ${exprs.length}")
    val (forward, strict) =
      if (exprs.length < 7) (false, false)
      else str(6, "direction") match {
        case "backward" => (false, false)
        case "forward" => (true, false)
        case "backward_strict" => (false, true) // allow_exact_matches=false
        case "forward_strict" => (true, true)
        case other => throw new IllegalArgumentException(
          "graft_asof: direction must be 'backward', 'forward', " +
            s"'backward_strict' or 'forward_strict', got '$other' " +
            "(nearest composes two merges: use AsOf.joinNearest)")
      }
    // the builder runs inside analysis, where the active session is set;
    // resolving the two relations here means the node we return is fully
    // resolved and needs no extra analyzer rule
    val spark = SparkSession.active
    val probes = spark.table(str(0, "probes table/view"))
    val series = spark.table(str(1, "series table/view"))
    build(probes, series, str(2, "key column"), str(3, "time column"),
      str(4, "tiebreak column"), str(5, "value column"), forward, strict)
      .queryExecution.analyzed
  }

  /** Backward as-of join: `probes` gains `last_value` = value of the most
    * recent `series` row per key at-or-before the probe time (ties →
    * LARGEST tiebreak, i.e. max_by (time, tiebreak)).
    *
    * @param probes  DataFrame with `key` and `time` columns
    * @param series  DataFrame with `key`, `time`, `tiebreak`, `value` columns
    */
  def joinBackward(probes: DataFrame, series: DataFrame,
                   key: String, time: String, tiebreak: String,
                   value: String, allowExactMatches: Boolean = true): DataFrame =
    build(probes, series, key, time, tiebreak, value, forward = false,
      strict = !allowExactMatches)

  /** Forward as-of join: `probes` gains `next_value` = value of the
    * EARLIEST `series` row per key at-or-after the probe time (ties →
    * SMALLEST tiebreak, i.e. min_by (time, tiebreak)) — the
    * `merge_asof(direction="forward")` semantics, same one-pass merge. */
  def joinForward(probes: DataFrame, series: DataFrame,
                  key: String, time: String, tiebreak: String,
                  value: String, allowExactMatches: Boolean = true): DataFrame =
    build(probes, series, key, time, tiebreak, value, forward = true,
      strict = !allowExactMatches)

  /** Backward as-of with a TOLERANCE bound (`merge_asof(tolerance=...)`):
    * the match must lie within `tolerance` of the probe time or the row
    * gets null. Composed over the native merge by carrying a (time,
    * value) struct through it — the bound is then a plain column filter
    * on the probe row (timestamp differences compare as intervals,
    * numerics as numerics), so the exec needs no new mode. */
  def joinBackwardTolerance(probes: DataFrame, series: DataFrame,
                            key: String, time: String, tiebreak: String,
                            value: String,
                            tolerance: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, struct, when}
    val s2 = series.withColumn("__tv",
      struct(col(time).as("t"), col(value).as("v")))
    // the merge's match time is always <= the probe time, so only the
    // upper bound needs checking
    joinBackward(probes, s2, key, time, tiebreak, "__tv")
      .withColumn("last_value",
        when(col("last_value").isNotNull &&
          (col(time) - col("last_value.t") <= tolerance), col("last_value.v"))
          .otherwise(lit(null)))
  }

  /** Nearest as-of join (`merge_asof` direction="nearest"): the closer of
    * the backward and forward matches by |series.time − probe.time|,
    * ties → the backward match. Composed from the two native merges by
    * carrying a (time, value) struct through each, so the distance
    * compare happens on the probe row with plain column arithmetic
    * (timestamp differences compare as intervals, numerics as numerics).
    * Output column: `nearest_value`. */
  def joinNearest(probes: DataFrame, series: DataFrame,
                  key: String, time: String, tiebreak: String,
                  value: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, struct, when}
    val s2 = series.withColumn("__tv",
      struct(col(time).as("t"), col(value).as("v")))
    val withB = joinBackward(probes, s2, key, time, tiebreak, "__tv")
      .withColumnRenamed("last_value", "__b")
    val withBF = joinForward(withB, s2, key, time, tiebreak, "__tv")
      .withColumnRenamed("next_value", "__f")
    val pt = col(time)
    val nearest = when(col("__b").isNull, col("__f.v"))
      .when(col("__f").isNull, col("__b.v"))
      .when(pt - col("__b.t") <= col("__f.t") - pt, col("__b.v"))
      .otherwise(col("__f.v"))
    withBF.withColumn("nearest_value", nearest).drop("__b", "__f")
  }
}
