package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Markov-chain multi-touch attribution [N] (Anderl et al. 2014's
  * removal-effect model — the standard upgrade from last-touch):
  * user journeys become a first-order chain START → touch channels →
  * {CONV, NULL}; a channel's credit is how much the K-step conversion
  * probability drops when the channel is removed (its inbound edges
  * redirected to NULL), normalized across channels.
  *
  * Scale shape: ONE window pass over events builds the journey bigram
  * counts (data-scale, map-side combinable hash agg); the transition
  * matrix is bounded by the channel VOCABULARY (≤ 36 cells at any SF),
  * so the five absorption fixpoints (base + one per removed channel)
  * are metadata-scale and run on the collected matrix — the IPF/
  * perceptron driver-side-scalar precedent, not a data-scale collect.
  *
  * Cross-engine determinism: floats never accumulate. Transition
  * probabilities quantize once to ×10¹² BIGINTs via a double
  * `round_even` of exact-int inputs (identical IEEE both engines);
  * each of the K=12 absorption steps is then exact integer arithmetic
  * — HUGEINT dot products and an explicit half-even integer division
  * back to the ×10¹² grid — so the truncated absorption probability
  * is bit-identical by construction, with K-step absorption as the
  * DEFINED semantic (no convergence argument needed). */
object Attribution extends graft.QueryModule {

  private val absorbSteps = 12
  private val channels = Seq("click", "error", "signup", "view")
  private val One12 = 1000000000000L // the x1e12 probability grid

  /** Journey transitions: per user, events ordered by (ts, event_id),
    * truncated at the first purchase; START precedes the first kept
    * touch; the last kept touch exits to CONV (user purchased) or NULL
    * (journey ended unconverted); a user whose first event is a
    * purchase contributes START → CONV. */
  private def transitions(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val ranked = Tables.events(s, d)
      .select(col("user_id"), col("event_type").as("t"),
        row_number().over(w).as("rk"))
    val fp = ranked.filter(col("t") === "purchase")
      .groupBy(col("user_id")).agg(min(col("rk")).as("fp"))
    val kept = ranked.join(fp, Seq("user_id"), "left")
      .filter(col("fp").isNull || col("rk") < col("fp"))
    val wk = Window.partitionBy(col("user_id")).orderBy(col("rk"))
    val steps = kept
      .withColumn("to_s", lead(col("t"), 1).over(wk))
      .select(col("t").as("from_s"),
        coalesce(col("to_s"),
          when(col("fp").isNotNull, lit("CONV")).otherwise(lit("NULL")))
          .as("to_s"))
    val starts = kept.groupBy(col("user_id"))
      .agg(min_by(col("t"), col("rk")).as("to_s"))
      .select(lit("START").as("from_s"), col("to_s"))
    val directConv = fp.join(
        kept.groupBy(col("user_id")).agg(count(lit(1)).as("nk")),
        Seq("user_id"), "left")
      .filter(col("nk").isNull)
      .select(lit("START").as("from_s"), lit("CONV").as("to_s"))
    steps.unionByName(starts).unionByName(directConv)
      .groupBy(col("from_s"), col("to_s"))
      .agg(count(lit(1)).as("n"))
  }

  /** Half-even division of a nonneg integer by the 1e12 grid — the
    * explicit form both the oracle and this side share. */
  private def halfEvenDiv12(sum: BigInt): Long = {
    val base = sum / One12
    val r = sum % One12
    val half = One12 / 2
    (base + (if (r > half) 1 else if (r < half) 0 else base % 2)).toLong
  }

  /** K-step absorption probability (x1e12) into CONV from START on the
    * chain with `removed`'s inbound edges redirected to NULL. */
  private def absorb12(trans: Seq[(String, String, Long)],
                       removed: Option[String]): Long = {
    val redirected = trans
      .filterNot { case (f, _, _) => removed.contains(f) }
      .map { case (f, t, n) =>
        (f, if (removed.contains(t)) "NULL" else t, n) }
      .groupBy { case (f, t, _) => (f, t) }
      .map { case ((f, t), rows) => (f, t, rows.map(_._3).sum) }
      .toSeq
    val tot = redirected.groupBy(_._1)
      .map { case (f, rows) => f -> rows.map(_._3).sum }
    // quantize once: round_even(n/tot * 1e12) on exact-int doubles —
    // the identical IEEE expression the oracle evaluates
    val prob12 = redirected.map { case (f, t, n) =>
      (f, t, math.rint(n.toDouble / tot(f).toDouble * 1e12).toLong)
    }
    val byFrom = prob12.groupBy(_._1)
    var p12: Map[String, Long] =
      Map("CONV" -> One12, "NULL" -> 0L) ++
        byFrom.keys.map(_ -> 0L)
    for (_ <- 1 to absorbSteps) {
      val next = byFrom.map { case (f, rows) =>
        f -> halfEvenDiv12(
          rows.map { case (_, t, p) =>
            BigInt(p) * BigInt(p12.getOrElse(t, 0L)) }.sum)
      }
      p12 = Map("CONV" -> One12, "NULL" -> 0L) ++ next
    }
    p12.getOrElse("START", 0L)
  }

  private def markovRemoval(s: SparkSession, d: String): DataFrame = {
    // vocabulary-bounded collect (<= (|channels|+1) x (|channels|+2))
    val trans = transitions(s, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val base12 = absorb12(trans, None)
    val base = base12.toDouble / 1e12
    val rows = channels.map { c =>
      val removed = absorb12(trans, Some(c)).toDouble / 1e12
      val effect = BigDecimal(1.0 - removed / base)
        .setScale(12, BigDecimal.RoundingMode.HALF_EVEN)
      (c, base, removed, effect)
    }
    // exact decimal total, then ONE double division (both operands'
    // unscaled values sit far below 2^53, so the double casts are exact)
    val totEffect = rows.map(_._4).sum.toDouble
    val out = rows.map { case (c, b, r, e) =>
      (c, b, r, e.toDouble, e.toDouble / totEffect)
    }
    s.createDataFrame(out)
      .toDF("channel", "base_p", "removed_p", "removal_effect", "attribution")
      .orderBy("channel")
  }

  /** The oracle unrolls all five chains × 12 integer-exact iterations
    * as generated CTEs (the IPF / pagerank oracle-generation
    * precedent) — large but machine-written from the same constants. */
  private def markovOracle: String = {
    val half = One12 / 2
    def chainCtes(tag: String, redirect: String, fromFilter: String): String = {
      val trans =
        s"""t_$tag AS MATERIALIZED (
           |  SELECT from_s, to_s,
           |         CAST(round_even(CAST(n AS DOUBLE)
           |           / CAST(sum(n) OVER (PARTITION BY from_s) AS DOUBLE)
           |           * 1000000000000.0, 0) AS BIGINT) AS prob12
           |  FROM (SELECT from_s, $redirect AS to_s, CAST(sum(n) AS BIGINT) AS n
           |        FROM trans $fromFilter
           |        GROUP BY 1, 2) r)""".stripMargin
      val p0 =
        s"""p_${tag}_0 AS (
           |  SELECT 'CONV' AS state, CAST($One12 AS HUGEINT) AS p12
           |  UNION ALL SELECT 'NULL', 0
           |  UNION ALL
           |  SELECT DISTINCT from_s, 0 FROM t_$tag)""".stripMargin
      val iters = (1 to absorbSteps).map { k =>
        s"""p_${tag}_$k AS (
           |  SELECT state, s // $One12
           |         + CASE WHEN s % $One12 > $half THEN 1
           |                WHEN s % $One12 = $half THEN (s // $One12) % 2
           |                ELSE 0 END AS p12
           |  FROM (SELECT t.from_s AS state,
           |               sum(CAST(t.prob12 AS HUGEINT) * p.p12) AS s
           |        FROM t_$tag t JOIN p_${tag}_${k - 1} p ON p.state = t.to_s
           |        GROUP BY t.from_s) x
           |  UNION ALL SELECT 'CONV', $One12
           |  UNION ALL SELECT 'NULL', 0)""".stripMargin
      }.mkString(",\n")
      s"$trans,\n$p0,\n$iters"
    }
    val chains = (("base" -> None) +: channels.map(c => c -> Some(c))).map {
      case (tag, rem) =>
        val redirect = rem
          .map(c => s"CASE WHEN to_s = '$c' THEN 'NULL' ELSE to_s END")
          .getOrElse("to_s")
        val ff = rem.map(c => s"WHERE from_s <> '$c'").getOrElse("")
        chainCtes(tag, redirect, ff)
    }.mkString(",\n")
    val effects = channels.map { c =>
      s"""SELECT '$c' AS channel,
         |  (SELECT CAST(p12 AS DOUBLE) / 1e12 FROM p_base_$absorbSteps
         |   WHERE state = 'START') AS base_p,
         |  (SELECT CAST(p12 AS DOUBLE) / 1e12 FROM p_${c}_$absorbSteps
         |   WHERE state = 'START') AS removed_p""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH ranked AS MATERIALIZED (
       |  SELECT user_id, event_type AS t,
       |         row_number() OVER (PARTITION BY user_id
       |                            ORDER BY ts, event_id) AS rk
       |  FROM events),
       |fp AS (SELECT user_id, min(rk) AS fp FROM ranked
       |       WHERE t = 'purchase' GROUP BY 1),
       |kept AS MATERIALIZED (
       |  SELECT r.user_id, r.t, r.rk, fp.fp
       |  FROM ranked r LEFT JOIN fp USING (user_id)
       |  WHERE fp.fp IS NULL OR r.rk < fp.fp),
       |steps AS (
       |  SELECT from_s, to_s FROM (
       |    SELECT t AS from_s,
       |           coalesce(lead(t) OVER (PARTITION BY user_id ORDER BY rk),
       |                    CASE WHEN fp IS NOT NULL THEN 'CONV'
       |                         ELSE 'NULL' END) AS to_s
       |    FROM kept) x
       |  UNION ALL
       |  SELECT 'START', min_by(t, rk) FROM kept GROUP BY user_id
       |  UNION ALL
       |  SELECT 'START', 'CONV'
       |  FROM fp LEFT JOIN (SELECT user_id, count(*) AS nk FROM kept
       |                     GROUP BY 1) k USING (user_id)
       |  WHERE k.nk IS NULL),
       |trans AS MATERIALIZED (
       |  SELECT from_s, to_s, count(*) AS n FROM steps GROUP BY 1, 2),
       |$chains,
       |eff AS (
       |  SELECT channel, base_p, removed_p,
       |         round_even(1.0 - removed_p / base_p, 12) AS removal_effect
       |  FROM ($effects) e),
       |tot AS (SELECT sum(CAST(removal_effect AS DECIMAL(16,12))) AS te FROM eff)
       |SELECT channel, base_p, removed_p, removal_effect,
       |       removal_effect / CAST(te AS DOUBLE) AS attribution
       |FROM eff CROSS JOIN tot
       |ORDER BY channel""".stripMargin
  }

  /** Shapley-value attribution [N] (Shapley 1953 applied to channel
    * coalitions — the other standard multi-touch model next to Markov
    * removal): with coalition value v(S) = converted users whose touch
    * set ⊆ S, channel c earns φ_c = Σ_{S∌c} |S|!(k−1−|S|)!/k! ·
    * (v(S∪c) − v(S)). k = 4 channels → the weights ×24 are the exact
    * integers {6, 2, 2, 6}, so φ·24 is an exact BIGINT and the only
    * float is the final /24.0 display division. Efficiency axiom
    * (Σφ = v(all) − v(∅)) is spec-pinned.
    *
    * Scale shape: ONE data-scale hash agg folds events into a per-user
    * 4-bit channel mask + conversion flag; everything after runs on
    * the 16-subset lattice (broadcast joins over `range(16)`). */
  private def shapley(s: SparkSession, d: String): DataFrame = {
    val per = Tables.events(s, d)
      .filter(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(
        max(when(col("event_type") === "click", 1).otherwise(0)).as("hc"),
        max(when(col("event_type") === "error", 1).otherwise(0)).as("he"),
        max(when(col("event_type") === "signup", 1).otherwise(0)).as("hs"),
        max(when(col("event_type") === "view", 1).otherwise(0)).as("hv"),
        max(when(col("event_type") === "purchase", 1).otherwise(0))
          .as("conv"))
    val cnt = per.filter(col("conv") === 1)
      .select((col("hc") + col("he") * 2 + col("hs") * 4 + col("hv") * 8)
        .as("m"))
      .groupBy("m").agg(count(lit(1)).as("cm"))
    val subsets = s.range(16).select(col("id").cast("int").as("st"))
    val v = subsets.join(broadcast(cnt), expr("(m & st) = m"), "left")
      .groupBy("st").agg(coalesce(sum(col("cm")), lit(0L)).as("v"))
      .localCheckpoint() // 16 rows, joined twice below
    val chan = s.createDataFrame(Seq(
      ("click", 1), ("error", 2), ("signup", 4), ("view", 8)))
      .toDF("channel", "bit")
    chan
      .join(broadcast(v), expr("(st & bit) = 0"))
      .join(broadcast(v.select(col("st").as("st2"), col("v").as("v2"))),
        expr("st2 = st + bit"))
      .withColumn("w", expr(
        "case bit_count(st) when 0 then 6 when 1 then 2" +
          " when 2 then 2 else 6 end"))
      .groupBy("channel")
      .agg(sum(col("w") * (col("v2") - col("v"))).as("phi24"))
      .select(col("channel"), col("phi24"),
        (col("phi24").cast("double") / lit(24.0)).as("shapley"))
      .orderBy("channel")
  }

  private def shapleyOracle: String =
    """WITH per AS (
      |  SELECT user_id,
      |         max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS hc,
      |         max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS he,
      |         max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS hs,
      |         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS hv,
      |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |           AS conv
      |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
      |cnt AS (
      |  SELECT hc + he * 2 + hs * 4 + hv * 8 AS m, count(*) AS cm
      |  FROM per WHERE conv = 1 GROUP BY 1),
      |subsets AS (SELECT unnest(generate_series(0, 15)) AS st),
      |v AS (
      |  SELECT st, COALESCE(sum(cm), 0) AS v
      |  FROM subsets LEFT JOIN cnt ON (m & st) = m GROUP BY st),
      |chan(channel, bit) AS (VALUES ('click', 1), ('error', 2),
      |                              ('signup', 4), ('view', 8)),
      |d AS (
      |  SELECT channel,
      |         sum((CASE bit_count(a.st) WHEN 0 THEN 6 WHEN 1 THEN 2
      |              WHEN 2 THEN 2 ELSE 6 END) * (b.v - a.v)) AS phi24
      |  FROM chan JOIN v a ON (a.st & bit) = 0
      |  JOIN v b ON b.st = a.st + bit
      |  GROUP BY 1)
      |SELECT channel, CAST(phi24 AS BIGINT) AS phi24,
      |       CAST(phi24 AS DOUBLE) / 24.0 AS shapley
      |FROM d ORDER BY channel""".stripMargin

  /** Top user-journey path prefixes [N] — the "what do people actually
    * do first" report next to the Markov/Shapley models: each user's
    * first five events (totally ordered by ts, event_id — ties can't
    * reorder the path) joined as a `>` path string, counted, top-20.
    * One hash agg per user with a bounded sorted collect (per-user
    * event counts are small); no window over the global stream. */
  private def topPaths(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d)
      .filter(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(expr(
        """array_join(transform(
          |  slice(array_sort(collect_list(
          |    struct(ts, event_id, event_type))), 1, 5),
          |  x -> x.event_type), '>')""".stripMargin).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(20)
  }

  private def topPathsOracle: String =
    """WITH paths AS (
      |  SELECT array_to_string(
      |           (list(event_type ORDER BY ts, event_id))[1:5], '>')
      |           AS path
      |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id)
      |SELECT path, CAST(count(*) AS BIGINT) AS n_users
      |FROM paths GROUP BY path
      |ORDER BY n_users DESC, path LIMIT 20""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "attr_markov_removal" -> markovRemoval,
    "attr_top_paths" -> topPaths,
    "attr_shapley" -> shapley)

  val oracles: Map[String, String] = Map(
    "attr_markov_removal" -> markovOracle,
    "attr_top_paths" -> topPathsOracle,
    "attr_shapley" -> shapleyOracle)
}
