package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query key executes at sf0.001 (the driver's t1 shape);
  * contract invariants between `queries` and `oracleSql`. */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("no registered output schema carries DecimalType (boundary convention)") {
    // decimals are internal-only: the driver's hasher reads Spark parquet
    // decimals as decimal.Decimal while DuckDB lands float64, so a raw
    // DECIMAL column hash-fails on type even when values are exact
    // (fn_xml, round 8). Boundary types are double/long/string/date/bool.
    import org.apache.spark.sql.types.{DecimalType, StructType, ArrayType, MapType, DataType}
    def hasDecimal(t: DataType): Boolean = t match {
      case _: DecimalType => true
      case s: StructType  => s.fields.exists(f => hasDecimal(f.dataType))
      case a: ArrayType   => hasDecimal(a.elementType)
      case m: MapType     => hasDecimal(m.keyType) || hasDecimal(m.valueType)
      case _              => false
    }
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val bad = fn(spark, TestSpark.sf0001).schema.fields
          .filter(f => hasDecimal(f.dataType)).map(_.name)
        if (bad.nonEmpty) Some(s"$name(${bad.mkString(",")})") else None
    }
    assert(offenders.isEmpty,
      s"DecimalType at the output boundary: ${offenders.mkString("; ")}")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001") {
      val df = fn(spark, TestSpark.sf0001)
      assert(df.count() >= 0)
    }
  }

  test("agg_cohort_retention: day-0 retention is 1.0, cohorts partition users") {
    val rows = SparkEntry.queries("agg_cohort_retention")(spark, TestSpark.sf0001)
      .collect()
      .map(r => (r.getDate(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val day0 = rows.filter(_._2 == 0)
    assert(day0.forall(_._4 == 1.0), "every cohort is fully active on day 0")
    assert(rows.forall(r => r._4 >= 0.0 && r._4 <= 1.0))
    // day-0 actives across cohorts partition the user population
    val users = graft.Tables.events(spark, TestSpark.sf0001)
      .select("user_id").distinct().count()
    assert(day0.map(_._3).sum == users)
  }

  test("agg_boolean_bitwise: every aggregate equals a driver-side fold") {
    val got = SparkEntry.queries("agg_boolean_bitwise")(spark, TestSpark.sf0001)
      .collect().map(r => r.getString(0) -> r).toMap
    val raw = graft.Tables.orders(spark, TestSpark.sf0001)
      .select("o_orderpriority", "o_totalprice", "o_custkey")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(raw.nonEmpty && got.keySet == raw.map(_._1).toSet)
    raw.groupBy(_._1).foreach { case (g, rs) =>
      val r = got(g)
      assert(r.getBoolean(1) == rs.forall(_._2 > 1000.0), s"bool_and $g")
      assert(r.getBoolean(2) == rs.exists(_._2 > 400000.0), s"bool_or $g")
      assert(r.getBoolean(3) == rs.forall(_._3 > 0), s"every_pos $g")
      assert(r.getLong(4) == rs.count(_._2 > 200000.0), s"count_if $g")
      assert(r.getLong(5) == rs.map(_._3).reduce(_ & _), s"bit_and $g")
      assert(r.getLong(6) == rs.map(_._3).reduce(_ | _), s"bit_or $g")
      assert(r.getLong(7) == rs.map(_._3).reduce(_ ^ _), s"bit_xor $g")
    }
  }

  test("win_interval_merge: islands disjoint with strict gaps, cover all rows") {
    val merged = SparkEntry.queries("win_interval_merge")(spark, TestSpark.sf0001)
      .collect()
    merged.groupBy(_.getLong(0)).foreach { case (k, rows) =>
      val sorted = rows.toList.sortBy(_.getDate(1).toLocalDate.toEpochDay)
      sorted.sliding(2).foreach {
        case a :: b :: Nil =>
          // next island starts strictly AFTER this one ends (else they
          // would have merged)
          assert(b.getDate(1).toLocalDate.toEpochDay >
            a.getDate(2).toLocalDate.toEpochDay, s"customer $k islands touch")
        case _ => ()
      }
    }
    val covered = merged.map(_.getLong(4)).sum
    assert(covered == graft.Tables.orders(spark, TestSpark.sf0001).count())
  }

  test("win_interpolate: pass-through on known rows, bounded fills between neighbors") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("win_interpolate")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val raw = graft.Tables.events(spark, TestSpark.sf0001)
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_id") % 7 === 0, lit(null))
          .otherwise(col("value").cast("decimal(12,2)").cast("double")).as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(raw.exists(_._4.isEmpty), "need null readings for the test to bite")
    raw.groupBy(_._1).foreach { case (u, rs) =>
      val sorted = rs.sortBy(r =>
        (r._2.toInstant.getEpochSecond, r._2.toInstant.getNano, r._3))
      sorted.zipWithIndex.foreach { case ((_, _, id, v), i) =>
        val filled = got((u, id))
        v match {
          case Some(x) => assert(filled == x, s"known row $id changed")
          case None =>
            val prev = sorted.take(i).flatMap(_._4).lastOption
            val next = sorted.drop(i + 1).flatMap(_._4).headOption
            (prev, next) match {
              case (Some(p), Some(n)) =>
                val (lo, hi) = (math.min(p, n), math.max(p, n))
                assert(filled >= lo - 1e-6 && filled <= hi + 1e-6,
                  s"fill $filled outside [$lo, $hi] for row $id")
              case (Some(p), None) => assert(filled == p)
              case (None, Some(n)) => assert(filled == n)
              case (None, None) => ()
            }
        }
      }
    }
  }

  test("win_skyline equals the brute-force NOT-EXISTS dominance definition") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("win_skyline")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2)))
      .toSeq.sorted
    // brute force over the distinct point set: p survives iff no q with
    // q.x >= p.x, q.y >= p.y and at least one strict
    val pts = graft.Tables.lineitem(spark, TestSpark.sf0001)
      .select(col("l_quantity").cast("int").as("x"),
        col("l_extendedprice").cast("decimal(12,2)").cast("double").as("y"))
      .collect().map(r => (r.getInt(0), r.getDouble(1)))
    val distinctPts = pts.distinct
    val sky = distinctPts.filter { case (px, py) =>
      !distinctPts.exists { case (qx, qy) =>
        qx >= px && qy >= py && (qx > px || qy > py) }
    }.map { case (px, py) =>
      (px, py, pts.count(p => p._1 == px && p._2 == py).toLong)
    }.toSeq.sorted
    assert(got == sky, s"skyline mismatch:\ngot  $got\nwant $sky")
  }

  test("win_rolling_median: bit-equal to a driver-side sorted-frame fold") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("win_rolling_median")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val raw = graft.Tables.events(spark, TestSpark.sf0001)
      .filter(col("event_type") === "click" && col("value").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    assert(raw.nonEmpty && got.size == raw.length)
    raw.groupBy(_._1).foreach { case (u, rs) =>
      val sorted = rs.sortBy(r =>
        (r._2.toInstant.getEpochSecond, r._2.toInstant.getNano, r._3))
      sorted.indices.foreach { i =>
        // same decimal(12,2) pin as the query (Spark casts HALF_UP)
        val frame = sorted.slice(math.max(0, i - 9), i + 1)
          .map(r => BigDecimal(r._4).setScale(2, BigDecimal.RoundingMode.HALF_UP))
          .sorted
        val n = frame.length
        val med =
          if (n % 2 == 1) frame((n + 1) / 2 - 1).toDouble
          else (frame(n / 2 - 1).toDouble + frame(n / 2).toDouble) / 2.0
        assert(got((u, sorted(i)._3)) == med, s"user $u row ${sorted(i)._3}")
      }
    }
  }

  test("agg_approx_distinct: exact counts + in-query HLL bound, sf0.1") {
    // since r9 the key carries its own error-bound boolean (hll_ok) and
    // is oracle-checked; this test re-runs it at the bench scale and
    // additionally measures the raw HLL error at a tighter 2% bound
    import org.apache.spark.sql.functions._
    val sf01 = "/root/testdata/sf0.1"
    val rows = SparkEntry.queries("agg_approx_distinct")(spark, sf01).collect()
    assert(rows.forall(_.getBoolean(2)), "hll_ok must hold at sf0.1")
    val exact = graft.Tables.events(spark, sf01)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("users"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(r => r.getString(0) -> r.getLong(1)).toMap == exact)
    val approx = graft.Tables.events(spark, sf01)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.01).as("a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val errs = exact.map { case (k, ex) =>
      k -> math.abs(approx(k) - ex).toDouble / ex }
    info(errs.map { case (k, e) => f"$k: ${e * 100}%.2f%%" }.mkString(", "))
    errs.foreach { case (k, e) =>
      assert(e <= 0.02, f"HLL error for $k is ${e * 100}%.2f%% (> 2%%)") }
  }

  test("agg_approx_percentile: rank-error booleans hold, values drift <= 1%") {
    import org.apache.spark.sql.functions._
    // the key's own contract (rank error <= 1.1%, oracle-checked since r9)
    val rows = SparkEntry.queries("agg_approx_percentile")(spark, TestSpark.sf001)
      .collect()
    assert(rows.forall(r => r.getBoolean(2) && r.getBoolean(3)),
      "GK rank-error bound must hold")
    // and the tighter value-drift property vs exact interpolation
    val approx = graft.Tables.lineitem(spark, TestSpark.sf001)
      .groupBy(col("l_returnflag"))
      .agg(expr("approx_percentile(l_extendedprice, array(0.5, 0.9), 10000)").as("p"))
      .select(col("l_returnflag"),
        element_at(col("p"), 1).as("a50"), element_at(col("p"), 2).as("a90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = graft.Tables.lineitem(spark, TestSpark.sf001)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.9)").as("p90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (p50, p90)) =>
      val (a50, a90) = approx(k)
      assert(math.abs(a50 - p50) / p50 <= 0.01, s"$k p50: $a50 vs $p50")
      assert(math.abs(a90 - p90) / p90 <= 0.01, s"$k p90: $a90 vs $p90")
    }
  }

  test("ANSI mode is ON: unguarded division by zero throws; try_divide nulls") {
    val e = intercept[Exception] {
      spark.sql("SELECT 10 / (id - id) FROM range(1)").collect()
    }
    assert(e.getMessage.contains("DIVIDE_BY_ZERO"), e.getMessage)
    val ok = spark.sql("SELECT try_divide(10, id - id) FROM range(1)").collect()
    assert(ok.head.isNullAt(0))
  }

  test("fn_variant: stable variant schema, missing path types to null") {
    import org.apache.spark.sql.functions._
    val df = graft.Tables.events(spark, TestSpark.sf0001)
      .selectExpr("schema_of_variant(parse_json(props)) AS sch",
        "try_variant_get(parse_json(props), '$.nope', 'int') AS miss")
    val schemas = df.select("sch").distinct().collect().map(_.getString(0)).toSet
    assert(schemas == Set("OBJECT<k: BIGINT>"), s"unexpected: $schemas")
    assert(df.filter(col("miss").isNotNull).count() == 0)
  }

  test("sql_recursive_cte: spine is contiguous, daily counts cover all events") {
    val rows = SparkEntry.queries("sql_recursive_cte")(spark, TestSpark.sf0001)
      .collect()
    val days = rows.map(_.getDate(0).toLocalDate)
    days.sliding(2).foreach {
      case Array(a, b) => assert(b == a.plusDays(1), s"gap between $a and $b")
      case _ => ()
    }
    assert(rows.map(_.getLong(1)).sum ==
      graft.Tables.events(spark, TestSpark.sf0001).count())
  }

  test("agg_hll_reaggregate: union bound holds, union == direct sketch") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf001
    // the key now outputs (event_type, n_days, exact_users, union_ok);
    // union_ok is the oracle-checked 5% bound — assert it and the
    // tighter 3% drift here
    val rows = SparkEntry.queries("agg_hll_reaggregate")(spark, sf).collect()
    assert(rows.forall(_.getBoolean(3)), "union_ok must hold")
    val exact = rows.map(r => r.getString(0) -> r.getLong(2)).toMap
    def sketch(aggSql: String): Map[String, Long] = {
      val day = graft.Tables.events(spark, sf)
        .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
      day.groupBy(col("event_type"), col("day"))
        .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
        .groupBy(col("event_type"))
        .agg(expr(aggSql).as("u"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val unioned = sketch("hll_sketch_estimate(hll_union_agg(sk, false))")
    exact.foreach { case (k, ex) =>
      assert(math.abs(unioned(k) - ex).toDouble / ex <= 0.03,
        s"$k: sketch ${unioned(k)} vs exact $ex")
    }
    // re-aggregation must be lossless: unioning the daily sketches gives
    // the same estimate as sketching the raw column directly
    val direct = graft.Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))").as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(unioned == direct, s"sketch union lost information: $unioned vs $direct")
  }

  test("agg_regression agrees with built-in regr_slope/intercept/r2 to 1e-6") {
    import org.apache.spark.sql.functions._
    val exactForm = SparkEntry.queries("agg_regression")(spark, TestSpark.sf001)
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val builtin = graft.Tables.events(spark, TestSpark.sf001)
      .select(col("event_type"),
        col("value").cast("decimal(12,2)").cast("double").as("x"),
        get_json_object(col("props"), "$.k").cast("int").as("y"))
      .filter(col("y").isNotNull)
      .groupBy(col("event_type"))
      .agg(expr("regr_slope(y, x)").as("s"),
        expr("regr_intercept(y, x)").as("i"),
        expr("regr_r2(y, x)").as("r"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(exactForm.keySet == builtin.keySet)
    builtin.foreach { case (k, (s, i, r)) =>
      val (es, ei, er) = exactForm(k)
      assert(math.abs(es - s) < 1e-6, s"$k slope: $es vs $s")
      assert(math.abs(ei - i) < 1e-6, s"$k intercept: $ei vs $i")
      assert(math.abs(er - r) < 1e-6, s"$k r2: $er vs $r")
    }
  }

  test("agg_corr_exact agrees with built-in corr to 1e-7") {
    import org.apache.spark.sql.functions._
    val exactForm = SparkEntry.queries("agg_corr_exact")(spark, TestSpark.sf001)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val builtin = graft.Tables.events(spark, TestSpark.sf001)
      .select(col("event_type"), col("value").as("x"),
        get_json_object(col("props"), "$.k").cast("int").as("y"))
      .filter(col("y").isNotNull)
      .groupBy(col("event_type"))
      .agg(corr(col("x"), col("y")).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(exactForm.keySet == builtin.keySet)
    builtin.foreach { case (k, c) =>
      // the exact form emits bround(corr, 8): quantization alone is 5e-9
      assert(math.abs(exactForm(k) - c) < 1e-7, s"$k: ${exactForm(k)} vs $c")
    }
  }
}
