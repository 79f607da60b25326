package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.pipeline.Snapshots

/** Warehouse-operations layer (SURVEY §2 extensions, round 2): the
  * data-quality expectation checks and slowly-changing-dimension
  * construction every production warehouse runs around its facts.
  */
object Warehouse extends graft.QueryModule {

  /** Order-invariant table fingerprint [N] — the replication/migration
    * audit primitive ("is the copy byte-equivalent?") that never sorts:
    * each row canonicalizes to a pipe-joined string (ints + fixed-scale
    * decimal renderings, identical across engines), hashes through md5
    * to a 32-bit value, and the per-group checksum is the XOR aggregate
    * — commutative and associative, so ANY partitioning/order yields
    * the same fingerprint, and group checksums XOR into the grand
    * total without rescanning (the mergeable-rollup shape). One scan,
    * map-side combinable, zero sorts at any scale. */
  private def tableChecksum(s: SparkSession, d: String): DataFrame = {
    val rowHash = expr(
      "graft_hex_long(md5(concat_ws('|', " +
        "cast(l_orderkey as string), cast(l_linenumber as string), " +
        "cast(cast(l_quantity as bigint) as string), " +
        "cast(cast(l_extendedprice as decimal(12,2)) as string)" +
        ")), 1, 8)")
    val per = Tables.lineitem(s, d)
      .select(col("l_returnflag").as("grp"), rowHash.as("h"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("checksum"))
    val all = per.agg(sum(col("n_rows")).as("n_rows"),
        expr("bit_xor(checksum)").as("checksum"))
      .select(lit("ALL").as("grp"), col("n_rows"), col("checksum"))
    per.unionByName(all).orderBy("grp")
  }

  private val tableChecksumOracle = {
    val canon = "md5(concat_ws('|', CAST(l_orderkey AS VARCHAR), " +
      "CAST(l_linenumber AS VARCHAR), " +
      "CAST(CAST(l_quantity AS BIGINT) AS VARCHAR), " +
      "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR)))"
    val poly = (0 until 8).map { i =>
      s"(strpos('0123456789abcdef', substr(hx, ${i + 1}, 1)) - 1)" +
        s" * ${1L << (4 * (7 - i))}"
    }.mkString("(", "\n      + ", ")")
    s"""WITH hx0 AS (SELECT l_returnflag AS grp, $canon AS hx FROM lineitem),
       |h AS (SELECT grp, $poly AS h FROM hx0),
       |per AS (
       |  SELECT grp, count(*) AS n_rows, bit_xor(h) AS checksum
       |  FROM h GROUP BY grp)
       |SELECT grp, CAST(n_rows AS BIGINT) AS n_rows,
       |       CAST(checksum AS BIGINT) AS checksum
       |FROM per
       |UNION ALL
       |SELECT 'ALL', CAST(sum(n_rows) AS BIGINT),
       |       CAST(bit_xor(checksum) AS BIGINT)
       |FROM per
       |ORDER BY grp""".stripMargin
  }

  /** Declarative data-quality expectations over the star schema — range
    * checks, null checks, PK uniqueness, FK referential integrity — as
    * ONE report of violation counts (the dbt-test / Deequ shape).
    *
    * Scale shape: all single-table checks for a table fuse into one
    * conditional-aggregate scan (one pass over lineitem regardless of
    * how many expectations it carries); the FK check is a left-anti
    * broadcast join; nothing ever collects row-level violations to the
    * driver. */
  private def qualityChecks(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).agg(
      sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L).otherwise(0L))
        .as("lineitem_qty_range"),
      sum(when(col("l_discount") < 0 || col("l_discount") > 0.1, 1L).otherwise(0L))
        .as("lineitem_disc_range"),
      sum(when(col("l_extendedprice").isNull, 1L).otherwise(0L))
        .as("lineitem_null_price"))
      .selectExpr("""stack(3,
        'lineitem_qty_range', lineitem_qty_range,
        'lineitem_disc_range', lineitem_disc_range,
        'lineitem_null_price', lineitem_null_price) AS (check_name, n_violations)""")
    val fk = Tables.orders(s, d)
      .join(Tables.customer(s, d),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("orders_fk_customer").as("check_name"), col("n_violations"))
    val dup = Tables.orders(s, d)
      .agg((count(lit(1)) - countDistinct(col("o_orderkey"))).as("n_violations"))
      .select(lit("orders_dup_pk").as("check_name"), col("n_violations"))
    li.unionByName(fk).unionByName(dup).orderBy("check_name")
  }

  /** SCD type-2 interval construction: per entity, each observed value
    * becomes a versioned row with `[valid_from, valid_to)` effectivity,
    * open-ended (`is_current`) for the latest — the standard dimension-
    * history merge, built from the event stream.
    *
    * Scale shape: one hash exchange on the entity key, one sorted window
    * pass (lead + row_number share the same window frame, so Catalyst
    * plans a single Window operator). */
  private def scd2Intervals(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("valid_from"), col("event_id"))
    Tables.events(s, d)
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("event_id"), col("value"),
        col("ts").as("valid_from"))
      // open-ended rows close at a far-future SCD2 sentinel (keeps the
      // column non-null: range predicates stay sargable and the oracle
      // compare never sees engine-specific null-timestamp forms). The
      // sentinel must stay inside pandas datetime64[ns] range (max
      // 2262-04-11): the conventional 9999-12-31 overflows ns-resolution
      // consumers even though Spark and DuckDB both handle it.
      .withColumn("valid_to", coalesce(lead(col("valid_from"), 1).over(w),
        lit("2200-01-01 00:00:00").cast("timestamp")))
      .withColumn("version", row_number().over(w))
      .withColumn("is_current", col("valid_to") === lit("2200-01-01 00:00:00").cast("timestamp"))
      .orderBy("user_id", "version")
  }

  /** MERGE INTO (upsert) semantics without a table format: next snapshot
    * = full-outer join of base vs updates on the key — matched rows take
    * the update, unmatched-by-update rows survive, update-only rows
    * insert. Base: customers outside segment 'BUILDING'; updates: a
    * recomputed balance for every customer with an order. The `action`
    * column records the MERGE branch each row took.
    *
    * Scale shape: one hash exchange per side on the merge key (AQE can
    * broadcast a small update batch); no driver-side diffing. With a
    * transactional table format the same plan feeds MERGE INTO directly. */
  private def mergeUpsert(s: SparkSession, d: String): DataFrame = {
    val base = Tables.customer(s, d)
      .filter(col("c_mktsegment") =!= "BUILDING")
      .select(col("c_custkey").as("key"), col("c_acctbal").as("balance"))
    val updates = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(max(col("o_totalprice")).as("new_balance"))
      .select(col("o_custkey").as("ukey"), col("new_balance"))
    base.join(updates, col("key") === col("ukey"), "full_outer")
      .select(
        coalesce(col("key"), col("ukey")).as("key"),
        coalesce(col("new_balance"), col("balance")).as("balance"),
        when(col("key").isNull, "insert")
          .when(col("ukey").isNull, "keep")
          .otherwise("update").as("action"))
      .orderBy("key")
  }

  /** Incremental aggregate maintenance ([[Incremental]]): state built
    * from orders BEFORE 1999, three months of 1999 folded in as
    * insert-only deltas batch by batch — never rescanning the base —
    * then the state is served. The oracle recomputes the same aggregate
    * over the full union, so the hash check IS the proof that
    * state+deltas equals a from-scratch groupBy. Decimal sum state;
    * doubles only at the output boundary. */
  private def aggIncremental(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(col("o_custkey"),
      col("o_orderdate"), col("o_totalprice").cast("decimal(12,2)").as("price"))
    val keys = Seq("o_custkey")
    var st = Incremental.state(
      o.filter(col("o_orderdate") < "1999-01-01"), keys, "price")
    for (m <- Seq("01", "02", "03")) {
      val delta = o.filter(col("o_orderdate") >= s"1999-$m-01" &&
        col("o_orderdate") < (if (m == "03") "1999-04-01" else s"1999-0${m.toInt + 1}-01"))
      st = Incremental.mergeDelta(st, delta, keys, "price")
    }
    st.select(col("o_custkey"), col("n"),
        col("s").cast("double").as("total"),
        col("mn").cast("double").as("mn"), col("mx").cast("double").as("mx"))
      .orderBy("o_custkey")
  }

  /** Retraction-aware view maintenance (VERDICT r6 #6): the per-customer
    * (count, sum) view is built over the PREV snapshot, then maintained
    * to the CURR snapshot purely by folding [[cdcCapture]]'s I/U/D
    * changelog as signed deltas ([[Incremental.mergeChangelog]]) —
    * inserts add, deletes SUBTRACT, updates add the price difference.
    * The oracle recomputes the view from scratch over CURR, so the hash
    * equality proves updates AND deletes maintain the view exactly; the
    * base table is never rescanned (cost O(changelog + state)). Prices
    * pin ONCE to 2dp decimals and the 5% bump runs in exact decimal
    * arithmetic (scale 4) — a double-side `*1.05` then re-round hit a
    * half-even tie one engine resolved differently. */
  /** Shared with [[StreamBatch]]'s streaming twin: the per-customer
    * (count, sum) view over the PREV snapshot, and the I/U/D changelog
    * that carries it to CURR. */
  private[ops] def cdcViewParts(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    val pinned = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("decimal(12,2)").as("p2"))
    val prev = pinned.filter(col("o_orderkey") % 11 =!= 3)
      .select(col("o_orderkey"), col("o_custkey"),
        col("p2").cast("decimal(16,4)").as("price"))
    val curr = pinned.filter(col("o_orderkey") % 7 =!= 2)
      .select(col("o_orderkey"), col("o_custkey"),
        when(col("o_orderkey") % 5 === 0,
          col("p2") * lit(1.05).cast("decimal(3,2)"))
          .otherwise(col("p2").cast("decimal(16,4)")).as("price"))
    val log = prev.as("a").join(curr.as("b"), Seq("o_orderkey"), "full_outer")
      .select(
        when(col("a.o_custkey").isNull, lit("I"))
          .when(col("b.o_custkey").isNull, lit("D"))
          .when(col("a.price") =!= col("b.price"), lit("U"))
          .as("op"),
        coalesce(col("b.o_custkey"), col("a.o_custkey")).as("o_custkey"),
        col("a.price").as("old_price"),
        col("b.price").as("new_price"))
      .filter(col("op").isNotNull)
    val view0 = prev.groupBy(col("o_custkey"))
      .agg(count(col("price")).as("n"), sum(col("price")).as("s"))
    (view0, log)
  }

  private def aggIncrementalCdc(s: SparkSession, d: String): DataFrame = {
    val (view0, log) = cdcViewParts(s, d)
    Incremental.mergeChangelog(view0, log, Seq("o_custkey"),
        "old_price", "new_price")
      .select(col("o_custkey"), col("n"), col("s").cast("double").as("total"))
      .orderBy("o_custkey")
  }

  /** Snapshot time travel ([[graft.pipeline.Snapshots]]): commit the
    * customer balance table as v0, commit the order-merged table as v1,
    * then read BOTH versions back FROM THE FILES and summarize each.
    * The oracle recomputes both snapshots from the base tables, so the
    * hash check proves the as-of reads return exactly what was
    * committed — v0 unchanged by the v1 commit. */
  private def sinkTimeTravel(s: SparkSession, d: String): DataFrame = {
    val dir = graft.Scratch.dir("snapshots_customer")
    // the key must be re-runnable: clear prior commits so v0/v1 are
    // exactly this run's two versions
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(dir))
    val v0 = Tables.customer(s, d)
      .select(col("c_custkey").as("key"),
        col("c_acctbal").cast("decimal(12,2)").as("balance"))
    val upd = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(max(col("o_totalprice")).cast("decimal(12,2)").as("nb"))
    val v1 = v0.join(upd, col("key") === col("o_custkey"), "full_outer")
      .select(coalesce(col("key"), col("o_custkey")).as("key"),
        coalesce(col("nb"), col("balance")).as("balance"))
    Snapshots.commit(v0, dir)
    Snapshots.commit(v1, dir)
    def summarize(version: Int) =
      Snapshots.readAsOf(s, dir, version)
        .agg(count(lit(1)).as("n_rows"),
          sum(col("balance")).cast("double").as("total_balance"))
        .select(lit(version).as("version"), col("n_rows"), col("total_balance"))
    summarize(0).unionByName(summarize(1)).orderBy("version")
  }

  /** Incremental join maintenance ([[Incremental.joinDelta]]): the
    * materialized orders⋈customer view maintained under insert-only
    * deltas on BOTH sides (1999 orders; BUILDING-segment customers)
    * without ever recomputing the base join. The oracle is the full
    * from-scratch join, so the hash check is the delta-identity proof. */
  private def joinIncremental(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_totalprice"))
    val c = Tables.customer(s, d)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val (a0, dA) = (o.filter(col("o_orderdate") < "1999-01-01"),
      o.filter(col("o_orderdate") >= "1999-01-01"))
    val (b0, dB) = (c.filter(col("c_mktsegment") =!= "BUILDING"),
      c.filter(col("c_mktsegment") === "BUILDING"))
    val m0 = a0.join(b0, Seq("o_custkey"))
    Incremental.joinDelta(m0, a0, dA, b0, dB, Seq("o_custkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("c_mktsegment"))
      .orderBy("o_orderkey")
  }

  /** Change-data-capture between two keyed snapshots: a full-outer join
    * on the key emits one changelog row per insert (`I`), delete (`D`)
    * or value update (`U`); unchanged rows drop out. The two snapshots
    * are carved deterministically from `orders` (key mod filters +
    * a 5% price bump on every 5th key), so the changelog is exactly
    * reproducible — this is the batch diff the reference's
    * commit-if-changed sink implies but never materializes
    * (fetch_data.py overwrites blindly). At scale both sides shuffle
    * once on the key; AQE handles the skewless equi-join. */
  private def cdcCapture(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val old = base.filter(col("o_orderkey") % 11 =!= 3)
    val neu = base.filter(col("o_orderkey") % 7 =!= 2)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 5 === 0, col("o_totalprice") * lit(1.05))
          .otherwise(col("o_totalprice")))
    old.as("a").join(neu.as("b"), Seq("o_orderkey"), "full_outer")
      .select(col("o_orderkey"),
        when(col("a.o_custkey").isNull, lit("I"))
          .when(col("b.o_custkey").isNull, lit("D"))
          .when(col("a.o_totalprice") =!= col("b.o_totalprice"), lit("U"))
          .as("op"),
        col("a.o_totalprice").as("old_price"),
        col("b.o_totalprice").as("new_price"))
      .filter(col("op").isNotNull)
      .orderBy("o_orderkey")
  }

  /** The SAME changelog as [[cdcCapture]], but computed BETWEEN STORED
    * SNAPSHOT VERSIONS: both table states commit to the time-travel
    * store ([[graft.pipeline.Snapshots]]) and the diff reads them back
    * as-of v0/v1 — CDC as a pure function of the version store, no
    * access to the original inputs. Shares cdc_capture's oracle: the
    * hash match proves commit → read-as-of → diff loses nothing. */
  private def cdcTimeTravel(s: SparkSession, d: String): DataFrame = {
    val dir = graft.Scratch.dir("orders_cdc_versions")
    val base = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val f = new java.io.File(dir)
    if (f.exists()) { def rm(x: java.io.File): Unit = {
      Option(x.listFiles()).getOrElse(Array.empty).foreach(rm); x.delete(); () }
      rm(f) }
    Snapshots.commit(base.filter(col("o_orderkey") % 11 =!= 3), dir)
    Snapshots.commit(base.filter(col("o_orderkey") % 7 =!= 2)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 5 === 0, col("o_totalprice") * lit(1.05))
          .otherwise(col("o_totalprice"))), dir)
    val old = Snapshots.readAsOf(s, dir, 0)
    val neu = Snapshots.readAsOf(s, dir, 1)
    old.as("a").join(neu.as("b"), Seq("o_orderkey"), "full_outer")
      .select(col("o_orderkey"),
        when(col("a.o_custkey").isNull, lit("I"))
          .when(col("b.o_custkey").isNull, lit("D"))
          .when(col("a.o_totalprice") =!= col("b.o_totalprice"), lit("U"))
          .as("op"),
        col("a.o_totalprice").as("old_price"),
        col("b.o_totalprice").as("new_price"))
      .filter(col("op").isNotNull)
      .orderBy("o_orderkey")
  }

  /** Materialized-view rewrite end to end [N]: build the lineitem
    * summary (decimal partials — associative, so re-aggregation is
    * EXACT), then hand [[graft.rules.RewriteAggregateToSummary]] a
    * coarser aggregate over the FACT table and serve it from the
    * summary instead. The rule is applied directly to the analyzed
    * plan (the conf-gated in-optimizer path is exercised by RulesSpec)
    * and the key asserts the rewrite actually fired — the rewritten
    * plan must scan the summary path. The oracle aggregates the raw
    * fact table in DuckDB: hash equality proves summary-serving is
    * indistinguishable from the direct scan. */
  private def mvRewrite(s: SparkSession, d: String): DataFrame = {
    import graft.rules.RewriteAggregateToSummary._
    val mvPath = graft.Scratch.dir("mv_lineitem")
    val li = Tables.lineitem(s, d)
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as(SumQty),
        sum(col("l_extendedprice").cast("decimal(18,2)")).as(SumBase),
        count(lit(1)).as(Cnt))
      .write.mode("overwrite").parquet(mvPath)
    val naive = li
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).as("sum_base"),
        count(lit(1)).as("n"))
    s.conf.set(PathConf, mvPath)
    s.conf.set(SourceConf, s"$d/lineitem")
    val rewritten =
      try graft.rules.RewriteAggregateToSummary(naive.queryExecution.analyzed)
      finally { s.conf.unset(PathConf); s.conf.unset(SourceConf) }
    require(graft.rules.RewriteAggregateToSummary.servesFrom(rewritten, mvPath),
      "materialized-view rewrite did not fire")
    org.apache.spark.sql.GraftSqlBridge.ofRows(s, rewritten)
      .select(col("l_returnflag"),
        col("sum_qty").cast("double").as("sum_qty"),
        col("sum_base").cast("double").as("sum_base"), col("n"))
      .orderBy("l_returnflag")
  }

  /** Incremental maintenance OF the materialized summary [N]: the base
    * summary is built from the pre-cutoff fact rows only, the
    * post-cutoff rows arrive as a delta whose PARTIALS are unioned in
    * and re-aggregated — the mergeable-decimal contract means the
    * maintained summary is bit-identical to a from-scratch rebuild, so
    * serving a query from it (via the same
    * [[graft.rules.RewriteAggregateToSummary]] path as
    * [[mvRewrite]]) is indistinguishable from scanning the full fact
    * table — which is exactly what the oracle does. At 100 TB this is
    * the nightly pattern: the delta partial-agg touches only new data;
    * the union re-agg touches only the summary (group-domain-sized). */
  private def mvIncremental(s: SparkSession, d: String): DataFrame = {
    import graft.rules.RewriteAggregateToSummary._
    val mvPath = graft.Scratch.dir("mv_lineitem_inc")
    val li = Tables.lineitem(s, d)
    val cutoff = "1996-01-01"
    def partials(df: DataFrame): DataFrame = df
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as(SumQty),
        sum(col("l_extendedprice").cast("decimal(18,2)")).as(SumBase),
        count(lit(1)).as(Cnt))
    val base = partials(li.filter(col("l_shipdate") < lit(cutoff)))
    val delta = partials(li.filter(col("l_shipdate") >= lit(cutoff)))
    base.unionByName(delta)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col(SumQty)).cast("decimal(28,2)").as(SumQty),
        sum(col(SumBase)).cast("decimal(28,2)").as(SumBase),
        sum(col(Cnt)).as(Cnt))
      .write.mode("overwrite").parquet(mvPath)
    val naive = li
      .groupBy(col("l_linestatus"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty"),
        count(lit(1)).as("n"))
    s.conf.set(PathConf, mvPath)
    s.conf.set(SourceConf, s"$d/lineitem")
    val rewritten =
      try graft.rules.RewriteAggregateToSummary(naive.queryExecution.analyzed)
      finally { s.conf.unset(PathConf); s.conf.unset(SourceConf) }
    require(graft.rules.RewriteAggregateToSummary.servesFrom(rewritten, mvPath),
      "materialized-view rewrite did not fire on the maintained summary")
    org.apache.spark.sql.GraftSqlBridge.ofRows(s, rewritten)
      .select(col("l_linestatus"),
        col("sum_qty").cast("double").as("sum_qty"), col("n"))
      .orderBy("l_linestatus")
  }

  /** Crypto-shredding erasure [N] — the right-to-be-forgotten mechanism
    * for immutable lakes: sensitive values are stored AES-encrypted
    * under per-user keys held in a separate key table; erasing a user =
    * deleting one key row, after which their ciphertext is
    * unrecoverable everywhere (no rewrite of petabytes of history).
    * This key runs the full path with Spark's real cipher: derive
    * per-user keys, `aes_encrypt` each value, drop the keys of users ≡
    * 0 (mod 97), then `try_aes_decrypt` with the surviving key table —
    * erased users come back NULL, everyone else round-trips exactly.
    * The oracle states the CONTRACT (original value or NULL by the
    * erasure rule), so hash equality proves the cipher round-trip is
    * lossless AND the shredding is total. GCM's random IV makes the
    * ciphertext itself nondeterministic — only the decrypted contract
    * is comparable, which is exactly the point.
    *
    * Scale shape: one projection to encrypt (stateless, codegen'd),
    * one broadcast join against the user-domain key dim, one decrypt
    * projection. */
  private def cryptoShred(s: SparkSession, d: String): DataFrame = {
    val events = Tables.events(s, d)
      .filter(col("value").isNotNull)
      // decimal→string (not printf: Java %.2f rounds HALF_UP, C printf
      // half-even — the decimal render is identical in both engines)
      .select(col("event_id"), col("user_id"),
        col("value").cast("decimal(12,2)").cast("string").as("v_str"))
    val userKey = substring(sha2(col("user_id").cast("string"), 256), 1, 32)
    val encrypted = events
      .select(col("event_id"), col("user_id"),
        expr("aes_encrypt(v_str, substring(sha2(cast(user_id as string)," +
          " 256), 1, 32))").as("ct"))
    val keys = events.select(col("user_id")).distinct()
      .filter(col("user_id") % 97 =!= 0)
      .select(col("user_id"), userKey.as("k"))
    encrypted
      .join(broadcast(keys), Seq("user_id"), "left")
      .select(col("event_id"), col("user_id"),
        expr("cast(try_aes_decrypt(ct, k) as string)").as("recovered"))
      .orderBy("event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "quality_crypto_shred" -> cryptoShred,
    "agg_mv_incremental" -> mvIncremental,
    "agg_mv_rewrite" -> mvRewrite,
    "cdc_time_travel" -> cdcTimeTravel,
    "cdc_capture" -> cdcCapture,
    "agg_incremental" -> aggIncremental,
    "agg_incremental_cdc" -> aggIncrementalCdc,
    "sink_time_travel" -> sinkTimeTravel,
    "join_incremental" -> joinIncremental,
    "quality_checks" -> qualityChecks,
    "quality_table_checksum" -> tableChecksum,
    "scd2_intervals" -> scd2Intervals,
    "merge_upsert" -> mergeUpsert)

  val oracles: Map[String, String] = Map(
    // raw fact table again: base+delta maintenance then summary-serving
    // must be indistinguishable from the direct full scan
    "agg_mv_incremental" ->
      """SELECT l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_qty,
        |       count(*) AS n
        |FROM lineitem GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin,
    // the oracle reads the RAW fact table: equality proves the
    // summary-served answer indistinguishable from the direct scan
    "agg_mv_rewrite" ->
      """SELECT l_returnflag,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_base,
        |       count(*) AS n
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    // identical SQL to cdc_capture: the version-store round-trip must
    // reproduce the direct diff exactly
    "cdc_time_travel" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
        |prev AS (SELECT * FROM base WHERE o_orderkey % 11 <> 3),
        |curr AS (
        |  SELECT o_orderkey, o_custkey,
        |         CASE WHEN o_orderkey % 5 = 0
        |              THEN o_totalprice * CAST(1.05 AS DOUBLE)
        |              ELSE o_totalprice END AS o_totalprice
        |  FROM base WHERE o_orderkey % 7 <> 2),
        |log AS (
        |  SELECT coalesce(prev.o_orderkey, curr.o_orderkey) AS o_orderkey,
        |         CASE WHEN prev.o_custkey IS NULL THEN 'I'
        |              WHEN curr.o_custkey IS NULL THEN 'D'
        |              WHEN prev.o_totalprice <> curr.o_totalprice THEN 'U'
        |         END AS op,
        |         prev.o_totalprice AS old_price,
        |         curr.o_totalprice AS new_price
        |  FROM prev FULL OUTER JOIN curr
        |    ON prev.o_orderkey = curr.o_orderkey)
        |SELECT * FROM log WHERE op IS NOT NULL ORDER BY o_orderkey""".stripMargin,
    // from-scratch recompute over CURR — equality proves the changelog
    // fold (I adds, D subtracts, U adds the difference) maintains the
    // view exactly through updates and deletes
    "agg_incremental_cdc" ->
      """WITH curr AS (
        |  SELECT o_custkey,
        |         CASE WHEN o_orderkey % 5 = 0
        |              THEN CAST(o_totalprice AS DECIMAL(12,2))
        |                   * CAST(1.05 AS DECIMAL(3,2))
        |              ELSE CAST(CAST(o_totalprice AS DECIMAL(12,2))
        |                        AS DECIMAL(16,4)) END AS price
        |  FROM orders WHERE o_orderkey % 7 <> 2)
        |SELECT o_custkey, CAST(count(price) AS BIGINT) AS n,
        |       CAST(sum(price) AS DOUBLE) AS total
        |FROM curr GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "cdc_capture" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
        |prev AS (SELECT * FROM base WHERE o_orderkey % 11 <> 3),
        |curr AS (
        |  SELECT o_orderkey, o_custkey,
        |         CASE WHEN o_orderkey % 5 = 0
        |              THEN o_totalprice * CAST(1.05 AS DOUBLE)
        |              ELSE o_totalprice END AS o_totalprice
        |  FROM base WHERE o_orderkey % 7 <> 2),
        |log AS (
        |  SELECT coalesce(prev.o_orderkey, curr.o_orderkey) AS o_orderkey,
        |         CASE WHEN prev.o_custkey IS NULL THEN 'I'
        |              WHEN curr.o_custkey IS NULL THEN 'D'
        |              WHEN prev.o_totalprice <> curr.o_totalprice THEN 'U'
        |         END AS op,
        |         prev.o_totalprice AS old_price,
        |         curr.o_totalprice AS new_price
        |  FROM prev FULL OUTER JOIN curr
        |    ON prev.o_orderkey = curr.o_orderkey)
        |SELECT * FROM log WHERE op IS NOT NULL ORDER BY o_orderkey""".stripMargin,
    // both snapshots recomputed from the base tables: the hash check
    // proves the as-of file reads return exactly what was committed
    "sink_time_travel" ->
      """WITH v0 AS (
        |  SELECT c_custkey AS key, CAST(c_acctbal AS DECIMAL(12,2)) AS balance
        |  FROM customer),
        |upd AS (
        |  SELECT o_custkey, CAST(max(o_totalprice) AS DECIMAL(12,2)) AS nb
        |  FROM orders GROUP BY o_custkey),
        |v1 AS (
        |  SELECT coalesce(key, o_custkey) AS key, coalesce(nb, balance) AS balance
        |  FROM v0 FULL JOIN upd ON key = o_custkey)
        |SELECT CAST(0 AS INTEGER) AS version, CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(sum(balance) AS DOUBLE) AS total_balance FROM v0
        |UNION ALL
        |SELECT CAST(1 AS INTEGER), CAST(count(*) AS BIGINT),
        |       CAST(sum(balance) AS DOUBLE) FROM v1
        |ORDER BY version""".stripMargin,
    // full from-scratch join: equality is the delta-identity proof
    "join_incremental" ->
      """SELECT o_orderkey, o_custkey, c_mktsegment
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    // from-scratch recompute over the whole window the state+deltas
    // covered: equality proves the incremental fold is exact
    "agg_incremental" ->
      """SELECT o_custkey,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
        |       CAST(min(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS mn,
        |       CAST(max(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS mx
        |FROM orders
        |WHERE o_orderdate < TIMESTAMP '1999-04-01'
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin,
    // the oracle states the erasure CONTRACT; Spark runs the real AES
    // round-trip to meet it
    "quality_crypto_shred" ->
      """SELECT event_id, user_id,
        |       CASE WHEN user_id % 97 = 0 THEN NULL
        |            ELSE CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR)
        |       END AS recovered
        |FROM events WHERE value IS NOT NULL
        |ORDER BY event_id""".stripMargin,
    "quality_table_checksum" -> tableChecksumOracle,
    "quality_checks" ->
      """SELECT 'lineitem_qty_range' AS check_name,
        |       CAST(count(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END) AS BIGINT) AS n_violations
        |FROM lineitem
        |UNION ALL
        |SELECT 'lineitem_disc_range',
        |       CAST(count(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 END) AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 'lineitem_null_price',
        |       CAST(count(CASE WHEN l_extendedprice IS NULL THEN 1 END) AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 'orders_fk_customer', CAST(count(*) AS BIGINT)
        |FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
        |UNION ALL
        |SELECT 'orders_dup_pk', CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
        |FROM orders
        |ORDER BY check_name""".stripMargin,
    "scd2_intervals" ->
      """SELECT user_id, event_id, value,
        |       date_trunc('microseconds', ts) AS valid_from,
        |       coalesce(lead(date_trunc('microseconds', ts)) OVER w,
        |                TIMESTAMP '2200-01-01 00:00:00') AS valid_to,
        |       CAST(row_number() OVER w AS INTEGER) AS version,
        |       (lead(date_trunc('microseconds', ts)) OVER w IS NULL) AS is_current
        |FROM events WHERE value IS NOT NULL
        |WINDOW w AS (PARTITION BY user_id
        |             ORDER BY date_trunc('microseconds', ts), event_id)
        |ORDER BY user_id, version""".stripMargin,
    "merge_upsert" ->
      """WITH base AS (
        |  SELECT c_custkey AS key, c_acctbal AS balance
        |  FROM customer WHERE c_mktsegment <> 'BUILDING'),
        |updates AS (
        |  SELECT o_custkey AS ukey, max(o_totalprice) AS new_balance
        |  FROM orders GROUP BY 1)
        |SELECT coalesce(key, ukey) AS key,
        |       coalesce(new_balance, balance) AS balance,
        |       CASE WHEN key IS NULL THEN 'insert'
        |            WHEN ukey IS NULL THEN 'keep'
        |            ELSE 'update' END AS action
        |FROM base FULL OUTER JOIN updates ON key = ukey
        |ORDER BY key""".stripMargin)
}
