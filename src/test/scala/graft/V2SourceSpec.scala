package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DataSourceV2 connector's three scale contracts, pinned at the
  * plan level: partition-per-entity planning, filter pushdown that
  * prunes partitions before any fetch, and column pruning that narrows
  * the reader's schema. */
class V2SourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def load() = spark.read
    .format("graft.sources.v2.EntityApiSource")
    .option("entities", "ALPHA,BRAVO,CHARLIE,DELTA,ECHO")
    .option("periods", "4")
    .load()

  test("one input partition per entity; pushed IN-filter prunes them") {
    assert(load().rdd.getNumPartitions == 5)
    val pruned = load().filter(col("entity").isin("ALPHA", "ECHO"))
    assert(pruned.rdd.getNumPartitions == 2,
      "IN filter must prune partitions at planning time")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(entity"),
      s"filter not pushed:\n$plan")
    // pushdown is exact, not advisory: only the two entities survive
    assert(pruned.select("entity").distinct().collect()
      .map(_.getString(0)).sorted.toSeq == Seq("ALPHA", "ECHO"))
    // equality pushdown too
    assert(load().filter(col("entity") === "BRAVO").rdd.getNumPartitions == 1)
  }

  test("column pruning reaches the reader's schema") {
    val qe = load().select(col("value")).queryExecution
    val plan = qe.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<value:double>"),
      s"reader schema not pruned:\n$plan")
    // the V2 scan node itself emits only the pruned column
    val scanOut = qe.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.output.map(_.name)
    }.flatten
    assert(scanOut == Seq("value"), s"scan output $scanOut")
  }

  test("json sink: staged per-partition files publish atomically on commit") {
    import java.nio.file.{Files, Paths}
    val dir = "target/tmp/v2_json_sink"
    val f = new java.io.File(dir)
    if (f.exists()) { f.listFiles().foreach(_.delete()); f.delete() }
    f.mkdirs()
    load().filter(col("entity").isin("ALPHA", "BRAVO"))
      .select(col("entity"), col("metric"), col("period"), col("value"))
      .repartition(2, col("entity"))
      .write.format("graft.sources.v2.JsonDirSink")
      .option("path", dir).mode("append").save()
    // staging gone, only published part files remain
    assert(!new java.io.File(dir, "_staging").exists(), "staging not cleaned")
    val parts = f.listFiles().filter(_.getName.endsWith(".json"))
    assert(parts.nonEmpty)
    val lines = parts.flatMap(p =>
      scala.jdk.CollectionConverters.ListHasAsScala(
        Files.readAllLines(Paths.get(p.getPath))).asScala)
    assert(lines.length == 2 * 3 * 4) // 2 entities x 3 metrics x 4 periods
    // the payload round-trips through a normal JSON read
    val back = spark.read.json(dir)
    assert(back.count() == 24)
    assert(back.select("entity").distinct().collect()
      .map(_.getString(0)).sorted.toSeq == Seq("ALPHA", "BRAVO"))
    val v = back.filter(col("entity") === "ALPHA" &&
        col("metric") === "eps" && col("period") === 3)
      .select("value").collect().head.getDouble(0)
    assert(v == graft.sources.v2.EntityApiSource.valueFor("ALPHA", 1, 3))
  }

  test("json sink escapes control chars and serializes non-finite doubles as null") {
    import java.nio.file.{Files, Paths}
    import spark.implicits._
    val dir = "target/tmp/v2_json_sink_esc"
    val f = new java.io.File(dir)
    if (f.exists()) { f.listFiles().foreach(_.delete()); f.delete() }
    f.mkdirs()
    val nasty = Seq(
      ("line\nbreak\ttab", 1.0),
      ("quote\"back\\slash", Double.NaN),
      ("bellctl", Double.PositiveInfinity))
      .toDF("s", "v")
    nasty.coalesce(1).write.format("graft.sources.v2.JsonDirSink")
      .option("path", dir).mode("append").save()
    val lines = f.listFiles().filter(_.getName.endsWith(".json")).flatMap(p =>
      scala.jdk.CollectionConverters.ListHasAsScala(
        Files.readAllLines(Paths.get(p.getPath))).asScala)
    // one-record-per-line framing survives embedded newlines
    assert(lines.length == 3, lines.mkString("|"))
    // every line is independently valid JSON (strict parser)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    lines.foreach(l => mapper.readTree(l))
    // and the values round-trip through a normal Spark JSON read
    val back = spark.read.json(dir)
    val got = back.select("s", "v").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got("line\nbreak\ttab") == Some(1.0))
    assert(got("quote\"back\\slash").isEmpty) // NaN became JSON null
    assert(got("bellctl").isEmpty) // Infinity became JSON null
  }

  test("json sink lifecycle holds through an explicit file:-scheme URI") {
    // the staging/publish/marker protocol must resolve through Hadoop's
    // FileSystem for WHATEVER scheme the path names (VERDICT r12 #1) —
    // an explicit file: URI takes the same code path an hdfs:// or
    // s3a:// warehouse would, unlike the bare relative paths above
    // (which the default local fs resolves before scheme handling)
    val local = new java.io.File("target/tmp/v2_json_sink_uri").getAbsoluteFile
    def sweep(d: java.io.File): Unit =
      Option(d.listFiles()).foreach(_.foreach { c =>
        if (c.isDirectory) sweep(c); c.delete()
      })
    sweep(local); local.mkdirs()
    val uri = "file:" + local.getPath
    load().filter(col("entity") === "ALPHA")
      .select(col("entity"), col("metric"), col("period"), col("value"))
      .write.format("graft.sources.v2.JsonDirSink")
      .option("path", uri).mode("append").save()
    assert(!new java.io.File(local, "_staging").exists(), "staging not cleaned")
    val back = spark.read.json(uri)
    assert(back.count() == 3 * 4) // metrics x periods, published atomically
    // fskv catalog through the same file:-scheme warehouse
    val ns = spark.newSession()
    val wh = new java.io.File("target/tmp/kv_cat_uri").getAbsoluteFile
    sweep(wh)
    ns.conf.set("spark.sql.catalog.u_cat", "graft.sources.v2.FsKvCatalog")
    ns.conf.set("spark.sql.catalog.u_cat.warehouse", "file:" + wh.getPath)
    ns.sql("DROP TABLE IF EXISTS u_cat.tu")
    ns.sql("CREATE TABLE u_cat.tu (k BIGINT, grp STRING) USING kv " +
      "PARTITIONED BY (grp)")
    ns.range(0, 20)
      .selectExpr("id AS k", "CASE WHEN id % 2 = 0 THEN 'e' ELSE 'o' END AS grp")
      .createOrReplaceTempView("src_uri")
    ns.sql("INSERT INTO u_cat.tu SELECT k, grp FROM src_uri")
    assert(ns.sql("SELECT count(*) FROM u_cat.tu").head.getLong(0) == 20)
    ns.sql("DELETE FROM u_cat.tu WHERE grp = 'e'")
    assert(ns.sql("SELECT k FROM u_cat.tu").collect()
      .map(_.getLong(0)).forall(_ % 2 == 1))
    assert(ns.sql("CALL u_cat.partition_stats('tu')").collect()
      .map(_.getString(0)).toSeq == Seq("grp=o"))
  }

  test("rows are the deterministic payload, complete per partition") {
    val rows = load().collect()
    assert(rows.length == 5 * 3 * 4) // entities x metrics x periods
    rows.foreach { r =>
      val mi = graft.sources.v2.EntityApiSource.metrics.indexOf(r.getString(1))
      assert(r.getDouble(3) ==
        graft.sources.v2.EntityApiSource.valueFor(r.getString(0), mi, r.getInt(2)))
    }
  }

  test("storage-partitioned join: join and aggs plan with no hash exchange") {
    val df = SparkEntry.queries("src_v2_spj")(spark, TestSpark.sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"SPJ join+agg must be exchange-free (both scans report " +
        s"KeyGroupedPartitioning and the agg rides the join):\n$plan")
    // the only allowed exchange is the output orderBy's range partitioning
    assert(plan.contains("BatchScan"), s"expected two V2 scans:\n$plan")
    assert(plan.contains("SortMergeJoin"), s"expected a co-located SMJ:\n$plan")
  }

  test("storage-partitioned join result == shuffled result (conf off)") {
    import graft.sources.v2.PartitionedKvSource
    def kv(rows: Int) = spark.read
      .format("graft.sources.v2.PartitionedKvSource")
      .option("rows", rows.toString).option("cats", "64").load()
    // parent session: v2 bucketing DISABLED -> plain shuffled join
    val b = kv(1000).select(col("cat").as("bcat"), col("amt").as("bamt"))
    val shuffled = kv(4000)
      .join(b, col("cat") === col("bcat"))
      .groupBy(col("cat"))
      .agg(count(lit(1)).as("n"), sum(col("amt") + col("bamt")).as("total"))
      .orderBy("cat").collect().toSeq
    val spj = SparkEntry.queries("src_v2_spj")(spark, TestSpark.sf0001)
      .collect().toSeq
    assert(spj == shuffled, "SPJ and shuffled plans must agree row-for-row")
    assert(PartitionedKvSource.keyFor(1L) == 2654435761L % 997L)
  }

  test("streaming json sink: per-epoch publish through writeStream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val dir = "target/tmp/v2_json_stream_sink"
    val f = new java.io.File(dir)
    def sweep(d: java.io.File): Unit = {
      Option(d.listFiles()).foreach(_.foreach { c =>
        if (c.isDirectory) sweep(c); c.delete()
      })
    }
    sweep(f); f.mkdirs()
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("id", "name").writeStream
      .format("graft.sources.v2.JsonDirSink")
      .option("path", dir)
      .option("checkpointLocation", s"$dir-ckpt")
      .outputMode("append").start()
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      mem.addData((3L, "c"))
      q.processAllAvailable()
    } finally q.stop()
    sweep(new java.io.File(s"$dir-ckpt"))
    val back = spark.read.json(s"$dir/epoch-*.json")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("name"))
    assert(back.toSet == Set(1L -> "a", 2L -> "b", 3L -> "c"))
    // per-epoch markers published, staging fully swept
    val names = new java.io.File(dir).list().toSeq
    assert(names.count(_.endsWith(".committed")) >= 2, names.toString)
    assert(!names.exists(_.startsWith("_staging")), names.toString)
  }

  test("streaming json sink: epoch commit is idempotent across replays") {
    import graft.sources.v2.{JsonDirStreamingWrite, JsonDirStreamingWriterFactory, JsonFileCommitted}
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types._
    val dir = "target/tmp/v2_json_epoch_replay"
    val f = new java.io.File(dir)
    Option(f.listFiles()).foreach(_.foreach(_.delete())); f.mkdirs()
    val schema = StructType(Seq(StructField("id", LongType)))
    val sink = new JsonDirStreamingWrite(dir, schema)
    def stageAndCommit(): Unit = {
      val w = new JsonDirStreamingWriterFactory(dir, schema, graft.Hfs.taskConf())
        .createWriter(0, 0, 7L)
      w.write(InternalRow(42L))
      val msg = w.commit().asInstanceOf[JsonFileCommitted]
      sink.commit(7L, Array(msg))
    }
    stageAndCommit()
    val published = f.list().filter(_.endsWith(".json")).toSeq
    assert(published.size == 1, published.toString)
    // the engine replays epoch 7 after a recovery: same work, re-commit
    stageAndCommit()
    assert(f.list().filter(_.endsWith(".json")).toSeq == published,
      "replayed epoch must publish nothing new")
    assert(f.list().count(_.startsWith("_staging")) == 0, "staging leaked")
  }

  test("streaming json sink: a commit that died half-published converges on replay") {
    import graft.sources.v2.{JsonDirStreamingWrite, JsonDirStreamingWriterFactory, JsonFileCommitted}
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types._
    val dir = "target/tmp/v2_json_half_publish"
    val f = new java.io.File(dir)
    def sweep(d: java.io.File): Unit =
      Option(d.listFiles()).foreach(_.foreach { c =>
        if (c.isDirectory) sweep(c); c.delete()
      })
    sweep(f); f.mkdirs()
    val schema = StructType(Seq(StructField("id", LongType)))
    val sink = new JsonDirStreamingWrite(dir, schema)
    def stage(): JsonFileCommitted = {
      val w = new JsonDirStreamingWriterFactory(dir, schema, graft.Hfs.taskConf())
        .createWriter(0, 0, 9L)
      w.write(InternalRow(7L))
      w.commit().asInstanceOf[JsonFileCommitted]
    }
    val msg = stage()
    // simulate a commit that moved this file then DIED before writing
    // the epoch marker: the published file exists, the marker does not
    graft.Hfs.replace(s"$dir/_staging-epoch-9/${msg.fileName}",
      s"$dir/${msg.fileName}")
    // recovery re-runs the epoch: tasks re-stage the same deterministic
    // file name; the commit must CONVERGE (replace-publish), not error
    // on the file the dead attempt already moved
    val msg2 = stage()
    sink.commit(9L, Array(msg2))
    assert(f.list().count(_.endsWith(".json")) == 1)
    assert(new java.io.File(dir, "_epoch-9.committed").exists())
    assert(f.list().count(_.startsWith("_staging")) == 0, "staging leaked")
  }

  test("fskv catalog: partition-grained DELETE drops only the targeted partition") {
    val ns = spark.newSession()
    ns.conf.set("spark.sql.catalog.t_cat", "graft.sources.v2.FsKvCatalog")
    ns.conf.set("spark.sql.catalog.t_cat.warehouse", "target/tmp/kv_cat_spec")
    ns.sql("DROP TABLE IF EXISTS t_cat.t")
    ns.sql("CREATE TABLE t_cat.t (k BIGINT, grp STRING) USING kv " +
      "PARTITIONED BY (grp)")
    ns.range(0, 100)
      .selectExpr("id AS k", "CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END AS grp")
      .createOrReplaceTempView("src_v")
    ns.sql("INSERT INTO t_cat.t SELECT k, grp FROM src_v")
    assert(ns.sql("SELECT count(*) FROM t_cat.t").head.getLong(0) == 100)
    ns.sql("DELETE FROM t_cat.t WHERE grp = 'even'")
    val left = ns.sql("SELECT k FROM t_cat.t").collect().map(_.getLong(0)).sorted
    assert(left.length == 50 && left.forall(_ % 2 == 1))
    // the partition dir itself is gone (metadata-scale delete)
    val dirs = Option(new java.io.File("target/tmp/kv_cat_spec/t").listFiles())
      .get.filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("grp=odd"), s"unexpected layout: $dirs")
  }

  test("fskv catalog: non-partition DELETE rewrites via copy-on-write, full DELETE truncates") {
    val ns = spark.newSession()
    ns.conf.set("spark.sql.catalog.t_cat", "graft.sources.v2.FsKvCatalog")
    ns.conf.set("spark.sql.catalog.t_cat.warehouse", "target/tmp/kv_cat_spec2")
    ns.sql("DROP TABLE IF EXISTS t_cat.t2")
    ns.sql("CREATE TABLE t_cat.t2 (k BIGINT, grp STRING) USING kv " +
      "PARTITIONED BY (grp)")
    ns.range(0, 10)
      .selectExpr("id AS k", "'only' AS grp").createOrReplaceTempView("src_v2")
    ns.sql("INSERT INTO t_cat.t2 SELECT k, grp FROM src_v2")
    // row-level predicate on a non-partition column: canDeleteWhere
    // refuses the metadata path, so Spark rewrites the affected groups
    // through SupportsRowLevelOperations (copy-on-write)
    ns.sql("DELETE FROM t_cat.t2 WHERE k = 3")
    val after = ns.sql("SELECT k FROM t_cat.t2").collect().map(_.getLong(0)).sorted
    assert(after.toSeq == (0L to 9L).filterNot(_ == 3L),
      s"copy-on-write delete wrong: ${after.toSeq}")
    ns.sql("DELETE FROM t_cat.t2")
    assert(ns.sql("SELECT count(*) FROM t_cat.t2").head.getLong(0) == 0)
  }

  test("fskv catalog: CALL partition_stats reports the layout; drop_partition result set") {
    val ns = spark.newSession()
    ns.conf.set("spark.sql.catalog.t_cat", "graft.sources.v2.FsKvCatalog")
    ns.conf.set("spark.sql.catalog.t_cat.warehouse", "target/tmp/kv_cat_spec3")
    ns.sql("DROP TABLE IF EXISTS t_cat.t3")
    ns.sql("CREATE TABLE t_cat.t3 (k BIGINT, grp STRING) USING kv " +
      "PARTITIONED BY (grp)")
    ns.range(0, 40)
      .selectExpr("id AS k", "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS grp")
      .createOrReplaceTempView("src_v3")
    ns.sql("INSERT INTO t_cat.t3 SELECT k, grp FROM src_v3")
    val stats = ns.sql("CALL t_cat.partition_stats('t3')").collect()
    assert(stats.map(_.getString(0)).sorted.toSeq == Seq("grp=a", "grp=b"))
    assert(stats.forall(r => r.getInt(1) >= 1 && r.getLong(2) > 0))
    val dropped = ns.sql("CALL t_cat.drop_partition('t3', 'a')").collect()
    assert(dropped.map(r => (r.getString(0), r.getBoolean(1))).toSeq ==
      Seq(("a", true)))
    // dropping a missing partition reports dropped=false, no error
    val again = ns.sql("CALL t_cat.drop_partition('t3', 'a')").collect()
    assert(again.head.getBoolean(1) == false)
    assert(ns.sql("SELECT count(*) FROM t_cat.t3").head.getLong(0) == 20)
  }

  test("fskv catalog: partition filter prunes dirs at planning; _partition from layout") {
    val ns = spark.newSession()
    ns.conf.set("spark.sql.catalog.t_cat", "graft.sources.v2.FsKvCatalog")
    ns.conf.set("spark.sql.catalog.t_cat.warehouse", "target/tmp/kv_cat_spec4")
    ns.sql("DROP TABLE IF EXISTS t_cat.t4")
    ns.sql("CREATE TABLE t_cat.t4 (k BIGINT, grp STRING) USING kv " +
      "PARTITIONED BY (grp)")
    ns.range(0, 90)
      .selectExpr("id AS k", "CASE id % 3 WHEN 0 THEN 'a' WHEN 1 THEN 'b' ELSE 'c' END AS grp")
      .createOrReplaceTempView("src_v4")
    ns.sql("INSERT INTO t_cat.t4 SELECT k, grp FROM src_v4")
    val all = ns.sql("SELECT k FROM t_cat.t4")
    val pruned = ns.sql("SELECT k, _partition FROM t_cat.t4 WHERE grp = 'b'")
    assert(pruned.rdd.getNumPartitions < all.rdd.getNumPartitions,
      "partition equality must prune input partitions at planning time")
    val rows = pruned.collect()
    assert(rows.map(_.getLong(0)).forall(_ % 3 == 1))
    assert(rows.map(_.getString(1)).distinct.toSeq == Seq("grp=b"),
      "_partition must come from the directory layout")
  }

  test("runtime filtering: dimension predicate prunes fact partitions in-flight") {
    import graft.sources.v2.PartitionedKvSource
    PartitionedKvSource.lastRuntimePruned = None
    val rows = SparkEntry.queries("src_v2_runtime_filter")(
      spark, TestSpark.sf0001).collect()
    // region-0 nations are keys {0,5,10,15,20}; cats span 0..15
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 5, 10, 15))
    PartitionedKvSource.lastRuntimePruned match {
      case Some((before, after)) =>
        assert(before == 16 && after == 4,
          s"expected 16 planned -> 4 surviving partitions, got $before -> $after")
      case None =>
        fail("Scan.filter was never invoked — runtime filtering did not fire")
    }
  }
}
