package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PIT-correct training-set assembly: leak-freedom and split hygiene. */
class TrainingSetSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf001

  test("feat_training_set: features are strictly prior (no leakage)") {
    val ts = SparkEntry.queries("feat_training_set")(spark, sf)
    // independently recompute prior spend for a sample of examples via
    // a direct (slow) point query and compare
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        expr("cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)")
          .as("cts"))
    val sample = ts.orderBy("o_orderkey").limit(25)
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        "o_orderkey")
      .collect()
    sample.foreach { r =>
      val ck = r.getAs[Long]("o_custkey")
      val ok = r.getAs[Long]("o_orderkey")
      val asOf = r.getAs[Any]("o_orderdate")
      val prior = orders
        .filter(col("o_custkey") === ck &&
          (col("o_orderdate") < lit(asOf) ||
            (col("o_orderdate") === lit(asOf) && col("o_orderkey") < ok)))
        .agg(coalesce(sum(col("cts")), lit(0L)).as("s"),
          count(lit(1)).as("c")).collect().head
      assert(r.getAs[Long]("spend_prior") == prior.getLong(0),
        s"order $ok: leaked spend")
      assert(r.getAs[Long]("orders_prior") == prior.getLong(1),
        s"order $ok: leaked count")
    }
  }

  test("feat_training_set: no customer straddles splits; ratios ~80/10/10") {
    val ts = SparkEntry.queries("feat_training_set")(spark, sf)
    val straddlers = ts.groupBy("o_custkey")
      .agg(countDistinct(col("split")).as("k")).filter(col("k") > 1).count()
    assert(straddlers == 0, "entity-keyed split must not divide a customer")
    val bySplit = ts.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = bySplit.values.sum.toDouble
    assert(bySplit("train") / total > 0.7 && bySplit("train") / total < 0.9)
    assert(bySplit.keySet == Set("train", "valid", "test"))
  }

  test("feat_training_set: label is a genuinely future signal with both" +
    " classes present") {
    val ts = SparkEntry.queries("feat_training_set")(spark, sf)
    val byLabel = ts.groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byLabel.getOrElse(1, 0L) > 0 && byLabel.getOrElse(0, 0L) > 0)
  }
}
