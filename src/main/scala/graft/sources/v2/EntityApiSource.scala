package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 connector for the reference's ingest boundary
  * (`fetch_data.py:134-140`: one HTTP fetch per entity) — the LAST Spark
  * extension point this engine hadn't exercised (alongside Expression /
  * TypedImperativeAggregate / LogicalPlan+Strategy+SparkPlan / Rule /
  * TVF / SessionExtensions). The connector owns the three contracts a
  * remote source needs at 100 TB:
  *
  *  - PARTITION PLANNING: one `InputPartition` per entity — each task
  *    fetches exactly one entity, the cluster parallelizes the fetch
  *    fan-out (never a driver-side loop);
  *  - FILTER PUSHDOWN: `entity = v` / `entity IN (...)` predicates
  *    prune whole partitions at PLANNING time — unfetched entities cost
  *    zero HTTP calls, visible as `PushedFilters` in the plan;
  *  - COLUMN PRUNING: `pruneColumns` narrows the reader's emitted
  *    schema, visible as `ReadSchema` in the plan.
  *
  * The "API" itself is the repo's deterministic-fake discipline (same as
  * the multimodal codec stubs): values derive from (entity, metric,
  * period) by pure integer arithmetic that the DuckDB oracle reproduces
  * verbatim — the CONNECTOR surface is real and fully tested, only the
  * HTTP call is synthetic (this container has no egress).
  */
class EntityApiSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EntityApiSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val entities = Option(properties.get("entities")).getOrElse(
      sys.error("graft-entity-api: the 'entities' option is required"))
    val periods = Option(properties.get("periods")).map(_.toInt).getOrElse(8)
    new EntityApiTable(entities.split(",").toSeq.map(_.trim).filter(_.nonEmpty),
      periods)
  }
}

object EntityApiSource {
  val schema: StructType = StructType(Seq(
    StructField("entity", StringType, nullable = false),
    StructField("metric", StringType, nullable = false),
    StructField("period", IntegerType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  val metrics: Seq[String] = Seq("revenue", "eps", "assets")

  /** Deterministic fetch payload — integer arithmetic mirrored verbatim
    * by the oracle SQL, then one exact IEEE divide. */
  def valueFor(entity: String, metricIdx: Int, period: Int): Double =
    ((period * 37 + entity.head.toInt * 13 + entity.length * 11 +
      metricIdx * 101) % 1000) / 10.0
}

class EntityApiTable(entities: Seq[String], periods: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_entity_api(${entities.size} entities)"
  override def schema(): StructType = EntityApiSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EntityApiScanBuilder(entities, periods)
}

class EntityApiScanBuilder(allEntities: Seq[String], periods: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {
  private var entities: Seq[String] = allEntities
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = EntityApiSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, residual) = filters.partition {
      case EqualTo("entity", _: String) => true
      case In("entity", vs) => vs.forall(_.isInstanceOf[String])
      case _ => false
    }
    supported.foreach {
      case EqualTo("entity", v: String) => entities = entities.filter(_ == v)
      case In("entity", vs) =>
        val keep = vs.collect { case s: String => s }.toSet
        entities = entities.filter(keep)
      case _ => ()
    }
    pushed = supported
    residual // fully handled filters need no re-evaluation by Spark
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new EntityApiScan(entities, periods, required, pushed.map(_.toString))
}

class EntityApiScan(entities: Seq[String], periods: Int, required: StructType,
                    pushedDesc: Array[String] = Array.empty)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    entities.map(e => EntityPartition(e): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new EntityReaderFactory(periods, required)
  override def description(): String =
    s"graft_entity_api entities=${entities.mkString(",")} periods=$periods " +
      s"PushedFilters: [${pushedDesc.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}"
}

case class EntityPartition(entity: String) extends InputPartition

class EntityReaderFactory(periods: Int, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val entity = p.asInstanceOf[EntityPartition].entity
    new PartitionReader[InternalRow] {
      private val rows = (for {
        mi <- EntityApiSource.metrics.indices.iterator
        per <- (1 to periods).iterator
      } yield (mi, per))
      private var current: (Int, Int) = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow = {
        val (mi, per) = current
        InternalRow.fromSeq(required.fields.toSeq.map(_.name match {
          case "entity" => UTF8String.fromString(entity)
          case "metric" => UTF8String.fromString(EntityApiSource.metrics(mi))
          case "period" => per
          case "value" => EntityApiSource.valueFor(entity, mi, per)
        }))
      }
      override def close(): Unit = ()
    }
  }
}
