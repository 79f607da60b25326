package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 connector that REPORTS ITS PHYSICAL LAYOUT to Catalyst —
  * the two V2 contracts that kill whole shuffle stages at 100 TB and
  * that [[EntityApiSource]] (planning-time pushdown only) doesn't touch:
  *
  *  - STORAGE-PARTITIONED EXECUTION (`SupportsReportPartitioning` +
  *    `HasPartitionKey`): the scan declares one `InputPartition` per
  *    `cat` value with `KeyGroupedPartitioning(identity(cat))`, so with
  *    `spark.sql.sources.v2.bucketing.enabled=true` a join of two such
  *    tables on `cat` — and any `groupBy(cat)` above it — runs with ZERO
  *    exchanges: the Iceberg/Hive storage-partitioned-join shape where
  *    co-located terabytes never cross the wire (V2SourceSpec pins the
  *    shuffle-free plan);
  *  - RUNTIME FILTERING (`SupportsRuntimeFiltering`): a dimension-join
  *    predicate arrives DURING execution as an `In(cat, ...)` filter and
  *    prunes whole partitions before their readers open — dynamic
  *    partition pruning for V2 sources (the planning-time twin is
  *    `src_dpp_pruned` on parquet).
  *
  * The table itself is the repo's deterministic-fake discipline: rows
  * derive from the row index by pure integer arithmetic (Knuth
  * multiplicative hash mod a prime) that the DuckDB oracle reproduces
  * verbatim from `range(n)` — the CONNECTOR surface is real; only the
  * storage is synthetic. A real source would read one file set per
  * partition; here each reader walks the index range and keeps its
  * cat's rows, so correctness properties (disjoint coverage, stable
  * values) hold by construction.
  */
class PartitionedKvSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PartitionedKvSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val rows = Option(properties.get("rows")).map(_.toLong).getOrElse(
      sys.error("graft-partitioned-kv: the 'rows' option is required"))
    val cats = Option(properties.get("cats")).map(_.toInt).getOrElse(8)
    new PartitionedKvTable(rows, cats)
  }
}

object PartitionedKvSource {
  val schema: StructType = StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("cat", IntegerType, nullable = false),
    StructField("amt", LongType, nullable = false)))

  /** Knuth multiplicative hash mod prime — BIGINT-safe in both engines. */
  def keyFor(i: Long): Long = (i * 2654435761L) % 997L
  def catFor(i: Long, cats: Int): Int = (keyFor(i) % cats).toInt
  def amtFor(i: Long): Long = (i * 31L) % 9973L

  /** Last runtime-filter outcome (driver-side `Scan.filter` call):
    * (partitions planned, partitions surviving). Spec evidence only. */
  @volatile var lastRuntimePruned: Option[(Int, Int)] = None
}

class PartitionedKvTable(rows: Long, cats: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_partitioned_kv($rows rows, $cats cats)"
  override def schema(): StructType = PartitionedKvSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new PartitionedKvScan(rows, cats, (0 until cats).toArray)
}

class PartitionedKvScan(rows: Long, cats: Int, initialCats: Array[Int])
    extends Scan with Batch with SupportsReportPartitioning
    with SupportsRuntimeFiltering {
  private var activeCats: Array[Int] = initialCats

  override def readSchema(): StructType = PartitionedKvSource.schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    activeCats.sorted.map(c => KvCatPartition(rows, cats, c): InputPartition)
  override def createReaderFactory(): PartitionReaderFactory =
    new KvReaderFactory

  /** One partition per cat value, identity-clustered — what makes the
    * scan's output partitioning visible to EnsureRequirements. */
  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      Array(Expressions.identity("cat")), activeCats.length)

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("cat"))
  override def filter(filters: Array[Filter]): Unit = {
    val before = activeCats.length
    filters.foreach {
      case In("cat", vs) =>
        val keep = vs.collect { case i: Int => i }.toSet
        activeCats = activeCats.filter(keep)
      case EqualTo("cat", v: Int) => activeCats = activeCats.filter(_ == v)
      case _ => () // unsupported runtime filters are advisory — ignore
    }
    PartitionedKvSource.lastRuntimePruned = Some((before, activeCats.length))
  }

  override def description(): String =
    s"graft_partitioned_kv rows=$rows cats=$cats active=${activeCats.length}"
}

case class KvCatPartition(rows: Long, cats: Int, cat: Int)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(cat)
}

class KvReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[KvCatPartition]
    new PartitionReader[InternalRow] {
      private var i: Long = -1L
      override def next(): Boolean = {
        i += 1
        while (i < part.rows &&
               PartitionedKvSource.catFor(i, part.cats) != part.cat) i += 1
        i < part.rows
      }
      override def get(): InternalRow = InternalRow(
        PartitionedKvSource.keyFor(i), part.cat, PartitionedKvSource.amtFor(i))
      override def close(): Unit = ()
    }
  }
}
