package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** The bloom sink must actually WRITE split-block bloom filters — a
  * silently-ignored writer option would leave the key correct but the
  * 100 TB point-lookup story fake. Reads the written footers with the
  * parquet-hadoop API and asserts every row group carries a bloom
  * filter on the probe column. */
class BloomParquetSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("sink_bloom_scan: every row group has a bloom filter on l_suppkey") {
    val rows = SparkEntry.queries("sink_bloom_scan")(spark, TestSpark.sf001)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => Set(7L, 77L, 777L).contains(r.getAs[Long]("l_suppkey"))))
    val dir = new java.io.File(graft.Scratch.dir("lineitem_bloom"))
    val parts = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(parts.nonEmpty, "no parquet files written")
    parts.foreach { f =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f.getAbsolutePath), new Configuration()))
      try {
        val rgs = reader.getFooter.getBlocks.asScala
        assert(rgs.nonEmpty)
        rgs.foreach { rg =>
          val col = rg.getColumns.asScala
            .find(_.getPath.toDotString == "l_suppkey").get
          assert(col.getBloomFilterOffset >= 0,
            s"row group in ${f.getName} missing the l_suppkey bloom filter")
        }
      } finally reader.close()
    }
  }
}
