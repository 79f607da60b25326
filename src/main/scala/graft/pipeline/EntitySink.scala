package graft.pipeline

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Exact per-entity JSON sink (SURVEY §2.A `sink_json_per_entity`,
  * VERDICT r2 gap #1/#2): the reference writes ONE literal
  * `data/<TICKER>.json` per entity with `json.dump(..., indent=2)`
  * (`fetch_data.py:312-314`) — a consumer fetches `data/AAPL.json` by
  * name, so a `partitionBy` directory-of-part-files layout 404s.
  *
  * This writer reproduces that contract byte-for-byte for the golden
  * corpus: Python's `indent=2` layout, `ensure_ascii` escaping, float
  * repr (`283637000000.0`, not `2.83637E11`), and int-typed fields
  * (`market_cap`) emitted without a decimal point.
  *
  * Scale posture: file-per-entity is the REFERENCE's contract (hundreds
  * of entities, served over static hosting). The writer runs
  * `foreachPartition` on the executors against the Hadoop FileSystem API,
  * so it distributes and works against HDFS/S3 paths — but at millions of
  * entities small-files pressure makes the partitioned/bucketed parquet
  * layouts (`ops/Scans.scala`) the right sink; this one exists for
  * fidelity with the reference's publishing shape.
  */
object EntitySink {

  /** Python `repr(float)` for the values JSON can carry: integral doubles
    * get a trailing `.0` (positional up to 1e16, like CPython), others use
    * the JVM's shortest-ish decimal with Python-style exponent spelling. */
  def pyFloatRepr(d: Double): String = {
    require(!d.isNaN && !d.isInfinite, "non-finite double is not valid JSON")
    if (d == 0.0 && 1 / d < 0) {
      "-0.0" // Python repr(-0.0) keeps the sign; BigDecimal would drop it
    } else if (d == math.rint(d) && math.abs(d) < 1e16) {
      BigDecimal(d).toBigInt.toString + ".0"
    } else {
      val s = java.lang.Double.toString(d)
      val e = s.indexOf('E')
      if (e < 0) s
      else {
        val exp = s.substring(e + 1).toInt
        if (exp >= 16 || exp < -4) {
          // Python uses scientific form only outside [1e-4, 1e16):
          // "1.6E17" -> "1.6e+17", "1.0E-5" -> "1e-05" (exponent padded
          // to two digits, bare ".0" mantissa dropped)
          val mantissa = s.substring(0, e).stripSuffix(".0")
          val sign = if (exp < 0) "-" else "+"
          f"${mantissa}e$sign${math.abs(exp)}%02d"
        } else {
          // Java flips to E-notation at 1e7; Python stays positional up
          // to 1e16. Re-expand the SAME digits positionally:
          // "2.6299723153140026E10" -> "26299723153.140026"
          new java.math.BigDecimal(s).stripTrailingZeros.toPlainString
        }
      }
    }
  }

  /** Python `json.dump(..., ensure_ascii=True)` string escaping: quote,
    * backslash, named control escapes, `\u00xx` for other controls, and
    * `\uxxxx` (lowercase hex) for DEL (0x7f) and every char at or above
    * 0x80 — CPython's encode_basestring_ascii escapes everything outside
    * the printable-ASCII band 0x20..0x7e, DEL included. */
  def jsonEscape(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case '\b' => b.append("\\b")
      case '\f' => b.append("\\f")
      case c if c < ' ' || c > '\u007e' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }

  /** One flat record rendered exactly as `json.dump(record, f, indent=2)`:
    * two-space indent, `"key": value`, no trailing newline. `intLike`
    * names double-typed columns whose source values are Python ints
    * (schema-on-read widened them) — integral values there print without
    * a decimal point. */
  def renderRecord(row: Row, schema: StructType, intLike: Set[String]): String =
    schema.fields.zipWithIndex.map { case (f, i) =>
      val v =
        if (row.isNullAt(i)) "null"
        else f.dataType match {
          case StringType => "\"" + jsonEscape(row.getString(i)) + "\""
          case LongType => row.getLong(i).toString
          case IntegerType => row.getInt(i).toString
          case BooleanType => row.getBoolean(i).toString
          case DoubleType =>
            val d = row.getDouble(i)
            if (intLike(f.name) && d == math.rint(d) && math.abs(d) < 1e16)
              BigDecimal(d).toBigInt.toString
            else pyFloatRepr(d)
          case other => throw new IllegalArgumentException(
            s"EntitySink renders flat records; unsupported type $other for ${f.name}")
        }
      "  \"" + jsonEscape(f.name) + "\": " + v
    }.mkString("{\n", ",\n", "\n}")

  /** Optional marker column: array<string> of double-typed field names
    * whose SOURCE token was a Python int for that row (json.dump writes
    * `0`, not `0.0`, for them). Schema-on-read widening loses int-ness;
    * this column carries it per row. Excluded from rendering. */
  val IntFieldsCol = "__int_fields"

  /** Write one `<outDir>/<name>.json` per row, distributed: rendering and
    * writing happen on the executors through the Hadoop FileSystem API
    * (works for file:/, hdfs:/, s3a:/ paths). Names must be flat — a
    * separator in an entity name would escape outDir. Rows carrying the
    * [[IntFieldsCol]] marker get those fields rendered int-style on top
    * of the static `intLike` set. */
  def writePerEntity(df: DataFrame, outDir: String, nameCol: String = "ticker",
                     intLike: Set[String] = Set("market_cap")): Unit = {
    // render columns first, marker (if any) last, so render indexes align
    val dataCols = df.columns.filter(_ != IntFieldsCol)
    val hasMarker = df.columns.contains(IntFieldsCol)
    val ordered =
      if (hasMarker)
        df.select((dataCols :+ IntFieldsCol)
          .map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
      else df
    val schema = StructType(ordered.schema.fields.filter(_.name != IntFieldsCol))
    val nameIdx = schema.fieldIndex(nameCol)
    val markerIdx = if (hasMarker) schema.length else -1
    ordered.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val conf = new Configuration()
        rows.foreach { row =>
          val name = row.getString(nameIdx)
          require(!name.contains('/') && !name.contains('\\') && name.nonEmpty,
            s"entity name must be a flat file name, got '$name'")
          val rowIntLike =
            if (markerIdx < 0 || row.isNullAt(markerIdx)) intLike
            else intLike ++ row.getSeq[String](markerIdx)
          val path = new Path(s"$outDir/$name.json")
          val fs = path.getFileSystem(conf)
          val out = fs.create(path, true)
          try out.write(renderRecord(row, schema, rowIntLike)
            .getBytes(StandardCharsets.UTF_8))
          finally out.close()
        }
      }
    }
  }
}
