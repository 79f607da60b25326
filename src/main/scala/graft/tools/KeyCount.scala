package graft.tools
object KeyCount extends App {
  val q = graft.SparkEntry.queries
  val o = graft.SparkEntry.oracleSql
  println("QUERIES=" + q.size + " ORACLES=" + o.size)
  println("ROWSONLY=" + (q.keySet -- o.keySet).toSeq.sorted.mkString(","))
  val orphan = o.keySet -- q.keySet
  if (orphan.nonEmpty) println("ORPHAN_ORACLES=" + orphan.mkString(","))
}
