package graft.tools
object KeyDump extends App {
  graft.SparkEntry.queries.keySet.toSeq.sorted.foreach(println)
}
