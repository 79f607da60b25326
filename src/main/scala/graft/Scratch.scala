package graft

/** Per-process scratch namespace for the fixture-backed sink / source /
  * saved-index keys (VERDICT r11 #6). `dir(name)` is STABLE within one
  * JVM — keys that seed a store and serve it later in the same process
  * (ivf_saved's pinned index, the kv-catalog warehouse, the specs that
  * inspect what a key wrote) keep sharing state — but UNIQUE across
  * processes, so two concurrent sessions running the same key can no
  * longer overwrite each other's fixtures mid-query (the concurrency
  * caveat FIXTURES.md used to carry). Results are path-independent:
  * every consumer reaches the files through this accessor, never a
  * literal path.
  *
  * LOCAL-BY-CONTRACT: scratch is per-process FIXTURE state (the keys
  * that need durable, scheme-agnostic stores ride [[Hfs]] paths the
  * caller supplies — dedup band stores, HNSW epochs, snapshots).
  * Consumers deliberately use `java.io.File` on these paths (the exit
  * sweep below, spec listings, bucketed-table absolute paths) — do NOT
  * "fix" them onto Hadoop FS: with a non-local `fs.defaultFS` the right
  * behavior is to keep scratch on the LOCAL disk, not to follow the
  * default scheme onto an object store and pay remote round-trips for
  * per-process temp files. */
object Scratch {
  private val runId: String =
    java.util.UUID.randomUUID().toString.take(8)

  private lazy val root: String = {
    val r = s"target/tmp/run-$runId"
    // unique-per-process dirs would otherwise accumulate on a long-lived
    // box (the fixed paths they replaced overwrote in place) — sweep the
    // whole namespace when the process exits. Scratch state is by
    // definition not needed after the run; a killed JVM leaves the dir,
    // which the next `sbt clean` (target/) removes.
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(r))
    }))
    r
  }

  /** `target/tmp/run-<jvm-id>/<name>`. */
  def dir(name: String): String = s"$root/$name"
}
