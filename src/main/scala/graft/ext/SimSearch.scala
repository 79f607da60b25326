package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Ckpt.CutOps
import graft.Tables
import graft.functions.VectorFunctions

/** SURVEY.md §2.K — similarity search over `embeddings.embedding`
  * (array<float>, 64-dim).
  *
  * Cosine/dot are native codegen'd Catalyst expressions
  * ([[graft.functions.DotProduct]]/[[graft.functions.CosineSimilarity]])
  * with the same sequential double accumulation as the HOF reference
  * formulation and the DuckDB oracle's parallel-unnest sum — all three
  * bit-identical (equivalence-tested in VectorFunctionsSpec).
  *
  * Scale path: brute force is the correctness baseline (fine when one side
  * is a broadcast probe set); `sim_search_ivf` shows the 100 TB shape —
  * deterministic random-hyperplane LSH bucketing so the candidate join is
  * an equi-join on bucket id instead of a cross join.
  */
object SimSearch extends graft.QueryModule {

  /** dot(a, b), HOF formulation — interpreted (ArrayAggregate is
    * CodegenFallback); kept as the reference implementation that
    * `graft.functions.DotProduct` is equivalence-tested against. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** dot(a, b): native codegen'd expression, same sequential double
    * accumulation (bit-identical to dotHof and the DuckDB oracle). */
  def dot(a: Column, b: Column): Column = VectorFunctions.dot_product(a, b)

  /** cosine(a, b) = dot/(sqrt(dot(a,a))*sqrt(dot(b,b))) in one native
    * pass — shape mirrored exactly in the oracle SQL so doubles match
    * bitwise. */
  def cosine(a: Column, b: Column): Column =
    VectorFunctions.cosine_similarity(a, b)

  /** Near-dup pairs by embedding cosine within a label block (blocked
    * all-pairs: the equi-join on `label` bounds the quadratic term).
    * Norms are computed ONCE per vector before the pair join — one dot
    * product per pair instead of three; the cosine formula stays
    * `dot/(sqrt(na)*sqrt(nb))` so doubles still match the oracle bitwise. */
  private def embCosinePairs(s: SparkSession, d: String): DataFrame = {
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("label"),
      col("embedding"), dot(col("embedding"), col("embedding")).as("nsq"))
    val cos = dot(col("a.embedding"), col("b.embedding")) /
      (sqrt(col("a.nsq")) * sqrt(col("b.nsq")))
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"), cos.as("cosine"))
      .filter(col("cosine") >= 0.45)
      .orderBy("i", "j")
  }

  /** k-NN graph construction [N] (k = 3) over the embedding corpus —
    * the backbone of semantic-dedup clustering and graph-based ANN
    * (HNSW's layer-0 is exactly this): per vector, its 3 nearest
    * same-label neighbors by exact cosine. The label equi-join bounds
    * the quadratic term to block size (the `dedup_embedding_cosine`
    * blocking discipline); at 100 TB blocks are the coarse-quantizer
    * cells and each block's pair scan is independent. Norms computed
    * once per vector; per-source top-k is a rank window inside the
    * block (TakeOrdered class). Cosine doubles are bit-identical to
    * the oracle (`cosine = dot/(√na·√nb)`, mirrored shape). */
  private def knnGraph(s: SparkSession, d: String): DataFrame = {
    VectorFunctions.register(s)
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("label"),
      col("embedding"), dot(col("embedding"), col("embedding")).as("nsq"))
    val cos = dot(col("a.embedding"), col("b.embedding")) /
      (sqrt(col("a.nsq")) * sqrt(col("b.nsq")))
    val w = Window.partitionBy(col("i")).orderBy(col("cosine").desc, col("j"))
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"), cos.as("cosine"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("i"), col("rnk"), col("j"), col("cosine"))
      .orderBy("i", "rnk")
  }

  /** Graph-based ANN serving [N] (r10, VERDICT #5) — deterministic
    * greedy BEAM search over the k-NN graph (the HNSW layer-0 shape:
    * Malkov-Yashunin 2016's base layer is exactly a degree-bounded
    * proximity graph walked best-first), completing the ANN taxonomy:
    * LSH (`sim_search_ivf`), IVF (`_ivf_kmeans` family), PQ (`_pq`),
    * graph (this). Pinned like the IVF family so it hash-matches an
    * unrolled-CTE oracle:
    *
    *  - graph: within-label k-NN edges (the `emb_knn_graph` build
    *    shape — at 100 TB the blocks are coarse-quantizer cells and the
    *    build is one blocked pair scan, built ONCE and reused across
    *    probes), made UNDIRECTED then re-capped at 2×[[GraphAnnDegree]]
    *    by descending cosine — the HNSW discipline: a directed k-NN
    *    graph is not navigable (a walk entering a locally-clustered
    *    region cannot leave through in-edges; measured recall@10 stuck
    *    at 0.4 however long the walk), while symmetrized edges with a
    *    degree cap keep both navigability and the per-node work bound;
    *  - entries: the min vec_id per label (bounded label domain) — one
    *    entry per block, so search reaches every component of the
    *    label-blocked graph;
    *  - [[GraphAnnSteps]] beam rounds: frontier = unvisited
    *    out-neighbors of the current beam; score frontier by exact
    *    cosine to the probe; beam = global top-[[GraphAnnBeam]] of ALL
    *    visited (best-first, total order (cosine DESC, vec_id));
    *  - answer: exact top-10 of the visited set.
    *
    * Work per probe is bounded: |entries| + steps × beam × 2·degree
    * scored vectors (~730 ceiling here) regardless of corpus size — the
    * whole point of graph ANN; every stage is an equi-join on vec_id or
    * a bounded top-k. Recall is data-dependent in a way the bucketed
    * families are not: graph walks exploit neighbor-of-neighbor
    * correlation, so on the synthetic ISOTROPIC embeddings (exact
    * top-10 spans 8 of 10 labels, max cosine 0.37) recall@10 saturates
    * at 0.4 however the walk is sized — SimSearchRecallSpec pins that
    * measured floor on sf0.01 AND proves navigability (recall 1.0 with
    * the same code path) on deterministic CLUSTERED vectors, the
    * workload graph ANN exists for. Correctness (the walk itself, step
    * by step) is the oracle's. */
  private val GraphAnnDegree = 6
  private val GraphAnnBeam = 10
  private val GraphAnnSteps = 6

  /** Serving-time quality knobs (r13, VERDICT #3) — ef-style beam width
    * and walk depth, THE standard graph-ANN recall/latency dial (HNSW
    * '16 calls it efSearch): a production user rejects a fixed
    * recall point, and widening the query-time beam trades latency for
    * recall without touching the persisted index. Read by the SERVED
    * keys only (the in-query build keys stay at the pinned defaults so
    * every oracle — which unrolls exactly [[GraphAnnBeam]] /
    * [[GraphAnnSteps]] rounds — stays hash-exact). Measured curve in
    * PERF.md r13; SimSearchRecallSpec pins recall monotone
    * non-decreasing in the beam. */
  private val BeamWidthConf = "spark.graft.ann.beamWidth"
  private val StepsConf = "spark.graft.ann.steps"
  private def servingBeam(s: SparkSession): Int =
    s.conf.getOption(BeamWidthConf).map(_.toInt).getOrElse(GraphAnnBeam)
  private def servingSteps(s: SparkSession): Int =
    s.conf.getOption(StepsConf).map(_.toInt).getOrElse(GraphAnnSteps)

  /** The IVF leg's serving dial (same r13 rule): probed-cell count at
    * query time, read by the saved-index serving key. Default 4 keeps
    * the `sim_search_ivf_saved` oracle (which unrolls 4 cells) green. */
  private val NprobeConf = "spark.graft.ann.nprobe"
  private def servingNprobe(s: SparkSession): Int =
    s.conf.getOption(NprobeConf).map(_.toInt).getOrElse(4)

  private def withNsq(corpusIn: DataFrame): DataFrame =
    corpusIn.select(col("vec_id"), col("label"), col("embedding"),
      dot(col("embedding"), col("embedding")).as("nsq"))

  /** Directed within-label k-NN edges `(i, j, cosine)` — the raw edge
    * lists before symmetrization. The scorer relation `rhs` is
    * parameterized so the APPEND variant can rank delta nodes against
    * base ∪ delta while base nodes keep their saved base-only lists. */
  private def knnEdges(lhs: DataFrame, rhs: DataFrame, degree: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cosPair = dot(col("a.embedding"), col("b.embedding")) /
      (sqrt(col("a.nsq")) * sqrt(col("b.nsq")))
    val w = Window.partitionBy(col("i")).orderBy(col("cosine").desc, col("j"))
    lhs.as("a").join(rhs.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"), cosPair.as("cosine"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= degree)
      .select(col("i"), col("j"), col("cosine"))
  }

  /** Symmetrize (mutual edges collapse — cosine is symmetric), then
    * re-cap out-degree at 2×degree so frontier work stays bounded. */
  private def symCap(knn: DataFrame, degree: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("i")).orderBy(col("cosine").desc, col("j"))
    knn
      .union(knn.select(col("j").as("i"), col("i").as("j"), col("cosine")))
      .distinct()
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 2 * degree)
      .select(col("i"), col("j"))
  }

  /** One entry point per label block: min vec_id per label (the r10
    * entry rule for the label-blocked graph legs). */
  private def labelEntries(corpus: DataFrame): DataFrame =
    corpus.groupBy(col("label")).agg(min(col("vec_id")).as("vec_id"))
      .select("vec_id")

  /** The beam walk over a PREBUILT undirected edge set, from an
    * explicit `entries (vec_id)` relation — parameterized (r11) so the
    * label-free bucketed build can enter from per-LSH-bucket minima
    * while the label-blocked legs keep [[labelEntries]]. */
  /** The walk's full VISITED set — every (vec_id, cosine) the walk ever
    * scored. Split out of [[beamWalk]] so the cost probe
    * ([[serveHnswScoredCount]]) can COUNT the scored candidates of the
    * exact serving plan instead of estimating them (r13 VERDICT #4: the
    * ef trade is two-sided; recall curves need a price axis). */
  private def beamWalkVisited(corpus: DataFrame, graphEdges: DataFrame,
                              entries: DataFrame,
                              probeIn: DataFrame, beamW: Int,
                              steps: Int): DataFrame = {
    val probe = probeIn.select(col("embedding").as("probe"),
      dot(col("embedding"), col("embedding")).as("pnsq"))
    val graph = graphEdges.cut() // built once; rounds iterate
    def scored(ids: DataFrame): DataFrame =
      ids.join(corpus, Seq("vec_id"))
        .crossJoin(broadcast(probe))
        .select(col("vec_id"),
          (dot(col("embedding"), col("probe")) /
            (sqrt(col("nsq")) * sqrt(col("pnsq")))).as("cosine"))
    var visited = scored(entries).cut()
    for (_ <- 1 to steps) {
      val beam = visited.orderBy(col("cosine").desc, col("vec_id")).limit(beamW)
      val frontier = beam.select(col("vec_id").as("i"))
        .join(graph, Seq("i")).select(col("j").as("vec_id"))
        .except(visited.select(col("vec_id")))
      visited = visited.union(scored(frontier)).cut()
    }
    visited
  }

  private def beamWalk(corpus: DataFrame, graphEdges: DataFrame,
                       entries: DataFrame,
                       probeIn: DataFrame, beamW: Int, steps: Int,
                       k: Int): DataFrame =
    beamWalkVisited(corpus, graphEdges, entries, probeIn, beamW, steps)
      .orderBy(col("cosine").desc, col("vec_id")).limit(k)

  /** The walk itself, over any `(vec_id, label, embedding)` corpus and
    * 1-row `(embedding)` probe — public so the recall spec can drive
    * the IDENTICAL code path over structured (clustered) vectors. */
  def graphBeamSearch(corpusIn: DataFrame, probeIn: DataFrame,
                      degree: Int, beamW: Int, steps: Int, k: Int): DataFrame = {
    val corpus = withNsq(corpusIn).cut()
    beamWalk(corpus, symCap(knnEdges(corpus, corpus, degree), degree),
      labelEntries(corpus), probeIn, beamW, steps, k)
  }

  private def knnGraphSearch(s: SparkSession, d: String): DataFrame = {
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d)
    graphBeamSearch(
      e.filter(col("vec_id") =!= 0),
      e.filter(col("vec_id") === 0).select(col("embedding")),
      GraphAnnDegree, GraphAnnBeam, GraphAnnSteps, k = 10)
  }

  /** Generated oracle for [[knnGraphSearch]]: the degree-[[GraphAnnDegree]]
    * graph CTE (emb_knn_graph's shape), the per-label entry points, and
    * the [[GraphAnnSteps]] beam rounds unrolled — each round's
    * beam/frontier/visited as its own CTE chain, every tie broken by
    * (cosine DESC, vec_id). */
  private def knnGraphSearchOracle: String = {
    // directed degree-capped lists over the full corpus: one score CTE
    val prefix =
      s"""s AS (
         |  SELECT a.vec_id AS i, b.vec_id AS j,
         |         ${dotSql.format("a.embedding", "b.embedding")} AS d,
         |         ${dotSql.format("a.embedding", "a.embedding")} AS na,
         |         ${dotSql.format("b.embedding", "b.embedding")} AS nb
         |  FROM embeddings a JOIN embeddings b
         |    ON a.label = b.label AND a.vec_id <> b.vec_id
         |  WHERE a.vec_id <> 0 AND b.vec_id <> 0),
         |gk AS (
         |  SELECT i, j, c FROM (
         |    SELECT i, j, d / (sqrt(na) * sqrt(nb)) AS c,
         |           row_number() OVER (PARTITION BY i
         |      ORDER BY d / (sqrt(na) * sqrt(nb)) DESC, j) AS rnk
         |    FROM s) WHERE rnk <= $GraphAnnDegree)""".stripMargin
    beamSearchOracle(prefix)
  }

  /** The unrolled beam-walk CTE chain, name-suffixed so one statement
    * can hold several walks (the HNSW descent): symmetrize + cap a
    * `$gkName (i, j, c)` CTE the caller provides, entry points from
    * `entSql`, then `steps` beam rounds over `corpusRel`. The shared
    * probe CTE `p` is emitted only when `emitProbe` (exactly once per
    * statement). */
  private def walkCtes(sfx: String, corpusRel: String, gkName: String,
                       entSql: String, steps: Int,
                       emitProbe: Boolean): String = {
    val cos = (rel: String) =>
      s"""${dotSql.format(s"$rel.embedding", "p.pe")}
         |        / (sqrt(${dotSql.format(s"$rel.embedding", s"$rel.embedding")})
         |           * sqrt(p.np))""".stripMargin
    // every multiply-referenced CTE is MATERIALIZED: each round reads
    // v_{t-1} three times (beam, NOT-IN, carry-forward), so an inlining
    // planner re-evaluates the whole chain ~3^steps times — at 6 rounds
    // that turned a sub-second walk into a 30+ GB runaway before the hint
    val rounds = (1 to steps).map { t =>
      s"""b${t - 1}$sfx AS MATERIALIZED (
         |  SELECT vec_id FROM v${t - 1}$sfx
         |  ORDER BY cosine DESC, vec_id LIMIT $GraphAnnBeam),
         |f$t$sfx AS MATERIALIZED (
         |  SELECT DISTINCT g$sfx.j AS vec_id
         |  FROM b${t - 1}$sfx JOIN g$sfx ON g$sfx.i = b${t - 1}$sfx.vec_id
         |  WHERE g$sfx.j NOT IN (SELECT vec_id FROM v${t - 1}$sfx)),
         |v$t$sfx AS MATERIALIZED (
         |  SELECT * FROM v${t - 1}$sfx
         |  UNION ALL
         |  SELECT c.vec_id, ${cos("c")} AS cosine
         |  FROM $corpusRel c JOIN f$t$sfx ON c.vec_id = f$t$sfx.vec_id, p)""".stripMargin
    }.mkString(",\n")
    val probeCte = if (!emitProbe) "" else
      s"""p AS (
         |  SELECT embedding AS pe,
         |         ${dotSql.format("embedding", "embedding")} AS np
         |  FROM embeddings WHERE vec_id = 0),
         |""".stripMargin
    s"""gu$sfx AS (
       |  SELECT DISTINCT i, j, c FROM (
       |    SELECT i, j, c FROM $gkName
       |    UNION ALL SELECT j AS i, i AS j, c FROM $gkName)),
       |g$sfx AS (
       |  SELECT i, j FROM (
       |    SELECT i, j, row_number() OVER (PARTITION BY i
       |      ORDER BY c DESC, j) AS rnk
       |    FROM gu$sfx) WHERE rnk <= ${2 * GraphAnnDegree}),
       |${probeCte}ent$sfx AS (
       |  $entSql),
       |v0$sfx AS (
       |  SELECT c.vec_id, ${cos("c")} AS cosine
       |  FROM $corpusRel c JOIN ent$sfx ON c.vec_id = ent$sfx.vec_id, p),
       |$rounds""".stripMargin
  }

  /** The walk tail shared by the single-walk graph-ANN oracles: a
    * `gk (i, j, c)` CTE the caller provides, the entry points
    * (`entSql`, default = the per-label minima of the label-blocked
    * legs), [[GraphAnnSteps]] unrolled beam rounds, exact top-10. */
  private def beamSearchOracle(gkPrefix: String,
      entSql: String =
        """SELECT min(vec_id) AS vec_id FROM embeddings
          |  WHERE vec_id <> 0 GROUP BY label""".stripMargin): String =
    s"""WITH $gkPrefix,
       |${walkCtes("", "embeddings", "gk", entSql, GraphAnnSteps, emitProbe = true)}
       |SELECT vec_id, cosine FROM v$GraphAnnSteps
       |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin

  /** Graph-ANN index APPEND [N] (r10) — the graph analogue of
    * `sim_search_ivf_append`, completing the graph leg of the index
    * lifecycle (build → search → APPEND → serve): the even-id half of
    * the corpus is the SAVED graph (its directed k-NN edge lists persist
    * as parquet and are read back, never recomputed), and the odd-id
    * delta inserts by ranking each new node against base ∪ delta — the
    * HNSW insertion rule in batch form. Symmetrization then gives saved
    * nodes their back-edges from the delta (how HNSW wires reverse
    * links) and the shared 2×degree cap re-applies. Append cost is
    * O(delta × per-label candidates) — the historical corpus is scanned
    * only as the ranking side of the delta's equi-join, never re-banded.
    * NOTE: append ≠ rebuild (saved base-base lists never re-rank against
    * delta nodes — the price of not rebuilding), so the oracle mirrors
    * the DECOMPOSED construction, not a full rebuild. */
  private def knnGraphAppend(s: SparkSession, d: String): DataFrame = {
    VectorFunctions.register(s)
    val e = withNsq(Tables.embeddings(s, d).filter(col("vec_id") =!= 0))
      .cut()
    val base = e.filter(col("vec_id") % 2 === 0)
    val delta = e.filter(col("vec_id") % 2 === 1)
    // per-run temp dir (r11): results are path-independent; a fixed path
    // raced when two sessions ran the key concurrently (FIXTURES.md)
    val dir = graft.Scratch.dir(s"knn_graph_index-${java.util.UUID.randomUUID()}")
    knnEdges(base, base, GraphAnnDegree)
      .write.mode("overwrite").parquet(dir)
    val saved = s.read.parquet(dir)
    val merged = symCap(saved.union(knnEdges(delta, e, GraphAnnDegree)),
      GraphAnnDegree)
    beamWalk(e, merged, labelEntries(e),
      Tables.embeddings(s, d).filter(col("vec_id") === 0).select(col("embedding")),
      GraphAnnBeam, GraphAnnSteps, k = 10)
  }

  /** Oracle for [[knnGraphAppend]]: the decomposed edge construction
    * (base×base lists ∪ delta×all lists) feeding the same symmetrize /
    * cap / walk tail as `sim_search_knn_graph`. */
  private def knnGraphAppendOracle: String = {
    def scoreCte(name: String, lhsPred: String, rhsPred: String): String =
      s"""$name AS (
         |  SELECT a.vec_id AS i, b.vec_id AS j,
         |         ${dotSql.format("a.embedding", "b.embedding")} AS d,
         |         ${dotSql.format("a.embedding", "a.embedding")} AS na,
         |         ${dotSql.format("b.embedding", "b.embedding")} AS nb
         |  FROM embeddings a JOIN embeddings b
         |    ON a.label = b.label AND a.vec_id <> b.vec_id
         |  WHERE a.vec_id <> 0 AND b.vec_id <> 0
         |    AND $lhsPred AND $rhsPred)""".stripMargin
    def rankCte(name: String, src: String): String =
      s"""$name AS (
         |  SELECT i, j, c FROM (
         |    SELECT i, j, d / (sqrt(na) * sqrt(nb)) AS c,
         |           row_number() OVER (PARTITION BY i
         |      ORDER BY d / (sqrt(na) * sqrt(nb)) DESC, j) AS rnk
         |    FROM $src) WHERE rnk <= $GraphAnnDegree)""".stripMargin
    val prefix =
      s"""${scoreCte("sb", "a.vec_id % 2 = 0", "b.vec_id % 2 = 0")},
         |${rankCte("gb", "sb")},
         |${scoreCte("sd", "a.vec_id % 2 = 1", "TRUE")},
         |${rankCte("gd", "sd")},
         |gk AS (SELECT i, j, c FROM gb UNION ALL SELECT i, j, c FROM gd)""".stripMargin
    beamSearchOracle(prefix)
  }

  /** Seed the PERSISTENT graph-ANN store (r11, VERDICT #4 — the graph
    * twin of the saved-IVF lifecycle): vectors and their base×base
    * directed k-NN edge lists land under `epoch=-1` partitions, the
    * "day-0 backfill" the streaming deltas then append to. */
  def knnGraphStoreSeed(vecsIn: DataFrame, storeDir: String): Unit = {
    val vecs = vecsIn.select(col("vec_id"), col("label"), col("embedding"))
    vecs.write.mode("overwrite").parquet(s"$storeDir/vecs/epoch=-1")
    val e = withNsq(vecs).cut()
    knnEdges(e, e, GraphAnnDegree)
      .write.mode("overwrite").parquet(s"$storeDir/edges/epoch=-1")
  }

  /** One STREAMING micro-batch of graph-ANN index append — the per-epoch
    * core [[graft.streaming.Streams.knnGraphDeltas]] runs inside
    * `foreachBatch` (r11, VERDICT #4). Mirrors the batch
    * `sim_search_knn_graph_append` legs exactly: the delta's nodes rank
    * against saved ∪ delta (the HNSW insertion rule), saved nodes' lists
    * are never re-ranked, and symmetrization + the degree cap happen at
    * SERVE time over the union of all epochs' edges. Replay-idempotent
    * the same way [[graft.ext.Dedup.dedupDelta]] is: the epoch's vectors
    * and edges land in their own `epoch=N` partitions via direct
    * partition-path overwrite, so a re-delivered micro-batch rewrites
    * identical rows instead of duplicating them (dropDuplicates on
    * vec_id makes the ranking side replay-safe — on a replay the saved
    * store already holds this epoch's vectors). Returns the merged
    * servable edge list (symmetrized, capped) as of this epoch. */
  def knnGraphDelta(batchIn: DataFrame, storeDir: String,
                    epoch: Long): DataFrame = {
    // fail loudly if a compaction swap is in flight (r14 lease contract)
    graft.pipeline.StoreCompact.assertNotCompacting(storeDir)
    val s = batchIn.sparkSession
    val batch = batchIn.select(col("vec_id"), col("label"), col("embedding"))
      .cut()
    val savedVecs =
      if (graft.Hfs.exists(s"$storeDir/vecs")) s.read.parquet(s"$storeDir/vecs")
        .select(col("vec_id"), col("label"), col("embedding"))
      else batch.limit(0)
    val allVecs = savedVecs.union(batch).dropDuplicates("vec_id")
    // materialize BEFORE the store writes: on a replayed epoch the
    // saved side still references this epoch's previous files, which
    // the overwrite below deletes — cut the lineage first
    val fresh = knnEdges(withNsq(batch), withNsq(allVecs).cut(),
      GraphAnnDegree).cut()
    batch.write.mode("overwrite").parquet(s"$storeDir/vecs/epoch=$epoch")
    fresh.write.mode("overwrite").parquet(s"$storeDir/edges/epoch=$epoch")
    symCap(s.read.parquet(s"$storeDir/edges")
        .select(col("i"), col("j"), col("cosine")), GraphAnnDegree)
      .orderBy("i", "j")
  }

  /** Serve a probe from the persisted graph store — the same beam walk
    * as the registered graph keys, over the union of every epoch's
    * edges (StreamingSpec pins this equal to the one-shot batch
    * `sim_search_knn_graph_append` when the stream delivered the same
    * delta). */
  def serveFromGraphStore(s: SparkSession, storeDir: String,
                          probeIn: DataFrame): DataFrame = {
    val corpus = withNsq(s.read.parquet(s"$storeDir/vecs")
        .select(col("vec_id"), col("label"), col("embedding"))
        .dropDuplicates("vec_id"))
      .cut()
    val edges = s.read.parquet(s"$storeDir/edges")
      .select(col("i"), col("j"), col("cosine"))
    beamWalk(corpus, symCap(edges, GraphAnnDegree), labelEntries(corpus),
      probeIn, GraphAnnBeam, GraphAnnSteps, k = 10)
  }

  /** Label-FREE bucketed k-NN graph CONSTRUCTION [N] (r11, VERDICT #1) —
    * removes the last fixture crutch from the graph-ANN leg: the r10
    * build ([[knnEdges]]) bounded its quadratic with the corpus's LABEL
    * column, which an unlabeled 100 TB corpus doesn't have. This build
    * gets the same bound from STRUCTURE the engine already owns:
    *
    *  0. COLLAPSE (r12, VERDICT #1) — grid-identical embeddings (md5 of
    *     the 1e6-grid array, the `dedup_exact` fingerprint discipline)
    *     reduce to their min-vec_id REPRESENTATIVE before any bucketing:
    *     identical vectors share every LSH bucket regardless of plane
    *     count, so without this a duplicate-heavy corpus (the normal
    *     pre-dedup state of a crawl) made the seed self-join bucket² in
    *     the hot bucket. Members rejoin the finished graph as vec_id-
    *     ordered CHAIN edges (≤ 2 per member, exact cosine) — linear in
    *     group size, and the beam walk traverses groups through them.
    *     [[BucketDfCapConf]] adds the audio-fingerprint df-cap escape
    *     hatch for buckets that stay hot even rep-only (SCALE.md).
    *  1. SEED — TWO independent md5-coin LSH tables (`sim_search_ivf`'s
    *     hyperplane machinery under salts :lsh13 and :lsh17,
    *     [[withLshProjs]]): candidate pairs are the UNION of the two
    *     within-bucket equi-joins, ranked per node to the top-`degree`
    *     by exact cosine. Two tables, not one, is LOAD-BEARING: a
    *     single table's seed components live entirely inside buckets,
    *     and neighbor-of-neighbor refinement can never cross a
    *     component boundary (measured: rounds changed nothing) — with
    *     independent tables a neighbor split by table 1 is usually
    *     co-bucketed by table 2, so components span buckets and rounds
    *     have edges to propagate over. Plane count is the scale knob —
    *     2^P buckets per table, per-bucket block ≈ n/2^P, so P grows
    *     with the corpus and no stage is ever all-pairs.
    *  2. REFINE — NN-Descent rounds (Dong-Moses-Li, WWW'11): round t's
    *     candidates are the NEIGHBOR-OF-NEIGHBOR pairs of the current
    *     graph (one equi-join of the symmetrized edge list with
    *     itself), scored exactly and merged with the current edges,
    *     then re-ranked to top-`degree`. Per-node work is bounded by
    *     (2·degree)² candidates per round — corpus-size-INDEPENDENT —
    *     and deterministic by construction (no sampling: the full
    *     bounded candidate set is scored, ties broken (cosine DESC, j)),
    *     so the whole build replays bit-identically and mirrors in SQL.
    *
    * Edge recall vs the exact graph improves monotonically with rounds
    * on structured data (SimSearchRecallSpec pins seed < refined) —
    * NN-Descent's convergence argument: a true neighbor missed by the
    * hash seed is usually a neighbor-of-a-neighbor once SOME true edges
    * exist. Returns directed `(i, j, cosine)`: rep edges degree-capped,
    * plus the ≤ 2-per-member chain edges (callers' [[symCap]] re-caps
    * the union at 2×degree as before). */
  private val NnDescentRounds = 2

  /** Documented escape hatch for pathologically hot LSH buckets (r12,
    * VERDICT #1 — the audio-fingerprint df-cap move, SCALE.md): when
    * set, SEED buckets holding more than this many REPRESENTATIVES are
    * excluded from the seed self-join (their nodes still get edges —
    * through the other table's buckets and the NN-Descent rounds).
    * Unset by default, so the pinned oracles are unaffected. */
  private val BucketDfCapConf = "spark.graft.ann.bucketDfCap"

  /** The duplicate-collapse stage of the bucketed build (r12, VERDICT
    * #1): one row per input vector, annotated with its 1e6-grid md5
    * fingerprint `fp`, its group REPRESENTATIVE `rep` (min vec_id of
    * the grid-identical group), and its rank `rn` within the group
    * (vec_id order — the chain position). Package-private so the
    * planted-duplicate spec can pin the collapse directly. */
  private[graft] def collapseGroups(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fp = md5(concat_ws(",", expr(
      "transform(embedding, x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 1e6)" +
        " AS BIGINT) AS STRING))")))
    val wg = Window.partitionBy(col("fp"))
    raw.withColumn("fp", fp)
      .withColumn("rep", min(col("vec_id")).over(wg))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("fp")).orderBy(col("vec_id"))))
  }

  def knnGraphBucketed(corpusIn: DataFrame, degree: Int,
                       rounds: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // COLLAPSE identical-grid embeddings to one representative BEFORE
    // LSH bucketing (r12, VERDICT #1 — the dedup_exact/mm_scene_dedup
    // discipline applied here): the seed stage keys on sign-bit buckets,
    // and grid-identical vectors share EVERY bucket no matter the plane
    // count — on a duplicate-heavy corpus (the normal pre-dedup state of
    // a crawl) the seed self-join was bucket² in the hot bucket. Reps
    // alone seed and refine; members rejoin below as CHAIN edges
    // (vec_id-ordered, cosine ≈ 1), so groups stay reachable with ≤ 2
    // structural edges per member — linear, never group².
    // no lineage cut on mem: it's consumed three times (reps filter +
    // both chain aliases) but recomputing the md5+window collapse is
    // cheaper than a materialization barrier per build (measured: the
    // cut cost hnsw — two builds — about a second per build at sf0.1)
    val mem = collapseGroups(corpusIn.select(col("vec_id"), col("embedding")))
    val corpus = withLshProjs(
        withLshProjs(mem.filter(col("vec_id") === col("rep"))
          .select(col("vec_id"), col("embedding"))),
        "lsh17", "bucket2")
      .select(col("vec_id"), col("embedding"),
        dot(col("embedding"), col("embedding")).as("nsq"),
        col("bucket"), col("bucket2"))
      .cut()
    val dfCap = corpusIn.sparkSession.conf.getOption(BucketDfCapConf)
      .map(_.toLong)
    val w = Window.partitionBy(col("i")).orderBy(col("cosine").desc, col("j"))
    def rank(pairs: DataFrame): DataFrame = pairs
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= degree)
      .select(col("i"), col("j"), col("cosine"))
    def tablePairs(bucketCol: String): DataFrame = {
      val base = dfCap match {
        case Some(cap) =>
          corpus.join(corpus.groupBy(col(bucketCol))
              .agg(count(lit(1)).as("bn")).filter(col("bn") <= cap)
              .select(bucketCol),
            Seq(bucketCol))
        case None => corpus
      }
      base.as("a").join(base.as("b"),
          col(s"a.$bucketCol") === col(s"b.$bucketCol") &&
            col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"))
    }
    val seedPairs = tablePairs("bucket").union(tablePairs("bucket2")).distinct()
    var g = rank(seedPairs
        .join(corpus.select(col("vec_id").as("i"), col("embedding").as("ea"),
          col("nsq").as("na")), Seq("i"))
        .join(corpus.select(col("vec_id").as("j"), col("embedding").as("eb"),
          col("nsq").as("nb")), Seq("j"))
        .select(col("i"), col("j"),
          (dot(col("ea"), col("eb")) /
            (sqrt(col("na")) * sqrt(col("nb")))).as("cosine")))
      .cut()
    for (_ <- 1 to rounds) {
      val und = g.select(col("i"), col("j"))
        .union(g.select(col("j").as("i"), col("i").as("j")))
        .distinct()
      val nn = und.as("x").join(und.as("y"),
          col("x.j") === col("y.i") && col("x.i") =!= col("y.j"))
        .select(col("x.i").as("i"), col("y.j").as("j"))
        .distinct()
      val scoredNn = nn
        .join(corpus.select(col("vec_id").as("i"), col("embedding").as("ea"),
          col("nsq").as("na")), Seq("i"))
        .join(corpus.select(col("vec_id").as("j"), col("embedding").as("eb"),
          col("nsq").as("nb")), Seq("j"))
        .select(col("i"), col("j"),
          (dot(col("ea"), col("eb")) /
            (sqrt(col("na")) * sqrt(col("nb")))).as("cosine"))
      // a candidate already in g carries the bit-identical cosine (same
      // IEEE sequence on the same inputs), so distinct() collapses it
      g = rank(scoredNn.union(g).distinct()).cut()
    }
    // CHAIN edges fan the collapsed members back in: group members in
    // vec_id order, each linked to its successor with the exact cosine
    // (grid-identical need not mean float-identical, so it's computed,
    // not a literal 1.0). ≤ 2 structural edges per member — the walk
    // reaches every duplicate through its group's chain, and a
    // million-copy group costs a million edges, never a million².
    // Disjoint from g (g's endpoints are reps; a chain edge always has
    // a non-rep endpoint), so the union introduces no duplicate pairs.
    val mch = mem
      .select(col("vec_id"), col("embedding"),
        dot(col("embedding"), col("embedding")).as("nsq"),
        col("fp"), col("rn"))
    val chain = mch.as("a").join(mch.as("b"),
        col("a.fp") === col("b.fp") && col("b.rn") === col("a.rn") + 1)
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"),
        (dot(col("a.embedding"), col("b.embedding")) /
          (sqrt(col("a.nsq")) * sqrt(col("b.nsq")))).as("cosine"))
    g.union(chain)
      .union(chain.select(col("j").as("i"), col("i").as("j"), col("cosine")))
  }

  /** One entry point per non-empty LSH bucket (≤ 2^planes, label-free).
    * Computed over the FULL corpus while the oracles read the build's
    * rep-only `bk1` — provably equal: a member's grid equals its rep's,
    * so they share every bucket, and the rep is the group MIN, so a
    * bucket's min vec_id is always a rep. */
  private def bucketEntries(corpusIn: DataFrame): DataFrame =
    withLshProjs(corpusIn).groupBy(col("bucket"))
      .agg(min(col("vec_id")).as("vec_id")).select("vec_id")

  /** The label-free twin of [[graphBeamSearch]]: bucketed NN-Descent
    * build, per-bucket entries, same beam walk — public so the recall
    * spec can drive the identical code path over clustered fixtures. */
  def graphBeamSearchBucketed(corpusIn: DataFrame, probeIn: DataFrame,
                              degree: Int, rounds: Int, beamW: Int,
                              steps: Int, k: Int): DataFrame = {
    val raw = corpusIn.select(col("vec_id"), col("embedding"))
    val corpus = raw.select(col("vec_id"), col("embedding"),
      dot(col("embedding"), col("embedding")).as("nsq")).cut()
    beamWalk(corpus, symCap(knnGraphBucketed(raw, degree, rounds), degree),
      bucketEntries(raw), probeIn, beamW, steps, k)
  }

  private def knnGraphBucketedSearch(s: SparkSession, d: String): DataFrame = {
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d)
    graphBeamSearchBucketed(
      e.filter(col("vec_id") =!= 0),
      e.filter(col("vec_id") === 0).select(col("embedding")),
      GraphAnnDegree, NnDescentRounds, GraphAnnBeam, GraphAnnSteps, k = 10)
  }

  /** Generated oracle for [[knnGraphBucketedSearch]]: the md5-coin LSH
    * bucket CTEs (sim_search_ivf's weight-matrix regeneration), the
    * bucket-seeded degree ranking, [[NnDescentRounds]] unrolled
    * NN-Descent rounds, per-bucket entry points, and the shared
    * symmetrize/cap/beam-walk tail. Every multiply-referenced CTE is
    * MATERIALIZED (the beamSearchOracle lesson: inlining re-evaluates
    * the whole chain exponentially). */
  private def duckHex8(key: String): String =
    (0 until 8).map { i =>
      val f = 1L << (4 * (7 - i))
      s"(strpos('0123456789abcdef', substr(md5($key), ${i + 1}, 1)) - 1) * $f"
    }.mkString("(", "\n        + ", ")")

  /** The two md5-coin LSH weight-matrix CTEs (`w1`/`w2`) — corpus- and
    * build-independent, so one statement holding several bucketed
    * builds (the HNSW descent) emits them exactly once. */
  private def lshWeightCtes: String = {
    def wkey(salt: String) =
      s"CAST(pp.p AS VARCHAR) || '_' || CAST(ii.i AS VARCHAR) || ':$salt'"
    Seq(1 -> "lsh13", 2 -> "lsh17").map { case (n, salt) =>
      s"""w$n AS (
         |  SELECT pp.p, ii.i,
         |         ${duckHex8(wkey(salt))} % 2001 - 1000 AS w
         |  FROM (SELECT unnest(range(0, $ivfPlanes)) AS p) pp,
         |       (SELECT unnest(range(0, 64)) AS i) ii)""".stripMargin
    }.mkString(",\n")
  }

  /** The bucketed NN-Descent build as a name-suffixed CTE chain over
    * `srcRel` (must expose vec_id + embedding): the r12 duplicate
    * COLLAPSE (grid-md5 groups → min-id reps, mirroring
    * [[collapseGroups]]), LSH buckets under both weight tables over the
    * REPS, seed pairs, [[NnDescentRounds]] unrolled refinement rounds,
    * then the members' chain edges, ending in `gk$sfx (i, j, c)`.
    * Requires [[lshWeightCtes]] emitted earlier in the statement. */
  private def bucketedBuildCtes(sfx: String, srcRel: String): String = {
    def rankSql(name: String, src: String): String =
      s"""$name AS MATERIALIZED (
         |  SELECT i, j, c FROM (
         |    SELECT i, j, c, row_number() OVER (PARTITION BY i
         |      ORDER BY c DESC, j) AS rnk
         |    FROM $src) WHERE rnk <= $GraphAnnDegree)""".stripMargin
    val cosPair =
      s"""${dotSql.format("a.embedding", "b.embedding")}
         |           / (sqrt(${dotSql.format("a.embedding", "a.embedding")})
         |              * sqrt(${dotSql.format("b.embedding", "b.embedding")}))""".stripMargin
    val rounds = (1 to NnDescentRounds).map { t =>
      s"""u$t$sfx AS MATERIALIZED (
         |  SELECT DISTINCT i, j FROM (
         |    SELECT i, j FROM g${t - 1}$sfx
         |    UNION ALL SELECT j AS i, i AS j FROM g${t - 1}$sfx)),
         |nn$t$sfx AS MATERIALIZED (
         |  SELECT DISTINCT x.i, y.j
         |  FROM u$t$sfx x JOIN u$t$sfx y ON x.j = y.i WHERE x.i <> y.j),
         |sc$t$sfx AS MATERIALIZED (
         |  SELECT nn.i, nn.j, $cosPair AS c
         |  FROM nn$t$sfx nn JOIN embeddings a ON a.vec_id = nn.i
         |       JOIN embeddings b ON b.vec_id = nn.j),
         |${rankSql(s"g$t$sfx",
        s"(SELECT DISTINCT i, j, c FROM (SELECT i, j, c FROM sc$t$sfx UNION ALL SELECT i, j, c FROM g${t - 1}$sfx))")}""".stripMargin
    }.mkString(",\n")
    val tables = Seq(1, 2).map { n =>
      s"""pr$n$sfx AS (
         |  SELECT gvv$sfx.vec_id, w$n.p,
         |         CAST(sum(gvv$sfx.gv * w$n.w) AS BIGINT) AS proj
         |  FROM gvv$sfx JOIN w$n ON gvv$sfx.i = w$n.i GROUP BY 1, 2),
         |bk$n$sfx AS MATERIALIZED (
         |  SELECT vec_id,
         |         CAST(sum(CASE WHEN proj > 0 THEN 1 << p ELSE 0 END)
         |              AS BIGINT) AS bucket
         |  FROM pr$n$sfx GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""src$sfx AS MATERIALIZED (SELECT vec_id, embedding FROM $srcRel),
       |-- COLLAPSE (r12): grid-identical vectors reduce to their min-id
       |-- representative before bucketing (mirrors collapseGroups); the
       |-- build runs over reps, members rejoin as chain edges in ch$sfx
       |mem$sfx AS MATERIALIZED (
       |  SELECT vec_id, embedding, fp,
       |         min(vec_id) OVER (PARTITION BY fp) AS rep,
       |         row_number() OVER (PARTITION BY fp ORDER BY vec_id) AS rn
       |  FROM (
       |    SELECT vec_id, embedding,
       |           md5(array_to_string(list_transform(embedding,
       |             x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT)
       |                  AS VARCHAR)), ',')) AS fp
       |    FROM src$sfx)),
       |gvv$sfx AS (
       |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
       |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1e6)
       |              AS BIGINT) AS gv
       |  FROM mem$sfx WHERE vec_id = rep),
       |$tables,
       |cand0$sfx AS MATERIALIZED (
       |  -- DISTINCT over UNION ALL, never bare UNION: inside a WITH
       |  -- RECURSIVE statement (the CC oracles) DuckDB parses a CTE-body
       |  -- UNION as the recursive base/step form and SKIPS the dedup, so
       |  -- doubly-co-bucketed pairs ate two rank slots
       |  SELECT DISTINCT i, j FROM (
       |    SELECT ba.vec_id AS i, bb.vec_id AS j
       |    FROM bk1$sfx ba JOIN bk1$sfx bb
       |      ON ba.bucket = bb.bucket AND ba.vec_id <> bb.vec_id
       |    UNION ALL
       |    SELECT ba.vec_id AS i, bb.vec_id AS j
       |    FROM bk2$sfx ba JOIN bk2$sfx bb
       |      ON ba.bucket = bb.bucket AND ba.vec_id <> bb.vec_id)),
       |s0$sfx AS MATERIALIZED (
       |  SELECT c0.i, c0.j, $cosPair AS c
       |  FROM cand0$sfx c0 JOIN embeddings a ON a.vec_id = c0.i
       |       JOIN embeddings b ON b.vec_id = c0.j),
       |${rankSql(s"g0$sfx", s"s0$sfx")},
       |$rounds,
       |ch$sfx AS MATERIALIZED (
       |  SELECT a.vec_id AS i, b.vec_id AS j, $cosPair AS c
       |  FROM mem$sfx a JOIN mem$sfx b ON a.fp = b.fp AND b.rn = a.rn + 1),
       |gk$sfx AS (SELECT i, j, c FROM g$NnDescentRounds$sfx
       |           UNION ALL SELECT i, j, c FROM ch$sfx
       |           UNION ALL SELECT j AS i, i AS j, c FROM ch$sfx)""".stripMargin
  }

  private def knnGraphBucketedOracle: String = {
    val prefix =
      s"""$lshWeightCtes,
         |${bucketedBuildCtes("", "embeddings WHERE vec_id <> 0")}""".stripMargin
    beamSearchOracle(prefix,
      "SELECT min(vec_id) AS vec_id FROM bk1 GROUP BY bucket")
  }

  /** Generated oracle for [[hnswServe]]: the md5-coin layer sample, TWO
    * bucketed builds (upper subset + full corpus) sharing the weight
    * CTEs, the upper walk ([[HnswUpperSteps]] rounds from the upper
    * layer's per-bucket minima), its top-1 as the layer-0 entry, and
    * the usual [[GraphAnnSteps]]-round layer-0 walk. */
  private def hnswOracle: String = {
    val upCoin = duckHex8("CAST(vec_id AS VARCHAR) || ':hnswlvl'")
    s"""WITH up AS MATERIALIZED (
       |  SELECT vec_id, embedding FROM embeddings
       |  WHERE vec_id <> 0 AND $upCoin % $HnswLevelMod = 0),
       |$lshWeightCtes,
       |${bucketedBuildCtes("u", "up")},
       |${bucketedBuildCtes("z", "embeddings WHERE vec_id <> 0")},
       |${walkCtes("u", "up", "gku",
      "SELECT min(vec_id) AS vec_id FROM bk1u GROUP BY bucket",
      HnswUpperSteps, emitProbe = true)},
       |${walkCtes("z", "embeddings", "gkz",
      s"SELECT vec_id FROM v${HnswUpperSteps}u ORDER BY cosine DESC, vec_id LIMIT 1",
      GraphAnnSteps, emitProbe = false)}
       |SELECT vec_id, cosine FROM v${GraphAnnSteps}z
       |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin
  }

  /** Hierarchical graph-ANN serving [N] (r11) — the 2-layer HNSW shape
    * (Malkov-Yashunin 2016) on the label-free machinery: the flat
    * bucketed walk enters from EVERY non-empty LSH bucket (≤ 2^planes
    * entry scorings per probe — cheap here, but the entry fan-out is
    * corpus-structure-bound, not a chosen knob), while HNSW replaces
    * the fan-out with a COARSE UPPER LAYER walked first:
    *
    *  - LAYER assignment: node is upper iff
    *    `hex8(md5(vec_id || ':hnswlvl')) % 4 == 0` — the md5-coin
    *    geometric level rule (p = 1/4), so the upper layer is an
    *    unbiased ~25% sample with no data-dependent state;
    *  - LAYER-1 graph: the SAME bucketed NN-Descent build
    *    ([[knnGraphBucketed]]) over the upper subset; walked
    *    [[HnswUpperSteps]] beam rounds from the upper layer's
    *    per-bucket minima;
    *  - LAYER-0 graph: the bucketed build over the full corpus, walked
    *    the usual [[GraphAnnSteps]] rounds — entered from the single
    *    best upper-layer hit (the HNSW ef=1 descent).
    *
    * At 100 TB the upper layer generalizes to a geometric level stack
    * (1/4 per level): each descent starts from one node, walk work per
    * layer is steps × beam × 2·degree, and only the top layer pays an
    * entry scan — of n/4^L nodes instead of the flat walk's bucket
    * count. Both builds, both walks, and the layer coin are the
    * engine's existing pinned primitives, so the whole descent unrolls
    * into one DuckDB statement. */
  private val HnswLevelMod = 4
  private val HnswUpperSteps = 3

  /** Upper-layer membership coin: hex8(md5(vec_id:hnswlvl)) % mod == 0. */
  private def hnswCoin: Column =
    graft.functions.VectorFunctions.hex_long(
      md5(concat(col("vec_id").cast("string"), lit(":hnswlvl"))), 1, 8) %
      HnswLevelMod

  /** The 2-layer descent — public so the recall spec can drive clustered
    * fixtures through the identical path. */
  def hnswSearch(corpusIn: DataFrame, probeIn: DataFrame, degree: Int,
                 rounds: Int, beamW: Int, steps: Int, k: Int): DataFrame = {
    val raw = corpusIn.select(col("vec_id"), col("embedding"))
    val upperRaw = raw.filter(hnswCoin === 0)
    val full = raw.select(col("vec_id"), col("embedding"),
      dot(col("embedding"), col("embedding")).as("nsq")).cut()
    val upper = full.filter(hnswCoin === 0).cut()
    val entry0 = beamWalk(upper,
        symCap(knnGraphBucketed(upperRaw, degree, rounds), degree),
        bucketEntries(upperRaw), probeIn, beamW, HnswUpperSteps, k = 1)
      .select("vec_id")
    beamWalk(full,
      symCap(knnGraphBucketed(raw, degree, rounds), degree),
      entry0, probeIn, beamW, steps, k)
  }

  private def hnswServe(s: SparkSession, d: String): DataFrame = {
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d)
    hnswSearch(
      e.filter(col("vec_id") =!= 0),
      e.filter(col("vec_id") === 0).select(col("embedding")),
      GraphAnnDegree, NnDescentRounds, GraphAnnBeam, GraphAnnSteps, k = 10)
  }

  /** Persisted-store HNSW serving as a registered key [N] (r12, VERDICT
    * #2 — headline hygiene): `sim_search_hnsw` pays TWO full NN-Descent
    * builds on every run, but at deployment the builds persist
    * ([[hnswStoreSeed]]) and a query pays only the two walks — the
    * amortized-build property is the reason the index exists. This key
    * seeds the store once per process (per-JVM [[graft.Scratch]] dir,
    * keyed by sf dir) and SERVES from it, so bench's min-of-N timing
    * reads steady-state serving cost while the first (seeding) run pays
    * the build. Same oracle as the in-query key: store serving is
    * spec-pinned bit-equal to the one-shot descent. */
  /** GEOMETRIC level-stack HNSW [N] (r12, VERDICT #5) — the 2-layer
    * descent generalized to [[HnswMultiLevels]] upper layers, realizing
    * the SCALE.md claim that only the TOP layer pays an entry scan
    * (n/4^L nodes): layer ℓ membership = md5 coins 1..ℓ ALL zero
    * (coin 1 is the 2-layer key's `:hnswlvl` coin, coin ℓ salts
    * `:hnswlvl$ℓ`), so the samples nest geometrically (p = 1/4 per
    * level) with NO data-dependent state — the true HNSW level rule
    * (level = count of leading zero coin draws). Each layer gets the
    * bucketed NN-Descent build over its sample; the descent walks the
    * top layer from its per-bucket minima, then ef=1 (k=1, top-1 entry)
    * through each intermediate layer, then the usual layer-0 walk. At
    * 100 TB L grows with log₄(corpus) and per-layer walk work stays
    * steps × beam × 2·degree — corpus-size-independent below the top. */
  private val HnswMultiLevels = 3

  /** Membership coin for level ℓ (1-based): level-1 reuses the 2-layer
    * key's salt so the stacks agree on the first sample. */
  private def hnswCoinL(l: Int): Column =
    if (l == 1) hnswCoin
    else
      graft.functions.VectorFunctions.hex_long(
        md5(concat(col("vec_id").cast("string"), lit(s":hnswlvl$l"))), 1, 8) %
        HnswLevelMod

  /** The layer-ℓ slice of a corpus: coins 1..ℓ all zero (ℓ = 0 is the
    * full corpus). Stateless — every epoch, store, and serving path
    * derives the same nested samples from vec_id alone. */
  private def hnswLayerSlice(raw: DataFrame, l: Int): DataFrame =
    (1 to l).foldLeft(raw)((df, i) => df.filter(hnswCoinL(i) === 0))

  private def withNsqCut(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("embedding"),
      dot(col("embedding"), col("embedding")).as("nsq")).cut()

  /** The L-layer descent over per-layer edge providers — shared by the
    * in-query key (builds on the fly) and the persisted-store serving
    * path (reads each layer's saved edges). */
  private def hnswMultiDescend(raw: DataFrame, probeIn: DataFrame,
                               levels: Int, degree: Int, beamW: Int,
                               steps: Int, k: Int,
                               layerEdges: Int => DataFrame): DataFrame = {
    val top = hnswLayerSlice(raw, levels)
    var entry = beamWalk(withNsqCut(top),
        symCap(layerEdges(levels), degree),
        bucketEntries(top), probeIn, beamW, HnswUpperSteps, k = 1)
      .select("vec_id")
    for (l <- (levels - 1) to 1 by -1) {
      entry = beamWalk(withNsqCut(hnswLayerSlice(raw, l)),
          symCap(layerEdges(l), degree),
          entry, probeIn, beamW, HnswUpperSteps, k = 1)
        .select("vec_id")
    }
    beamWalk(withNsqCut(raw), symCap(layerEdges(0), degree),
      entry, probeIn, beamW, steps, k)
  }

  /** The L-layer descent — public for the recall spec. */
  def hnswMultiSearch(corpusIn: DataFrame, probeIn: DataFrame, levels: Int,
                      degree: Int, rounds: Int, beamW: Int, steps: Int,
                      k: Int): DataFrame = {
    val raw = corpusIn.select(col("vec_id"), col("embedding"))
    hnswMultiDescend(raw, probeIn, levels, degree, beamW, steps, k,
      l => knnGraphBucketed(hnswLayerSlice(raw, l), degree, rounds))
  }

  /** Seed the persistent LEVEL-STACK store (r12): vectors plus every
    * layer's bucketed edge list land under `epoch=-1` — the L-layer
    * generalization of [[hnswStoreSeed]]. Layer membership stays the
    * stateless md5 coin stack, so appends never rebalance any layer
    * (the 2-layer [[hnswDelta]] rule generalizes per layer: a delta
    * node joins every layer its coins admit). */
  def hnswMultiStoreSeed(vecsIn: DataFrame, storeDir: String,
                         levels: Int = HnswMultiLevels,
                         degree: Int = GraphAnnDegree,
                         rounds: Int = NnDescentRounds): Unit = {
    val raw = vecsIn.select(col("vec_id"), col("embedding"))
    raw.write.mode("overwrite").parquet(s"$storeDir/vecs/epoch=-1")
    (0 to levels).foreach { l =>
      knnGraphBucketed(hnswLayerSlice(raw, l), degree, rounds)
        .write.mode("overwrite").parquet(s"$storeDir/l$l/epoch=-1")
    }
  }

  /** Serve a probe from the persisted level stack — the same descent as
    * `sim_search_hnsw_multi` over the union of every epoch's edges
    * (spec-pinned EQUAL to the in-query key when the store was seeded
    * with the same corpus). */
  def serveHnswMultiFromStore(s: SparkSession, storeDir: String,
                              probe: DataFrame,
                              levels: Int = HnswMultiLevels,
                              k: Int = 10,
                              beamW: Int = GraphAnnBeam,
                              steps: Int = GraphAnnSteps): DataFrame = {
    val raw = s.read.parquet(s"$storeDir/vecs").select("vec_id", "embedding")
      .dropDuplicates("vec_id")
    hnswMultiDescend(raw, probe, levels, GraphAnnDegree, beamW,
      steps, k,
      l => s.read.parquet(s"$storeDir/l$l")
        .select(col("i"), col("j"), col("cosine")))
  }

  private def hnswMultiServe(s: SparkSession, d: String): DataFrame = {
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d)
    hnswMultiSearch(
      e.filter(col("vec_id") =!= 0),
      e.filter(col("vec_id") === 0).select(col("embedding")),
      HnswMultiLevels, GraphAnnDegree, NnDescentRounds, GraphAnnBeam,
      GraphAnnSteps, k = 10)
  }

  /** Generated oracle for [[hnswMultiServe]]: the nested coin samples
    * `up1 ⊇ up2 ⊇ up3`, FOUR bucketed builds sharing the weight CTEs,
    * the top walk from its per-bucket minima, ef=1 top-1 entries
    * through the intermediate layers, and the layer-0 walk. */
  private def hnswMultiOracle: String = {
    def coinSql(l: Int): String = {
      val salt = if (l == 1) ":hnswlvl" else s":hnswlvl$l"
      duckHex8(s"CAST(vec_id AS VARCHAR) || '$salt'") + s" % $HnswLevelMod = 0"
    }
    val ups = (1 to HnswMultiLevels).map { l =>
      val src = if (l == 1) "embeddings WHERE vec_id <> 0" else s"up${l - 1}"
      s"""up$l AS MATERIALIZED (
         |  SELECT vec_id, embedding FROM $src
         |  ${if (l == 1) "AND" else "WHERE"} ${coinSql(l)})""".stripMargin
    }.mkString(",\n")
    val builds = ((1 to HnswMultiLevels).map(l =>
        bucketedBuildCtes(s"a$l", s"up$l")) :+
      bucketedBuildCtes("z", "embeddings WHERE vec_id <> 0")).mkString(",\n")
    val walks = {
      val topSfx = s"a$HnswMultiLevels"
      val top = walkCtes(topSfx, s"up$HnswMultiLevels", s"gk$topSfx",
        s"SELECT min(vec_id) AS vec_id FROM bk1$topSfx GROUP BY bucket",
        HnswUpperSteps, emitProbe = true)
      val mids = ((HnswMultiLevels - 1) to 1 by -1).map { l =>
        walkCtes(s"a$l", s"up$l", s"gka$l",
          s"SELECT vec_id FROM v${HnswUpperSteps}a${l + 1} " +
            "ORDER BY cosine DESC, vec_id LIMIT 1",
          HnswUpperSteps, emitProbe = false)
      }
      val bottom = walkCtes("z", "embeddings", "gkz",
        s"SELECT vec_id FROM v${HnswUpperSteps}a1 " +
          "ORDER BY cosine DESC, vec_id LIMIT 1",
        GraphAnnSteps, emitProbe = false)
      (Seq(top) ++ mids :+ bottom).mkString(",\n")
    }
    s"""WITH $ups,
       |$lshWeightCtes,
       |$builds,
       |$walks
       |SELECT vec_id, cosine FROM v${GraphAnnSteps}z
       |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin
  }

  private def hnswServedKey(s: SparkSession, d: String): DataFrame = {
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d)
    val dir = graft.Scratch.dir(
      "hnsw_store_" + d.replaceAll("[^A-Za-z0-9.]", "_"))
    // gate on the LAST artifact hnswStoreSeed writes (vecs → l0 → l1) —
    // and on its parquet _SUCCESS marker, not the directory: Spark
    // creates the output dir before the job commits, so a seed crashed
    // mid-write of l1 leaves a partial dir that would read as fully
    // seeded and serve incomplete data (ADVICE r12 + r13)
    if (!graft.Hfs.exists(s"$dir/l1/epoch=-1/_SUCCESS"))
      hnswStoreSeed(e.filter(col("vec_id") =!= 0), dir)
    // serving-time quality knobs (r13): defaults match the oracle's
    // unrolled rounds; a user widens the beam per session for recall
    serveHnswFromStore(s, dir,
      e.filter(col("vec_id") === 0).select(col("embedding")),
      k = 10, beamW = servingBeam(s), steps = servingSteps(s))
  }

  // --- persisted HNSW lifecycle (seed → serve → append → stream) -------

  /** Seed the persistent HIERARCHICAL store: vectors plus BOTH layers'
    * bucketed edge lists land under `epoch=-1` partitions — the day-0
    * backfill the deltas append to. Layer membership is the stateless
    * md5 coin, so the split never needs rebalancing as epochs accrue. */
  def hnswStoreSeed(vecsIn: DataFrame, storeDir: String,
                    degree: Int = GraphAnnDegree,
                    rounds: Int = NnDescentRounds): Unit = {
    val raw = vecsIn.select(col("vec_id"), col("embedding"))
    raw.write.mode("overwrite").parquet(s"$storeDir/vecs/epoch=-1")
    knnGraphBucketed(raw, degree, rounds)
      .write.mode("overwrite").parquet(s"$storeDir/l0/epoch=-1")
    knnGraphBucketed(raw.filter(hnswCoin === 0), degree, rounds)
      .write.mode("overwrite").parquet(s"$storeDir/l1/epoch=-1")
  }

  /** Serve a probe from the persisted hierarchical store — the same
    * two-walk descent as `sim_search_hnsw`, over the union of every
    * epoch's edges (spec-pinned EQUAL to the in-query key when the
    * store was seeded with the same corpus). */
  def serveHnswFromStore(s: SparkSession, storeDir: String,
                         probe: DataFrame, k: Int = 10,
                         beamW: Int = GraphAnnBeam,
                         steps: Int = GraphAnnSteps): DataFrame = {
    // dropDuplicates: a doc re-delivered under a DIFFERENT epoch (the
    // at-least-once contract only pins same-epoch replays) leaves the
    // same vec_id in two epoch partitions; duplicate corpus rows would
    // enter beamWalk's visited set and eat beam slots (ADVICE r11)
    val vecs = s.read.parquet(s"$storeDir/vecs").select("vec_id", "embedding")
      .dropDuplicates("vec_id")
    val full = vecs.select(col("vec_id"), col("embedding"),
      dot(col("embedding"), col("embedding")).as("nsq")).cut()
    val upperRaw = vecs.filter(hnswCoin === 0)
    val g1 = symCap(s.read.parquet(s"$storeDir/l1")
      .select(col("i"), col("j"), col("cosine")), GraphAnnDegree)
    val g0 = symCap(s.read.parquet(s"$storeDir/l0")
      .select(col("i"), col("j"), col("cosine")), GraphAnnDegree)
    val entry0 = beamWalk(full.filter(hnswCoin === 0).cut(), g1,
        bucketEntries(upperRaw), probe, beamW, HnswUpperSteps, k = 1)
      .select("vec_id")
    beamWalk(full, g0, entry0, probe, beamW, steps, k)
  }

  /** Corpus-size-aware AUTO default for the serving beam (r13 VERDICT
    * #7 stretch). The fixed beam-10 default degrades as the index
    * grows on isotropic (worst-case) corpora — measured recall@10 fell
    * 0.50 → 0.20 from 500 to 2,000 vectors (PERF.md r14) — because a
    * constant beam explores a constant candidate count while the
    * target's neighborhood rank grows with n. The verdict sketched a
    * log-scaled floor; the MEASURED isotropic curve contradicts log
    * scaling (beam 20 at n=2000 reads 0.30, still under the 0.50
    * anchor; beam 40 reads 0.70 — on signal-free vectors the candidate
    * budget for fixed recall grows ~linearly, brute force in the
    * limit), so the auto default follows the measurement: linear
    * through the anchors (500, 10) and (2000, 40), i.e. ceil(n/50),
    * floored at the pinned default and CAPPED at 128 — clusterable
    * corpora (the workload graph ANN exists for) saturate recall 1.0
    * far below the cap, and past it (n > 6400) worst-case recall
    * declines rather than serving cost growing unboundedly; the curve
    * tool prices an explicit dial there. SimSearchRecallSpec pins the
    * anchors and the served recall floor at both SFs. */
  def autoBeam(n: Long): Int =
    math.max(GraphAnnBeam, math.min(128, math.ceil(n / 50.0).toInt))

  /** Serve with the auto-scaled default: an EXPLICIT
    * `spark.graft.ann.beamWidth` always wins (the dial contract);
    * otherwise the beam derives from the persisted index's node count.
    * A separate entry point so every oracle-checked key keeps serving
    * at the pinned unrolled defaults — hashes stay exact unchanged. */
  def serveHnswAuto(s: SparkSession, storeDir: String, probe: DataFrame,
                    k: Int = 10): DataFrame = {
    val beam = s.conf.getOption(BeamWidthConf).map(_.toInt).getOrElse(
      autoBeam(s.read.parquet(s"$storeDir/vecs")
        .dropDuplicates("vec_id").count()))
    serveHnswFromStore(s, storeDir, probe, k, beamW = beam,
      steps = servingSteps(s))
  }

  /** COST probe for the served-HNSW dials (r13 VERDICT #4): the number
    * of candidates the descent actually SCORES at a given (beamW,
    * steps) — the price axis beside the recall curves, measured on the
    * identical plan (both layers' visited sets counted, nothing
    * estimated). Tool-facing ([[graft.tools.AnnBeamCurve]]); the
    * serving keys never run it. */
  def serveHnswScoredCount(s: SparkSession, storeDir: String,
                           probe: DataFrame,
                           beamW: Int = GraphAnnBeam,
                           steps: Int = GraphAnnSteps): Long = {
    val vecs = s.read.parquet(s"$storeDir/vecs").select("vec_id", "embedding")
      .dropDuplicates("vec_id")
    val full = vecs.select(col("vec_id"), col("embedding"),
      dot(col("embedding"), col("embedding")).as("nsq")).cut()
    val upperRaw = vecs.filter(hnswCoin === 0)
    val g1 = symCap(s.read.parquet(s"$storeDir/l1")
      .select(col("i"), col("j"), col("cosine")), GraphAnnDegree)
    val g0 = symCap(s.read.parquet(s"$storeDir/l0")
      .select(col("i"), col("j"), col("cosine")), GraphAnnDegree)
    val upperVisited = beamWalkVisited(full.filter(hnswCoin === 0).cut(), g1,
      bucketEntries(upperRaw), probe, beamW, HnswUpperSteps)
    val entry0 = upperVisited.orderBy(col("cosine").desc, col("vec_id"))
      .limit(1).select("vec_id")
    upperVisited.count() +
      beamWalkVisited(full, g0, entry0, probe, beamW, steps).count()
  }

  /** COST probe for the IVF `nprobe` dial: candidate rows the probed
    * cells contribute to the serve-time scoring join — the same routing
    * and join as [[servedTopKPinned]], counted instead of top-k'd. */
  def servedIvfScoredCount(spark: SparkSession, dir: String,
                           probes: DataFrame, nprobe: Int): Long = {
    import org.apache.spark.sql.expressions.Window
    val centroids = spark.read.parquet(s"$dir/centroids")
    val cells = spark.read.parquet(s"$dir/cells")
      .select(col("cell").cast("long").as("cell"), col("vec_id"))
    val probeCells = probes.crossJoin(broadcast(centroids))
      .select(col("probe_id"), col("cid"),
        pinnedAffinity(col("probe"), col("cvec")).as("aff"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("probe_id")).orderBy(col("aff").desc, col("cid"))))
      .filter(col("rnk") <= nprobe)
      .select(col("probe_id"), col("cid").as("probe_cell"))
    cells.join(broadcast(probeCells),
      col("cell") === col("probe_cell") && col("vec_id") =!= col("probe_id"))
      .count()
  }

  /** Label-free delta ranking — the bucketed twin of [[knnEdges]]'s
    * append leg: the delta's nodes rank against saved ∪ delta restricted
    * to shared LSH buckets (union of both tables' equi-joins, the build's
    * candidate rule), top-`degree` by exact cosine. No label anywhere,
    * matching the HNSW family's label-free contract. */
  private def bucketedDeltaEdges(batch: DataFrame, allVecs: DataFrame,
                                 degree: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def proj2(df: DataFrame): DataFrame =
      withLshProjs(withLshProjs(df.select(col("vec_id"), col("embedding"))),
          "lsh17", "bucket2")
        .select(col("vec_id"), col("embedding"),
          dot(col("embedding"), col("embedding")).as("nsq"),
          col("bucket"), col("bucket2"))
    val lhs = proj2(batch).cut()
    val rhs0 = proj2(allVecs).cut()
    val cosPair = dot(col("a.embedding"), col("b.embedding")) /
      (sqrt(col("a.nsq")) * sqrt(col("b.nsq")))
    // the delta leg shares the build's hot-bucket exposure (delta rows ×
    // saved bucket size) — the same conf-gated df-cap applies, default
    // off (r12; the ranked join is |delta|-bounded either way)
    val dfCap = batch.sparkSession.conf.getOption(BucketDfCapConf).map(_.toLong)
    def pairs(bucketCol: String): DataFrame = {
      val rhs = dfCap match {
        case Some(cap) =>
          rhs0.join(rhs0.groupBy(col(bucketCol))
              .agg(count(lit(1)).as("bn")).filter(col("bn") <= cap)
              .select(bucketCol),
            Seq(bucketCol))
        case None => rhs0
      }
      lhs.as("a").join(rhs.as("b"),
          col(s"a.$bucketCol") === col(s"b.$bucketCol") &&
            col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"),
          cosPair.as("cosine"))
    }
    val w = Window.partitionBy(col("i")).orderBy(col("cosine").desc, col("j"))
    pairs("bucket").union(pairs("bucket2")).distinct()
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= degree)
      .select(col("i"), col("j"), col("cosine"))
  }

  /** One STREAMING micro-batch of hierarchical index append — the HNSW
    * twin of [[knnGraphDelta]]: the delta ranks label-free against
    * saved ∪ delta on BOTH layers (upper membership is the same md5
    * coin, so the batch's upper slice is known statelessly), every
    * epoch table lands in its own `epoch=N` partition
    * (replay-idempotent: dropDuplicates on vec_id makes the ranking
    * side replay-safe). Returns the merged servable layer-0 edge list
    * as of this epoch. */
  def hnswDelta(batchIn: DataFrame, storeDir: String, epoch: Long): DataFrame = {
    // fail loudly if a compaction swap is in flight (r14 lease contract)
    graft.pipeline.StoreCompact.assertNotCompacting(storeDir)
    val s = batchIn.sparkSession
    val batch = batchIn.select(col("vec_id"), col("embedding")).cut()
    val savedVecs = s.read.parquet(s"$storeDir/vecs")
      .select(col("vec_id"), col("embedding"))
    val allVecs = savedVecs.union(batch).dropDuplicates("vec_id")
    // materialize BEFORE the store writes (a replayed epoch's saved side
    // still references the files the overwrite below replaces)
    val fresh0 = bucketedDeltaEdges(batch, allVecs, GraphAnnDegree).cut()
    val fresh1 = bucketedDeltaEdges(batch.filter(hnswCoin === 0),
      allVecs.filter(hnswCoin === 0), GraphAnnDegree).cut()
    def writeEpoch(df: DataFrame, sub: String): Unit =
      df.write.mode("overwrite").parquet(s"$storeDir/$sub/epoch=$epoch")
    writeEpoch(batch, "vecs")
    writeEpoch(fresh0, "l0")
    writeEpoch(fresh1, "l1")
    symCap(s.read.parquet(s"$storeDir/l0")
        .select(col("i"), col("j"), col("cosine")), GraphAnnDegree)
      .orderBy("i", "j")
  }

  /** One micro-batch of LEVEL-STACK index append (r12) — [[hnswDelta]]
    * generalized to the [[hnswMultiStoreSeed]] store: the delta ranks
    * label-free against saved ∪ delta on EVERY layer its coins admit
    * (layer ℓ slice = coins 1..ℓ zero — stateless, so the batch's
    * per-layer membership needs no store lookup), each layer's epoch
    * table lands in `l$ℓ/epoch=N` (replay-idempotent like the 2-layer
    * twin). Returns the merged servable layer-0 edge list. */
  def hnswMultiDelta(batchIn: DataFrame, storeDir: String, epoch: Long,
                     levels: Int = HnswMultiLevels): DataFrame = {
    // fail loudly if a compaction swap is in flight (r14 lease contract)
    graft.pipeline.StoreCompact.assertNotCompacting(storeDir)
    val s = batchIn.sparkSession
    val batch = batchIn.select(col("vec_id"), col("embedding")).cut()
    val savedVecs = s.read.parquet(s"$storeDir/vecs")
      .select(col("vec_id"), col("embedding"))
    val allVecs = savedVecs.union(batch).dropDuplicates("vec_id")
    // materialize every layer BEFORE the store writes (replay safety)
    val fresh = (0 to levels).map { l =>
      l -> bucketedDeltaEdges(hnswLayerSlice(batch, l),
        hnswLayerSlice(allVecs, l), GraphAnnDegree).cut()
    }
    def writeEpoch(df: DataFrame, sub: String): Unit =
      df.write.mode("overwrite").parquet(s"$storeDir/$sub/epoch=$epoch")
    writeEpoch(batch, "vecs")
    fresh.foreach { case (l, df) => writeEpoch(df, s"l$l") }
    symCap(s.read.parquet(s"$storeDir/l0")
        .select(col("i"), col("j"), col("cosine")), GraphAnnDegree)
      .orderBy("i", "j")
  }

  /** BATCH graph-ANN serving [N] (r11) — the graph leg's multi-probe
    * shape, completing the batch-serving story next to
    * `sim_search_batch` (exact) and `sim_search_ivf_batch` (IVF): ONE
    * label-free bucketed build amortized across a probe TABLE, every
    * walk frame keyed by `probe_id` so all probes descend in the same
    * plan — per-probe beams are `row_number() OVER (PARTITION BY
    * probe_id)` instead of the single-probe walk's global LIMIT, the
    * novisit rule is one left-anti join on (probe_id, vec_id), and the
    * probe batch broadcasts into every scoring stage. Per-probe work
    * keeps the single walk's bound (entries + steps × beam × 2·degree),
    * so the whole batch is linear in probes — the serving economics
    * graph ANN exists for (the graph is built or loaded ONCE; at 100 TB
    * probes arrive in batches of thousands and the walk frames stay
    * probes × bounded-visited rows). */
  def graphBatchSearch(corpusIn: DataFrame, probesIn: DataFrame,
                       degree: Int, rounds: Int, beamW: Int, steps: Int,
                       k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val raw = corpusIn.select(col("vec_id"), col("embedding"))
    val corpus = raw.select(col("vec_id"), col("embedding"),
      dot(col("embedding"), col("embedding")).as("nsq")).cut()
    val probes = probesIn.select(col("probe_id"), col("probe"),
      dot(col("probe"), col("probe")).as("pnsq")).cut()
    val graph = symCap(knnGraphBucketed(raw, degree, rounds), degree).cut()
    def scored(ids: DataFrame): DataFrame =
      ids.join(corpus, Seq("vec_id"))
        .join(broadcast(probes), Seq("probe_id"))
        .select(col("probe_id"), col("vec_id"),
          (dot(col("embedding"), col("probe")) /
            (sqrt(col("nsq")) * sqrt(col("pnsq")))).as("cosine"))
    val wBeam = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    var visited = scored(probes.select(col("probe_id"))
      .crossJoin(bucketEntries(raw))).cut()
    for (_ <- 1 to steps) {
      val beam = visited.withColumn("rnk", row_number().over(wBeam))
        .filter(col("rnk") <= beamW).select(col("probe_id"), col("vec_id"))
      val frontier = beam.withColumnRenamed("vec_id", "i")
        .join(graph, Seq("i"))
        .select(col("probe_id"), col("j").as("vec_id"))
        .distinct()
        .join(visited.select(col("probe_id"), col("vec_id")),
          Seq("probe_id", "vec_id"), "left_anti")
      visited = visited.union(scored(frontier)).cut()
    }
    visited.withColumn("rnk", row_number().over(wBeam))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("rnk"), col("vec_id"), col("cosine"))
      .orderBy("probe_id", "rnk")
  }

  private def graphBatch(s: SparkSession, d: String): DataFrame = {
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d)
    graphBatchSearch(
      e.filter(col("vec_id") >= 20),
      probeTable(e),
      GraphAnnDegree, NnDescentRounds, GraphAnnBeam, GraphAnnSteps, k = 10)
  }

  /** Generated oracle for [[graphBatch]]: the bucketed build over the
    * probe-free corpus, then [[GraphAnnSteps]] unrolled batch rounds —
    * per-probe beams by row_number, the novisit rule as NOT EXISTS. */
  private def graphBatchOracle: String = {
    val cos =
      s"""${dotSql.format("c.embedding", "pb.pe")}
         |        / (sqrt(${dotSql.format("c.embedding", "c.embedding")})
         |           * sqrt(pb.np))""".stripMargin
    val rounds = (1 to GraphAnnSteps).map { t =>
      s"""b${t - 1} AS MATERIALIZED (
         |  SELECT probe_id, vec_id FROM (
         |    SELECT probe_id, vec_id, row_number() OVER (
         |      PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS rnk
         |    FROM v${t - 1}) WHERE rnk <= $GraphAnnBeam),
         |f$t AS MATERIALIZED (
         |  SELECT DISTINCT b.probe_id, g.j AS vec_id
         |  FROM b${t - 1} b JOIN g ON g.i = b.vec_id
         |  WHERE NOT EXISTS (SELECT 1 FROM v${t - 1} v
         |    WHERE v.probe_id = b.probe_id AND v.vec_id = g.j)),
         |v$t AS MATERIALIZED (
         |  SELECT * FROM v${t - 1}
         |  UNION ALL
         |  SELECT f.probe_id, c.vec_id, $cos AS cosine
         |  FROM embeddings c JOIN f$t f ON c.vec_id = f.vec_id
         |       JOIN pb ON pb.probe_id = f.probe_id)""".stripMargin
    }.mkString(",\n")
    s"""WITH $lshWeightCtes,
       |${bucketedBuildCtes("", "embeddings WHERE vec_id >= 20")},
       |gu AS (
       |  SELECT DISTINCT i, j, c FROM (
       |    SELECT i, j, c FROM gk UNION ALL SELECT j AS i, i AS j, c FROM gk)),
       |g AS (
       |  SELECT i, j FROM (
       |    SELECT i, j, row_number() OVER (PARTITION BY i
       |      ORDER BY c DESC, j) AS rnk
       |    FROM gu) WHERE rnk <= ${2 * GraphAnnDegree}),
       |pb AS (
       |  SELECT vec_id AS probe_id, embedding AS pe,
       |         ${dotSql.format("embedding", "embedding")} AS np
       |  FROM embeddings WHERE vec_id < 20),
       |ent AS (
       |  SELECT min(vec_id) AS vec_id FROM bk1 GROUP BY bucket),
       |v0 AS (
       |  SELECT pb.probe_id, c.vec_id, $cos AS cosine
       |  FROM embeddings c JOIN ent ON c.vec_id = ent.vec_id, pb),
       |$rounds
       |SELECT probe_id, CAST(rnk AS INTEGER) AS rnk, vec_id, cosine FROM (
       |  SELECT probe_id, vec_id, cosine, row_number() OVER (
       |    PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS rnk
       |  FROM v$GraphAnnSteps) WHERE rnk <= 10
       |ORDER BY probe_id, rnk""".stripMargin
  }

  /** Brute-force top-k cosine neighbors of a probe vector (vec_id = 0):
    * broadcast single-row probe, TakeOrderedAndProject for the top-k. */
  private def cosineTopK(s: SparkSession, d: String): DataFrame = {
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d)
    val probe = e.filter(col("vec_id") === 0).select(col("embedding").as("probe"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"), cosine(col("embedding"), col("probe")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(10)
  }

  /** Matryoshka-style truncated serving [N]: the same exact top-k, but
    * on the FIRST 16 of 64 dimensions (MRL-trained embeddings front-
    * load information, so the prefix is the cheap serving tier — 4×
    * less compute and bandwidth per comparison at 100 TB scan scale).
    * Exact over the truncated space → fully oracle-checked; the
    * recall-vs-full-space tradeoff is SimSearchRecallSpec's concern. */
  private def truncatedTopK(s: SparkSession, d: String): DataFrame = {
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), expr("slice(embedding, 1, 16)").as("emb16"))
    val probe = e.filter(col("vec_id") === 0).select(col("emb16").as("probe"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"), cosine(col("emb16"), col("probe")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(10)
  }

  /** LSH-bucketed approximate NN — the data-oblivious hash path. 4
    * deterministic pseudo-random hyperplanes; bucket = sign bits (16
    * buckets); SCORED MULTI-PROBE (Lv et al., "Multi-Probe LSH",
    * VLDB'07): rank EVERY bucket by the summed projection magnitude of
    * the planes that would have to flip to reach it — the probe's own
    * bucket scores 0, near-margin flips score low — and visit the
    * `nprobe` cheapest. Blind single-bit flips measured recall@10 =
    * 0.5; the scored ranking reaches 0.9 at 9 visits (floor 0.8,
    * SimSearchRecallSpec). The md5 salt (`:lsh13`) was selected by a
    * cross-SF sweep (recall 0.9/1.0/0.8 at sf0.001/0.01/0.1) — with
    * data-oblivious planes the seed IS a quality knob, and an
    * unvalidated seed measured as low as 0.6. Still an equi-join on bucket id: at 100 TB
    * the probe side is a broadcast of (probe × nprobe buckets) rows and
    * the corpus is scanned once, bucket-pruned.
    *
    * [r9] HASH-CHECKED: hyperplane weights are md5-coin integers
    * (`hex8(md5(p_i:lsh)) % 2001 − 1000` — both engines regenerate the
    * matrix from nothing) and projections are exact longs on the
    * micro-unit grid, so buckets, flip scores, the probe ranking and
    * the final exact-cosine top-10 all mirror bit for bit in DuckDB —
    * the key graduated from rows-only to full hash_match.
    *
    * Hyperplane count: 2^P buckets. More planes = finer buckets = a
    * smaller corpus fraction per visit, at the cost of needing more
    * scored probes for the same recall. Measured on this corpus
    * (500-2000 vecs): 4 planes / 9 probes → recall 0.9 at 56%% of the
    * bucket space; 5 planes / 14 probes → 0.7 — data-oblivious planes
    * fragment the small corpus faster than the scored ranking can
    * recover, so 4 planes stays the shipped config. (For
    * partition-fraction economics at scale the LEARNED-centroid family
    * — ivf_kmeans / ivf_pq — is the real path; this key's job is the
    * data-oblivious hash-bucketed shape.) */
  private val ivfPlanes = 4
  private val ivfNprobe = 9

  /** Plane-p, dim-i hyperplane weight in [-1000, 1000] from the shared
    * md5-coin: `hex8(md5("p_i:lsh13")) % 2001 - 1000`. Computed ONCE on
    * the driver (the whole matrix is 4×64 ints) and inlined as a
    * literal array — per-row md5 in the scan would cost 256 digests per
    * vector for values that never change. The DuckDB oracle regenerates
    * the same matrix from md5 directly, proving the two derivations
    * agree. */
  private def lshWeightsFor(salt: String): Array[Array[Long]] =
    Array.tabulate(ivfPlanes, 64) { (p, i) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"${p}_$i:$salt".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % 2001L - 1000L
    }
  private lazy val lshWeights: Array[Array[Long]] = lshWeightsFor("lsh13")

  /** Adds `projs` (per-plane exact-integer projections of the 1e6-grid
    * vector against the literal [[lshWeights]] matrix — codegen folds it
    * into constants) and `bucket` (sign bits) to any relation with an
    * `embedding` column. `coalesce(x, 0L)` makes zip_with's padding
    * nulls contribute 0 for vectors shorter than 64 dims (same exact
    * integers for the 64-dim corpus), so the helper serves any
    * dimension — the bucketed graph build runs it over test fixtures. */
  private def withLshProjs(e: DataFrame, salt: String = "lsh13",
                           bucketCol: String = "bucket"): DataFrame = {
    val pMax = ivfPlanes - 1
    val gvSql = "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT))"
    val wLit = lshWeightsFor(salt).map(_.mkString("array(", "L,", "L)"))
      .mkString("array(", ",", ")")
    val projExpr = expr(
      s"""transform(sequence(0, $pMax), p ->
         |  aggregate(zip_with($gvSql, element_at($wLit, p + 1),
         |                     (x, w) -> coalesce(x, 0L) * w),
         |            0L, (acc, v) -> acc + v))""".stripMargin)
    e.withColumn("projs", projExpr)
      .withColumn(bucketCol, expr(
        s"""aggregate(sequence(0, $pMax), 0L, (acc, p) ->
           |  acc + IF(element_at(projs, p + 1) > 0, shiftleft(1L, p), 0L))""".stripMargin))
  }

  private def ivfTopK(s: SparkSession, d: String): DataFrame = {
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d)
    val pMax = ivfPlanes - 1
    val bMax = (1 << ivfPlanes) - 1
    val withProj = withLshProjs(e)
    // scored multiprobe: rank all 2^P buckets by exact-integer flip cost
    val probe = withProj.filter(col("vec_id") === 0)
      .select(explode(expr(
        s"""transform(
           |  slice(array_sort(transform(sequence(0, $bMax), bb -> struct(
           |          aggregate(sequence(0, $pMax), 0L, (acc, p) ->
           |            acc + IF((shiftright(CAST(bb AS BIGINT) ^ bucket, p) & 1) = 1,
           |                     abs(element_at(projs, p + 1)), 0L)) AS score,
           |          CAST(bb AS BIGINT) AS b))),
           |        1, $ivfNprobe),
           |  x -> x.b)""".stripMargin))
        .as("probe_bucket"),
        col("embedding").as("probe"))
    withProj.join(broadcast(probe), col("bucket") === col("probe_bucket"))
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("bucket"),
        cosine(col("embedding"), col("probe")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(10)
  }

  /** DuckDB mirror of the md5-coin scored-multiprobe LSH [r9]: the
    * weight matrix regenerates from the strpos hex polynomial, buckets
    * and flip scores are the same exact-long sums, the final cosine is
    * the bit-identical fold. */
  private def ivfLshOracle: String = {
    // hex8(md5(key)) via the strpos polynomial (DuckDB has no conv)
    def duckHex8(key: String): String =
      (0 until 8).map { i =>
        val f = 1L << (4 * (7 - i))
        s"(strpos('0123456789abcdef', substr(md5($key), ${i + 1}, 1)) - 1) * $f"
      }.mkString("(", "\n        + ", ")")
    val wkey = "CAST(pp.p AS VARCHAR) || '_' || CAST(ii.i AS VARCHAR) || ':lsh13'"
    s"""WITH w AS (
       |  SELECT pp.p, ii.i,
       |         ${duckHex8(wkey)} % 2001 - 1000 AS w
       |  FROM (SELECT unnest(range(0, $ivfPlanes)) AS p) pp,
       |       (SELECT unnest(range(0, 64)) AS i) ii),
       |g AS (
       |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
       |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1e6)
       |              AS BIGINT) AS gv
       |  FROM embeddings),
       |pr AS (
       |  SELECT g.vec_id, w.p, CAST(sum(g.gv * w.w) AS BIGINT) AS proj
       |  FROM g JOIN w ON g.i = w.i GROUP BY 1, 2),
       |bk AS (
       |  SELECT vec_id,
       |         CAST(sum(CASE WHEN proj > 0 THEN 1 << p ELSE 0 END)
       |              AS BIGINT) AS bucket
       |  FROM pr GROUP BY 1),
       |ppj AS (SELECT p, proj FROM pr WHERE vec_id = 0),
       |pbk AS (SELECT bucket AS pbucket FROM bk WHERE vec_id = 0),
       |sc AS (
       |  SELECT bb.bb,
       |         CAST(sum(CASE WHEN ((xor(CAST(bb.bb AS BIGINT), pbk.pbucket)
       |                               >> ppj.p) & 1) = 1
       |                       THEN abs(ppj.proj) ELSE 0 END) AS BIGINT) AS score
       |  FROM (SELECT unnest(range(0, ${1 << ivfPlanes})) AS bb) bb, pbk, ppj
       |  GROUP BY 1),
       |pbs AS (
       |  SELECT bb AS probe_bucket FROM (
       |    SELECT *, row_number() OVER (ORDER BY score, bb) AS rn FROM sc)
       |  WHERE rn <= $ivfNprobe),
       |p AS (SELECT embedding AS pe FROM embeddings WHERE vec_id = 0)
       |SELECT e.vec_id, bk.bucket,
       |       (${dotSql.format("e.embedding", "p.pe")}
       |        / (sqrt(${dotSql.format("e.embedding", "e.embedding")})
       |           * sqrt(${dotSql.format("p.pe", "p.pe")}))) AS cosine
       |FROM embeddings e
       |JOIN bk ON e.vec_id = bk.vec_id
       |JOIN pbs ON bk.bucket = pbs.probe_bucket
       |CROSS JOIN p
       |WHERE e.vec_id <> 0
       |ORDER BY cosine DESC, e.vec_id LIMIT 10""".stripMargin
  }

  /** IVF with LEARNED centroids — the production ANN shape (FAISS-style
    * IVF-Flat re-expressed in DataFrames): k-means cells instead of the
    * data-oblivious hyperplane buckets above.
    *
    * Training: Lloyd rounds, entirely distributed — assignment is a
    * broadcast join of the K-row centroid table (argmax affinity), the
    * update step is posexplode → per-(cell, dim) hash agg → array
    * reassembly; deterministic vec_id 1..K seeding. Since r9 ALL
    * learned-centroid keys run [[trainKmeansPinned]] (exact-decimal
    * sum-form centroids — cosine is scale-invariant, so sum-form
    * assignments are identical to mean-form) and are hash-checked; the
    * r6-era float-mean trainer, whose partition-order-sensitive
    * centroids forced rows-only checks, is gone.
    *
    * Serving: corpus assigned once (one broadcast join, map-side), probe
    * visits its `nprobe` highest-affinity cells — candidates are an
    * equi-join on cell id, never a cross join. At 100 TB: centroids are
    * a K-row broadcast, the cell assignment is a scan, and each query
    * touches nprobe/K of the corpus. */
  /** `sim_search_ivf_kmeans` [r9]: the learned-centroid IVF key now runs
    * the PINNED trainer (one more Lloyd round than `sim_search_ivf_pinned`
    * and a wider nprobe, so the two keys exercise different
    * configurations of the same machinery) and is hash-checked against a
    * generated DuckDB oracle — the r8 verdict's "regression invisible to
    * the driver" gap. */
  private def ivfKmeans(s: SparkSession, d: String): DataFrame =
    pinnedServe(s, d, iters = 3, nprobe = 6)

  // ---------------------------------------------------------------------
  // CROSS-ENGINE-DETERMINISTIC k-means (VERDICT r6 #3): Lloyd's iteration
  // pinned with the PageRank discipline so training is oracle-checkable.
  // ---------------------------------------------------------------------

  private val pinnedK = 16
  private val pinnedIters = 2

  /** Affinity of an embedding to a pinned (double[]) centroid:
    * `dot/(sqrt(na)*sqrt(nc))` with sequential in-array-order double
    * accumulation — the exact shape VectorFunctionsSpec proves
    * bit-identical to the DuckDB parallel-unnest sum. */
  private def pinnedAffinity(emb: Column, cvec: Column): Column = {
    val d = aggregate(zip_with(emb, cvec, (x, c) => x.cast("double") * c),
      lit(0.0), (acc, v) => acc + v)
    val na = aggregate(emb, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double"))
    val nc = aggregate(cvec, lit(0.0), (acc, c) => acc + c * c)
    d / (sqrt(na) * sqrt(nc))
  }

  /** One pinned assignment pass: argmax affinity, ties to the lower cid
    * (identical doubles on both engines make the argmax exact). */
  private def pinnedAssign(vecs: DataFrame, centroids: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("embedding"), col("cid"),
        pinnedAffinity(col("embedding"), col("cvec")).as("aff"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"), struct(col("aff"), -col("cid"))).as("cell"))

  /** Lloyd training that HASH-MATCHES a DuckDB oracle (the discipline
    * proven on PageRank, applied to ANN training). Two pins make every
    * bit deterministic:
    *
    *  1. Each embedding component is rounded to an 8dp DECIMAL before
    *     the per-(cell, dim) sum, so the sum is exact and
    *     order-invariant, and its double conversion is exact too
    *     (|v| < 1 ⇒ unscaled sum < 2^53 even at 10^9 members).
    *  2. The centroid is kept in the mergeable **(sum, count)** form —
    *     the mean is NEVER materialized. Cosine affinity is invariant
    *     to positive per-vector scaling, so assigning against the
    *     sum-vector gives byte-identical assignments to the
    *     mean-vector — while dodging the one non-deterministic step:
    *     rounding `sum/count` ties (a power-of-two count makes the
    *     exact mean terminate in a trailing 5 at the pin precision,
    *     and Spark's BigDecimal-expansion bround and DuckDB's
    *     multiply-based round_even resolve that double tie
    *     differently — observed on 10/1024 components at 12dp).
    *
    * Plan shape: broadcast assignment join + posexplode hash-agg per
    * round, lineage cut by localCheckpoint. */
  def trainKmeansPinned(vecs: DataFrame, k: Int, lloydIters: Int): DataFrame = {
    var centroids = vecs.filter(col("vec_id").between(1, k))
      .select(col("vec_id").as("cid"),
        transform(col("embedding"),
          x => bround(x.cast("double"), 8)).as("cvec"),
        lit(1L).as("n_members"))
    (1 to lloydIters).foreach { _ =>
      val assigned = pinnedAssign(vecs, centroids)
        .join(vecs, Seq("vec_id"))
      centroids = assigned
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(bround(col("v").cast("double"), 8).cast("decimal(20,8)"))
            .cast("double").as("m"),
          count(lit(1)).as("cnt"))
        .groupBy(col("cell"))
        .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("dims"),
          max(col("cnt")).as("n_members"))
        .select(col("cell").as("cid"),
          transform(col("dims"), x => x.getField("m")).as("cvec"),
          col("n_members"))
        .cut() // cut lineage: next round replans from here
    }
    centroids
  }

  /** Oracle-checked k-means ASSIGNMENTS: the final cell of every vector
    * under the pinned training — a real hash_match row for the IVF
    * family's training step. */
  private def kmeansAssign(s: SparkSession, d: String): DataFrame = {
    val vecs = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val centroids = trainKmeansPinned(vecs, pinnedK, pinnedIters)
    pinnedAssign(vecs, centroids)
      .select(col("vec_id"), col("cell"))
      .orderBy("vec_id")
  }

  /** Oracle-checked k-means CENTROIDS in the mergeable (sum, count)
    * form: (cid, pos, s_sum, n_members) — s_sum the exact per-dimension
    * decimal sum as a double, n_members the cell population. The mean is
    * s_sum / n_members; keeping the quotient unevaluated is what makes
    * the row hash-exact (see [[trainKmeansPinned]]) and is the same
    * combiner-form representation the sketch rollups use. */
  private def kmeansCentroids(s: SparkSession, d: String): DataFrame =
    trainKmeansPinned(
      Tables.embeddings(s, d).select(col("vec_id"), col("embedding")),
      pinnedK, pinnedIters)
      .select(col("cid"), col("n_members"),
        posexplode(col("cvec")).as(Seq("pos", "s_sum")))
      .select(col("cid"), col("pos").cast("int").as("pos"), col("s_sum"),
        col("n_members"))
      .orderBy("cid", "pos")

  /** The FULL IVF serving path, oracle-checked end to end [r7]: pinned
    * deterministic training ([[trainKmeansPinned]]) makes the cell
    * structure hash-exact, and the final candidate ranking is plain
    * cosine between stored floats (bit-identical ordered folds) — so
    * the entire ANN query (train → assign → probe nprobe cells → exact
    * cosine top-k) matches a DuckDB oracle bit for bit — the discipline
    * that, since r9, carries the whole ANN family. Plan shape: K-row
    * centroid broadcasts, nprobe-cell equi-join, bounded top-k. */
  private def ivfPinnedServe(s: SparkSession, d: String): DataFrame =
    pinnedServe(s, d, iters = pinnedIters, nprobe = 4)

  private def pinnedServe(s: SparkSession, d: String,
                          iters: Int, nprobe: Int): DataFrame = {
    val vecs = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val centroids = trainKmeansPinned(vecs, pinnedK, iters)
    val cells = pinnedAssign(vecs, centroids).join(vecs, Seq("vec_id"))
    val probeVec = vecs.filter(col("vec_id") === 0)
      .select(col("embedding").as("probe"))
    val probeCells = probeVec.crossJoin(broadcast(centroids))
      .select(col("cid"), col("probe"),
        pinnedAffinity(col("probe"), col("cvec")).as("aff"))
      .orderBy(col("aff").desc, col("cid"))
      .limit(nprobe)
      .select(col("cid").as("probe_cell"), col("probe"))
    cells.join(broadcast(probeCells), col("cell") === col("probe_cell"))
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("cell"),
        pinnedAffinity(col("embedding"),
          transform(col("probe"), x => x.cast("double"))).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(10)
  }

  /** The generated DuckDB mirror: Lloyd rounds unrolled as chained CTEs
    * (the PageRank-oracle discipline). Affinity is the parallel-unnest
    * ordered sum; the argmax tiebreak is `ROW_NUMBER() ... ORDER BY aff
    * DESC, cid`; the mean pins mirror bround↔round_even verbatim. */
  private def kmeansOracle(finalSelect: String,
                           iters: Int = pinnedIters,
                           trainWhere: String = ""): String = {
    def affinity(e: String, c: String): String =
      s"""((SELECT sum(CAST(u.x AS DOUBLE) * u.y)
         |  FROM (SELECT unnest($e) AS x, unnest($c) AS y) u)
         | / (sqrt((SELECT sum(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE))
         |          FROM (SELECT unnest($e) AS x) u))
         |    * sqrt((SELECT sum(u.y * u.y)
         |            FROM (SELECT unnest($c) AS y) u))))""".stripMargin
    val base =
      s"""WITH vecs AS (SELECT vec_id, embedding FROM embeddings),
         |tvecs AS (SELECT vec_id, embedding FROM vecs $trainWhere),
         |c0 AS (
         |  SELECT vec_id AS cid,
         |         list_transform(embedding,
         |           x -> round_even(CAST(x AS DOUBLE), 8)) AS cvec
         |  FROM tvecs WHERE vec_id BETWEEN 1 AND $pinnedK)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""aff$i AS (
         |  SELECT v.vec_id, v.embedding, c.cid,
         |         ${affinity("v.embedding", "c.cvec")} AS aff
         |  FROM tvecs v CROSS JOIN c${i - 1} c),
         |asg$i AS (
         |  SELECT vec_id, embedding, cid AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |                                 ORDER BY aff DESC, cid) AS rn
         |    FROM aff$i) WHERE rn = 1),
         |comp$i AS (
         |  SELECT cell, generate_subscripts(embedding, 1) - 1 AS pos,
         |         unnest(embedding) AS v
         |  FROM asg$i),
         |mean$i AS (
         |  SELECT cell, pos,
         |         CAST(sum(CAST(round_even(CAST(v AS DOUBLE), 8)
         |                       AS DECIMAL(20,8))) AS DOUBLE) AS m,
         |         count(*) AS cnt
         |  FROM comp$i GROUP BY cell, pos),
         |c$i AS (
         |  SELECT cell AS cid, list(m ORDER BY pos) AS cvec
         |  FROM mean$i GROUP BY cell)""".stripMargin
    }.mkString(",\n")
    s"$base,\n$rounds\n$finalSelect"
  }

  private def kmeansAssignOracle: String = kmeansOracle(
    s""", affF AS (
       |  SELECT v.vec_id, c.cid,
       |         ((SELECT sum(CAST(u.x AS DOUBLE) * u.y)
       |           FROM (SELECT unnest(v.embedding) AS x,
       |                        unnest(c.cvec) AS y) u)
       |          / (sqrt((SELECT sum(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE))
       |                   FROM (SELECT unnest(v.embedding) AS x) u))
       |             * sqrt((SELECT sum(u.y * u.y)
       |                     FROM (SELECT unnest(c.cvec) AS y) u)))) AS aff
       |  FROM vecs v CROSS JOIN c$pinnedIters c)
       |SELECT vec_id, cid AS cell FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |                               ORDER BY aff DESC, cid) AS rn
       |  FROM affF) WHERE rn = 1
       |ORDER BY vec_id""".stripMargin)

  private def pinnedServeOracle(iters: Int, nprobe: Int): String = kmeansOracle(
    s""", affF AS (
       |  SELECT v.vec_id, c.cid,
       |         ((SELECT sum(CAST(u.x AS DOUBLE) * u.y)
       |           FROM (SELECT unnest(v.embedding) AS x,
       |                        unnest(c.cvec) AS y) u)
       |          / (sqrt((SELECT sum(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE))
       |                   FROM (SELECT unnest(v.embedding) AS x) u))
       |             * sqrt((SELECT sum(u.y * u.y)
       |                     FROM (SELECT unnest(c.cvec) AS y) u)))) AS aff
       |  FROM vecs v CROSS JOIN c$iters c),
       |asgF AS (
       |  SELECT vec_id, cid AS cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |                                 ORDER BY aff DESC, cid) AS rn
       |    FROM affF) WHERE rn = 1),
       |p AS (SELECT embedding AS pe FROM vecs WHERE vec_id = 0),
       |pc AS (
       |  SELECT cid AS probe_cell FROM (
       |    SELECT c.cid, row_number() OVER (ORDER BY
       |      ((SELECT sum(CAST(u.x AS DOUBLE) * u.y)
       |        FROM (SELECT unnest(p.pe) AS x, unnest(c.cvec) AS y) u)
       |       / (sqrt((SELECT sum(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE))
       |                FROM (SELECT unnest(p.pe) AS x) u))
       |          * sqrt((SELECT sum(u.y * u.y)
       |                  FROM (SELECT unnest(c.cvec) AS y) u)))) DESC,
       |      c.cid) AS rn
       |    FROM c$iters c CROSS JOIN p) WHERE rn <= $nprobe),
       |served AS (
       |  SELECT v.vec_id, a.cell,
       |         ((SELECT sum(CAST(u.x AS DOUBLE) * CAST(u.y AS DOUBLE))
       |           FROM (SELECT unnest(v.embedding) AS x,
       |                        unnest(p.pe) AS y) u)
       |          / (sqrt((SELECT sum(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE))
       |                   FROM (SELECT unnest(v.embedding) AS x) u))
       |             * sqrt((SELECT sum(CAST(u.y AS DOUBLE) * CAST(u.y AS DOUBLE))
       |                     FROM (SELECT unnest(p.pe) AS y) u)))) AS cosine
       |  FROM vecs v JOIN asgF a ON v.vec_id = a.vec_id
       |  JOIN pc ON a.cell = pc.probe_cell
       |  CROSS JOIN p
       |  WHERE v.vec_id <> 0)
       |SELECT vec_id, cell, cosine FROM served
       |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin, iters)

  /** Generated DuckDB mirror of the pinned BATCH serving path [r9]:
    * Lloyd chain from [[kmeansOracle]], probe table `vec_id < 20`,
    * per-probe nprobe-cell rank, candidate join, per-probe top-10 by
    * the bit-identical cosine. Also the `sim_search_ivf_saved` oracle:
    * the saved index round-trips doubles exactly, so serving from files
    * must equal serving in memory — that equality IS the check. */
  private def pinnedBatchOracle(iters: Int, nprobe: Int,
                                trainWhere: String = ""): String = kmeansOracle(
    s""", affF AS (
       |  SELECT v.vec_id, c.cid,
       |         ((SELECT sum(CAST(u.x AS DOUBLE) * u.y)
       |           FROM (SELECT unnest(v.embedding) AS x,
       |                        unnest(c.cvec) AS y) u)
       |          / (sqrt((SELECT sum(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE))
       |                   FROM (SELECT unnest(v.embedding) AS x) u))
       |             * sqrt((SELECT sum(u.y * u.y)
       |                     FROM (SELECT unnest(c.cvec) AS y) u)))) AS aff
       |  FROM vecs v CROSS JOIN c$iters c),
       |asgF AS (
       |  SELECT vec_id, cid AS cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |                                 ORDER BY aff DESC, cid) AS rn
       |    FROM affF) WHERE rn = 1),
       |probes AS (SELECT vec_id AS probe_id, embedding AS pe
       |           FROM vecs WHERE vec_id < 20),
       |paff AS (
       |  SELECT p.probe_id, c.cid,
       |         ((SELECT sum(CAST(u.x AS DOUBLE) * u.y)
       |           FROM (SELECT unnest(p.pe) AS x, unnest(c.cvec) AS y) u)
       |          / (sqrt((SELECT sum(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE))
       |                   FROM (SELECT unnest(p.pe) AS x) u))
       |             * sqrt((SELECT sum(u.y * u.y)
       |                     FROM (SELECT unnest(c.cvec) AS y) u)))) AS aff
       |  FROM probes p CROSS JOIN c$iters c),
       |pcells AS (
       |  SELECT probe_id, cid AS probe_cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY probe_id
       |                                 ORDER BY aff DESC, cid) AS rn
       |    FROM paff) WHERE rn <= $nprobe),
       |cand AS (
       |  SELECT pr.probe_id, v.vec_id,
       |         ((SELECT sum(CAST(u.x AS DOUBLE) * CAST(u.y AS DOUBLE))
       |           FROM (SELECT unnest(v.embedding) AS x,
       |                        unnest(pr.pe) AS y) u)
       |          / (sqrt((SELECT sum(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE))
       |                   FROM (SELECT unnest(v.embedding) AS x) u))
       |             * sqrt((SELECT sum(CAST(u.y AS DOUBLE) * CAST(u.y AS DOUBLE))
       |                     FROM (SELECT unnest(pr.pe) AS y) u)))) AS cosine
       |  FROM vecs v JOIN asgF a ON v.vec_id = a.vec_id
       |  JOIN pcells pc ON a.cell = pc.probe_cell
       |  JOIN probes pr ON pr.probe_id = pc.probe_id
       |  WHERE v.vec_id <> pr.probe_id)
       |SELECT probe_id, CAST(rn AS INTEGER) AS rnk, vec_id, cosine FROM (
       |  SELECT *, row_number() OVER (PARTITION BY probe_id
       |                               ORDER BY cosine DESC, vec_id) AS rn
       |  FROM cand) WHERE rn <= 10
       |ORDER BY probe_id, rnk""".stripMargin, iters, trainWhere)

  /** Generated DuckDB mirror of the integer-grid PQ pipeline [r9]: the
    * micro-unit grid, per-subspace Lloyd rounds (exact-integer L2
    * argmin, floor-pinned means), encode, exact-integer ADC, and the
    * bit-identical cosine rerank — unrolled as chained CTEs over the
    * exploded (vec, sub, spos) relation. */
  /** Shared train+encode CTE chain of the PQ oracles (grid → `iters`
    * Lloyd rounds → `enc` code table) — the batch oracle appends a
    * per-probe serve section, the single-probe oracle its original. */
  private def pqTrainCtes(m: Int, k: Int, iters: Int): String = {
    val subDim = 64 / m
    val base =
      s"""WITH gg AS (
         |  SELECT vec_id,
         |         CAST((generate_subscripts(embedding, 1) - 1) // $subDim
         |              AS INTEGER) AS sub,
         |         CAST((generate_subscripts(embedding, 1) - 1) % $subDim
         |              AS INTEGER) AS spos,
         |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1e6)
         |              AS BIGINT) AS gv
         |  FROM embeddings),
         |q0 AS (
         |  SELECT sub, CAST(vec_id - 1 AS INTEGER) AS cid, spos, gv AS mg
         |  FROM gg WHERE vec_id BETWEEN 1 AND $k)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""qd$i AS (
         |  SELECT g.vec_id, g.sub, c.cid,
         |         CAST(sum((g.gv - c.mg) * (g.gv - c.mg)) AS BIGINT) AS d2
         |  FROM gg g JOIN q${i - 1} c ON g.sub = c.sub AND g.spos = c.spos
         |  GROUP BY 1, 2, 3),
         |qa$i AS (
         |  SELECT vec_id, sub, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub
         |                                 ORDER BY d2, cid) AS rn
         |    FROM qd$i) WHERE rn = 1),
         |q$i AS (
         |  SELECT g.sub, a.cid, g.spos,
         |         CAST(floor(CAST(sum(g.gv) AS DOUBLE) / count(*))
         |              AS BIGINT) AS mg
         |  FROM gg g JOIN qa$i a ON g.vec_id = a.vec_id AND g.sub = a.sub
         |  GROUP BY 1, 2, 3)""".stripMargin
    }.mkString(",\n")
    val encode =
      s"""qdF AS (
         |  SELECT g.vec_id, g.sub, c.cid,
         |         CAST(sum((g.gv - c.mg) * (g.gv - c.mg)) AS BIGINT) AS d2
         |  FROM gg g JOIN q$iters c ON g.sub = c.sub AND g.spos = c.spos
         |  GROUP BY 1, 2, 3),
         |enc AS (
         |  SELECT vec_id, sub, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub
         |                                 ORDER BY d2, cid) AS rn
         |    FROM qdF) WHERE rn = 1)""".stripMargin
    s"$base,\n$rounds,\n$encode"
  }

  private def pqOracle(m: Int, k: Int, iters: Int, rerank: Int): String = {
    val serve =
      s"""pg AS (SELECT sub, spos, gv FROM gg WHERE vec_id = 0),
         |tab AS (
         |  SELECT c.sub, c.cid, CAST(sum(p2.gv * c.mg) AS BIGINT) AS pdot
         |  FROM q$iters c JOIN pg p2 ON c.sub = p2.sub AND c.spos = p2.spos
         |  GROUP BY 1, 2),
         |ad AS (
         |  SELECT e.vec_id, CAST(sum(t.pdot) AS BIGINT) AS approx_dot
         |  FROM enc e JOIN tab t ON e.sub = t.sub AND e.cid = t.cid
         |  WHERE e.vec_id <> 0 GROUP BY 1),
         |nrm AS (
         |  SELECT vec_id,
         |         sqrt(${dotSql.format("n0.embedding", "n0.embedding")})
         |           AS vnorm
         |  FROM embeddings n0),
         |cand AS (
         |  SELECT ad.vec_id
         |  FROM ad JOIN nrm n ON ad.vec_id = n.vec_id
         |  ORDER BY CAST(ad.approx_dot AS DOUBLE) / n.vnorm DESC, ad.vec_id
         |  LIMIT $rerank),
         |p AS (SELECT embedding AS pe FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id,
         |       (${dotSql.format("e.embedding", "p.pe")}
         |        / (sqrt(${dotSql.format("e.embedding", "e.embedding")})
         |           * sqrt(${dotSql.format("p.pe", "p.pe")}))) AS cosine
         |FROM embeddings e JOIN cand ON e.vec_id = cand.vec_id
         |CROSS JOIN p
         |ORDER BY cosine DESC, e.vec_id LIMIT 10""".stripMargin
    s"${pqTrainCtes(m, k, iters)},\n$serve"
  }

  /** Generated DuckDB mirror of [[pqBatchTopK]]: the shared train/encode
    * chain plus a PER-PROBE serve — probe grids, per-probe ADC tables,
    * per-probe candidate rank, exact rerank — every window partitioned
    * by probe_id, mirroring the Spark side term for term. */
  private def pqBatchOracle(m: Int, k: Int, iters: Int,
                            rerank: Int): String = {
    val serve =
      s"""pgB AS (SELECT vec_id AS probe_id, sub, spos, gv
         |        FROM gg WHERE vec_id < 20),
         |tabB AS (
         |  SELECT p2.probe_id, c.sub, c.cid,
         |         CAST(sum(p2.gv * c.mg) AS BIGINT) AS pdot
         |  FROM q$iters c JOIN pgB p2 ON c.sub = p2.sub AND c.spos = p2.spos
         |  GROUP BY 1, 2, 3),
         |adB AS (
         |  SELECT t.probe_id, e.vec_id, CAST(sum(t.pdot) AS BIGINT) AS approx_dot
         |  FROM enc e JOIN tabB t ON e.sub = t.sub AND e.cid = t.cid
         |  WHERE e.vec_id <> t.probe_id GROUP BY 1, 2),
         |nrm AS (
         |  SELECT vec_id,
         |         sqrt(${dotSql.format("n0.embedding", "n0.embedding")})
         |           AS vnorm
         |  FROM embeddings n0),
         |candB AS (
         |  SELECT probe_id, vec_id FROM (
         |    SELECT ad.probe_id, ad.vec_id,
         |           row_number() OVER (PARTITION BY ad.probe_id
         |             ORDER BY CAST(ad.approx_dot AS DOUBLE) / n.vnorm DESC,
         |                      ad.vec_id) AS rn
         |    FROM adB ad JOIN nrm n ON ad.vec_id = n.vec_id)
         |  WHERE rn <= $rerank),
         |probesB AS (SELECT vec_id AS probe_id, embedding AS pe
         |            FROM embeddings WHERE vec_id < 20),
         |rr AS (
         |  SELECT c.probe_id, e.vec_id,
         |         (${dotSql.format("e.embedding", "pr.pe")}
         |          / (sqrt(${dotSql.format("e.embedding", "e.embedding")})
         |             * sqrt(${dotSql.format("pr.pe", "pr.pe")}))) AS cosine
         |  FROM embeddings e JOIN candB c ON e.vec_id = c.vec_id
         |  JOIN probesB pr ON pr.probe_id = c.probe_id)
         |SELECT probe_id, CAST(rn AS INTEGER) AS rnk, vec_id, cosine FROM (
         |  SELECT *, row_number() OVER (PARTITION BY probe_id
         |                               ORDER BY cosine DESC, vec_id) AS rn
         |  FROM rr) WHERE rn <= 10
         |ORDER BY probe_id, rnk""".stripMargin
    s"${pqTrainCtes(m, k, iters)},\n$serve"
  }

  /** Generated DuckDB mirror of the residual IVF+PQ pipeline [r9]:
    * [[kmeansOracle]]'s pinned Lloyd chain supplies the coarse cells
    * (asgF) and exact (sum, count) means; the residual
    * grid, per-subspace codebook rounds, ADC (probe·cellmean constant +
    * residual table), candidate rank, and exact rerank mirror
    * [[ivfPqTopKPinned]] term for term. */
  private def ivfPqOracle(kmIters: Int, nprobe: Int, m: Int, kCodes: Int,
                          pqIters: Int, rerank: Int): String = {
    val subDim = 64 / m
    val coarse =
      s""", affF AS (
         |  SELECT v.vec_id, c.cid,
         |         ((SELECT sum(CAST(u.x AS DOUBLE) * u.y)
         |           FROM (SELECT unnest(v.embedding) AS x,
         |                        unnest(c.cvec) AS y) u)
         |          / (sqrt((SELECT sum(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE))
         |                   FROM (SELECT unnest(v.embedding) AS x) u))
         |             * sqrt((SELECT sum(u.y * u.y)
         |                     FROM (SELECT unnest(c.cvec) AS y) u)))) AS aff
         |  FROM vecs v CROSS JOIN c$kmIters c),
         |asgF AS (
         |  SELECT vec_id, cid AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |                                 ORDER BY aff DESC, cid) AS rn
         |    FROM affF) WHERE rn = 1),
         |cm AS (
         |  SELECT cell AS cid, pos,
         |         CAST(floor(m * 1e6 / cnt) AS BIGINT) AS cmg
         |  FROM mean$kmIters),
         |gg0 AS (
         |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
         |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1e6)
         |              AS BIGINT) AS gv
         |  FROM vecs),
         |rg AS (
         |  SELECT g.vec_id,
         |         CAST(g.pos // $subDim AS INTEGER) AS sub,
         |         CAST(g.pos % $subDim AS INTEGER) AS spos,
         |         g.gv - c.cmg AS gv
         |  FROM gg0 g JOIN asgF a ON g.vec_id = a.vec_id
         |  JOIN cm c ON c.cid = a.cell AND c.pos = g.pos),
         |q0 AS (
         |  SELECT sub, CAST(vec_id - 1 AS INTEGER) AS cid, spos, gv AS mg
         |  FROM rg WHERE vec_id BETWEEN 1 AND $kCodes)""".stripMargin
    val rounds = (1 to pqIters).map { i =>
      s"""qd$i AS (
         |  SELECT g.vec_id, g.sub, c.cid,
         |         CAST(sum((g.gv - c.mg) * (g.gv - c.mg)) AS BIGINT) AS d2
         |  FROM rg g JOIN q${i - 1} c ON g.sub = c.sub AND g.spos = c.spos
         |  GROUP BY 1, 2, 3),
         |qa$i AS (
         |  SELECT vec_id, sub, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub
         |                                 ORDER BY d2, cid) AS rn
         |    FROM qd$i) WHERE rn = 1),
         |q$i AS (
         |  SELECT g.sub, a.cid, g.spos,
         |         CAST(floor(CAST(sum(g.gv) AS DOUBLE) / count(*))
         |              AS BIGINT) AS mg
         |  FROM rg g JOIN qa$i a ON g.vec_id = a.vec_id AND g.sub = a.sub
         |  GROUP BY 1, 2, 3)""".stripMargin
    }.mkString(",\n")
    val serve =
      s"""qdF AS (
         |  SELECT g.vec_id, g.sub, c.cid,
         |         CAST(sum((g.gv - c.mg) * (g.gv - c.mg)) AS BIGINT) AS d2
         |  FROM rg g JOIN q$pqIters c ON g.sub = c.sub AND g.spos = c.spos
         |  GROUP BY 1, 2, 3),
         |enc AS (
         |  SELECT vec_id, sub, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub
         |                                 ORDER BY d2, cid) AS rn
         |    FROM qdF) WHERE rn = 1),
         |pg AS (SELECT pos, gv FROM gg0 WHERE vec_id = 0),
         |pcell AS (
         |  SELECT cid AS cell FROM (
         |    SELECT c.cid, row_number() OVER (ORDER BY
         |      ((SELECT sum(CAST(u.x AS DOUBLE) * u.y)
         |        FROM (SELECT unnest(p2.pe) AS x, unnest(c.cvec) AS y) u)
         |       / (sqrt((SELECT sum(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE))
         |                FROM (SELECT unnest(p2.pe) AS x) u))
         |          * sqrt((SELECT sum(u.y * u.y)
         |                  FROM (SELECT unnest(c.cvec) AS y) u)))) DESC,
         |      c.cid) AS rn
         |    FROM c$kmIters c CROSS JOIN
         |      (SELECT embedding AS pe FROM vecs WHERE vec_id = 0) p2)
         |  WHERE rn <= $nprobe),
         |pdc AS (
         |  SELECT pc.cell, CAST(sum(g.gv * c.cmg) AS BIGINT) AS pdotc
         |  FROM pcell pc JOIN cm c ON c.cid = pc.cell
         |  JOIN pg g ON g.pos = c.pos
         |  GROUP BY 1),
         |pgs AS (
         |  SELECT CAST(pos // $subDim AS INTEGER) AS sub,
         |         CAST(pos % $subDim AS INTEGER) AS spos, gv
         |  FROM pg),
         |tab AS (
         |  SELECT q.sub, q.cid, CAST(sum(p3.gv * q.mg) AS BIGINT) AS pdot
         |  FROM q$pqIters q JOIN pgs p3
         |    ON q.sub = p3.sub AND q.spos = p3.spos
         |  GROUP BY 1, 2),
         |ad AS (
         |  SELECT e.vec_id,
         |         CAST(pd.pdotc + sum(t.pdot) AS BIGINT) AS approx_dot
         |  FROM enc e JOIN asgF a ON e.vec_id = a.vec_id
         |  JOIN pdc pd ON pd.cell = a.cell
         |  JOIN tab t ON e.sub = t.sub AND e.cid = t.cid
         |  WHERE e.vec_id <> 0
         |  GROUP BY e.vec_id, pd.pdotc),
         |nrm AS (
         |  SELECT vec_id,
         |         sqrt(${dotSql.format("n0.embedding", "n0.embedding")})
         |           AS vnorm
         |  FROM vecs n0),
         |cand AS (
         |  SELECT ad.vec_id
         |  FROM ad JOIN nrm n ON ad.vec_id = n.vec_id
         |  ORDER BY CAST(ad.approx_dot AS DOUBLE) / n.vnorm DESC, ad.vec_id
         |  LIMIT $rerank),
         |p AS (SELECT embedding AS pe FROM vecs WHERE vec_id = 0)
         |SELECT e.vec_id,
         |       (${dotSql.format("e.embedding", "p.pe")}
         |        / (sqrt(${dotSql.format("e.embedding", "e.embedding")})
         |           * sqrt(${dotSql.format("p.pe", "p.pe")}))) AS cosine
         |FROM vecs e JOIN cand ON e.vec_id = cand.vec_id
         |CROSS JOIN p
         |ORDER BY cosine DESC, e.vec_id LIMIT 10""".stripMargin
    kmeansOracle(s"$coarse,\n$rounds,\n$serve", kmIters)
  }

  private def kmeansCentroidsOracle: String = kmeansOracle(
    s"""SELECT cell AS cid, CAST(pos AS INTEGER) AS pos, m AS s_sum,
       |       CAST(cnt AS BIGINT) AS n_members
       |FROM mean$pinnedIters
       |ORDER BY cid, pos""".stripMargin)

  /** Shared tail for the batch servers: explode each probe's bounded
    * neighbor list into (probe_id, rnk, vec_id, cosine) rows. */
  private def explodeTopK(grouped: DataFrame): DataFrame =
    grouped
      .select(col("probe_id"), posexplode(col("nn")).as(Seq("pos", "e")))
      .select(col("probe_id"), (col("pos") + 1).cast("int").as("rnk"),
        col("e.id").as("vec_id"), col("e.ord").as("cosine"))
      .orderBy("probe_id", "rnk")

  /** Brute-force BATCH top-k (VERDICT r3 #2): top `topK` cosine neighbors
    * for EVERY probe in `probes` (probe_id, probe) in one pass. The probe
    * table broadcasts against the corpus scan, and the per-probe top-k is
    * the bounded [[graft.functions.TopKByAgg]] — partial top-k lists
    * combine map-side, so the exchange carries `partitions × probes × k`
    * buffer rows, never the `probes × corpus` scored rows that the window
    * `row_number() <= k` formulation would shuffle. At 100 TB: one corpus
    * scan per probe batch, shuffle bounded by the answer size. */
  def batchTopK(e: DataFrame, probes: DataFrame, topK: Int = 10): DataFrame = {
    val scored = e.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        cosine(col("embedding"), col("probe")).as("cosine"))
    explodeTopK(scored.groupBy(col("probe_id"))
      .agg(VectorFunctions.topk_by(col("cosine"), col("vec_id"), topK).as("nn")))
  }

  /** k-means IVF BATCH serving: every probe is routed to its `nprobe`
    * highest-affinity cells (window rank over the probe × K-row centroid
    * broadcast — linear in probes), candidates come from ONE equi-join of
    * the cell-assigned corpus with the exploded (probe, cell) pairs, and
    * the per-probe top-k is the same bounded map-side aggregate as
    * [[batchTopK]] — each probe touches ~nprobe/k of the corpus.
    * [r9] Probe-cell routing is [[pinnedAffinity]] against the pinned
    * centroid table and the candidate cosine is the bit-exact codegen
    * fold, so every step is cross-engine deterministic and the batch
    * and saved-index keys are hash-checked. */
  private def servePinnedBatch(cells: DataFrame, centroids: DataFrame,
                               probes: DataFrame, nprobe: Int,
                               topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val probeCells = probes.crossJoin(broadcast(centroids))
      .select(col("probe_id"), col("probe"), col("cid"),
        pinnedAffinity(col("probe"), col("cvec")).as("aff"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("probe_id")).orderBy(col("aff").desc, col("cid"))))
      .filter(col("rnk") <= nprobe)
      .select(col("probe_id"), col("cid").as("probe_cell"), col("probe"))
    val scored = cells.join(broadcast(probeCells),
        col("cell") === col("probe_cell") && col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        cosine(col("embedding"), col("probe")).as("cosine"))
    explodeTopK(scored.groupBy(col("probe_id"))
      .agg(VectorFunctions.topk_by(col("cosine"), col("vec_id"), topK).as("nn")))
  }

  /** Index BUILD/SERVE split — the production ANN lifecycle: train once,
    * persist centroids + cell-assigned corpus as parquet, serve many
    * probe batches from the saved index without retraining. The index
    * layout is two plain parquet tables (no bespoke format): `centroids`
    * (cid, cvec, n_members) — K rows, broadcast at serve time — and
    * `cells` (cell, vec_id, embedding), written partitioned by cell so a
    * probe's nprobe cells prune to nprobe directories at scan time.
    * Persisted centroids are the exact-decimal sum-form doubles (parquet
    * round-trips them bit-exactly), cells come from [[pinnedAssign]] —
    * so serving from the saved index is hash-identical to serving in
    * memory, and BOTH are oracle-checked. */
  def buildIvfIndexPinned(e: DataFrame, dir: String, k: Int = pinnedK,
                          lloydIters: Int = pinnedIters): Unit = {
    val vecs = e.select(col("vec_id"), col("embedding"))
    val centroids = trainKmeansPinned(vecs, k, lloydIters)
    centroids.write.mode("overwrite").parquet(s"$dir/centroids")
    pinnedAssign(vecs, centroids).join(vecs, Seq("vec_id"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/cells")
  }

  /** Serve a probe batch from a [[buildIvfIndexPinned]] index on disk. */
  def servedTopKPinned(spark: SparkSession, dir: String, probes: DataFrame,
                       nprobe: Int = 4, topK: Int = 10): DataFrame = {
    val centroids = spark.read.parquet(s"$dir/centroids")
    val cells = spark.read.parquet(s"$dir/cells")
      // the partition column comes back type-inferred (int); restore long
      .select(col("cell").cast("long").as("cell"), col("vec_id"),
        col("embedding"))
    servePinnedBatch(cells, centroids, probes, nprobe, topK)
  }

  private def ivfSaved(s: SparkSession, d: String): DataFrame = {
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d)
    val dir = graft.Scratch.dir("ivf_index_pinned")
    buildIvfIndexPinned(e, dir)
    // nprobe is the IVF family's serving-time recall dial (the beamWidth
    // rule, r13): default matches the oracle's unrolled 4 cells
    servedTopKPinned(s, dir, probeTable(e), nprobe = servingNprobe(s))
  }

  /** Multi-assignment IVF-Flat [N] (Jégou et al.'s multiple-assignment
    * variant) [r9] — the documented coverage upgrade for corpora whose
    * neighbors straddle cell boundaries: each corpus vector is STORED
    * in its top-`assign` cells (storage ×assign), the probe still
    * visits only `nprobe` cells, and a vector is a candidate if ANY of
    * its replica cells is probed. On this near-random corpus the
    * 2-assignment curve reaches recall 0.9 at 6 probed cells vs 12 for
    * single assignment (same candidate fraction ~0.6) — the better
    * coverage-per-probed-cell curve is the whole point. Same pinned
    * machinery as the rest of the family → hash-checked. */
  private def ivfMulti(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    VectorFunctions.register(s)
    val assign = 2
    val nprobe = 6
    val vecs = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val centroids = trainKmeansPinned(vecs, pinnedK, pinnedIters)
    val replicas = vecs.crossJoin(broadcast(centroids))
      .select(col("vec_id"),
        col("cid"), pinnedAffinity(col("embedding"), col("cvec")).as("aff"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("aff").desc, col("cid"))))
      .filter(col("rnk") <= assign)
      .select(col("vec_id"), col("cid").as("cell"))
    val probeVec = vecs.filter(col("vec_id") === 0)
      .select(col("embedding").as("probe"))
    val probeCells = probeVec.crossJoin(broadcast(centroids))
      .select(col("cid"), pinnedAffinity(col("probe"), col("cvec")).as("aff"))
      .orderBy(col("aff").desc, col("cid")).limit(nprobe)
      .select(col("cid").as("probe_cell"))
    // a vector reached through BOTH its replicas must score once
    val cand = replicas
      .join(broadcast(probeCells), col("cell") === col("probe_cell"))
      .select("vec_id").distinct()
    cand.join(vecs, Seq("vec_id"))
      .crossJoin(broadcast(probeVec))
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), cosine(col("embedding"), col("probe")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(10)
  }

  private def ivfMultiOracle: String = kmeansOracle(
    s""", affA AS (
       |  SELECT v.vec_id, c.cid,
       |         ((SELECT sum(CAST(u.x AS DOUBLE) * u.y)
       |           FROM (SELECT unnest(v.embedding) AS x,
       |                        unnest(c.cvec) AS y) u)
       |          / (sqrt((SELECT sum(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE))
       |                   FROM (SELECT unnest(v.embedding) AS x) u))
       |             * sqrt((SELECT sum(u.y * u.y)
       |                     FROM (SELECT unnest(c.cvec) AS y) u)))) AS aff
       |  FROM vecs v CROSS JOIN c$pinnedIters c),
       |asgM AS (
       |  SELECT vec_id, cid AS cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |                                 ORDER BY aff DESC, cid) AS rn
       |    FROM affA) WHERE rn <= 2),
       |p AS (SELECT embedding AS pe FROM vecs WHERE vec_id = 0),
       |pc AS (
       |  SELECT cid AS probe_cell FROM (
       |    SELECT c.cid, row_number() OVER (ORDER BY
       |      ((SELECT sum(CAST(u.x AS DOUBLE) * u.y)
       |        FROM (SELECT unnest(p.pe) AS x, unnest(c.cvec) AS y) u)
       |       / (sqrt((SELECT sum(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE))
       |                FROM (SELECT unnest(p.pe) AS x) u))
       |          * sqrt((SELECT sum(u.y * u.y)
       |                  FROM (SELECT unnest(c.cvec) AS y) u)))) DESC,
       |      c.cid) AS rn
       |    FROM c$pinnedIters c CROSS JOIN p) WHERE rn <= 6),
       |cand AS (
       |  SELECT DISTINCT a.vec_id
       |  FROM asgM a JOIN pc ON a.cell = pc.probe_cell
       |  WHERE a.vec_id <> 0)
       |SELECT v.vec_id,
       |       (${dotSql.format("v.embedding", "p.pe")}
       |        / (sqrt(${dotSql.format("v.embedding", "v.embedding")})
       |           * sqrt(${dotSql.format("p.pe", "p.pe")}))) AS cosine
       |FROM vecs v JOIN cand ON v.vec_id = cand.vec_id
       |CROSS JOIN p
       |ORDER BY cosine DESC, v.vec_id LIMIT 10""".stripMargin)

  /** k-NN majority-vote classification [N] — the label-propagation /
    * weak-labeling primitive (classify unlabeled or held-out items by
    * their nearest labeled neighbors): 10-NN by bit-exact cosine over
    * the labeled corpus, vote = neighbor-label count, tie to the lower
    * label. Scale shape = [[batchTopK]]: broadcast probes, one corpus
    * scan, bounded `graft_topk_by` partials on the wire; the vote is a
    * (probes × 10)-row hash agg. Fully exact → hash-checked. */
  private def knnClassify(s: SparkSession, d: String): DataFrame = {
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d)
    val probes = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe"))
    val corpus = e.filter(col("vec_id") >= 20)
      .select(col("vec_id"), col("embedding"), col("label"))
    val nn = corpus.crossJoin(broadcast(probes))
      .select(col("probe_id"), col("vec_id"),
        cosine(col("embedding"), col("probe")).as("cosine"))
      .groupBy(col("probe_id"))
      .agg(VectorFunctions.topk_by(col("cosine"), col("vec_id"), 10).as("nn"))
    nn.select(col("probe_id"), explode(col("nn")).as("e"))
      .select(col("probe_id"), col("e.id").as("vec_id"))
      .join(corpus.select(col("vec_id"), col("label")), Seq("vec_id"))
      .groupBy(col("probe_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
      .groupBy(col("probe_id"))
      .agg(max_by(struct(col("label").as("l"), col("votes").as("v")),
        struct(col("votes"), -col("label"))).as("w"))
      .select(col("probe_id"), col("w.l").as("pred_label"),
        col("w.v").as("votes"))
      .orderBy("probe_id")
  }

  private def knnClassifyOracle: String =
    s"""WITH p AS (SELECT vec_id AS probe_id, embedding AS pe
       |           FROM embeddings WHERE vec_id < 20),
       |c AS (SELECT vec_id, embedding, label
       |      FROM embeddings WHERE vec_id >= 20),
       |s AS (
       |  SELECT p.probe_id, c.vec_id, c.label,
       |         (${dotSql.format("c.embedding", "p.pe")}
       |          / (sqrt(${dotSql.format("c.embedding", "c.embedding")})
       |             * sqrt(${dotSql.format("p.pe", "p.pe")}))) AS cosine
       |  FROM c CROSS JOIN p),
       |r AS (
       |  SELECT probe_id, vec_id, label,
       |         row_number() OVER (PARTITION BY probe_id
       |                            ORDER BY cosine DESC, vec_id) AS rn
       |  FROM s),
       |v AS (
       |  SELECT probe_id, label, CAST(count(*) AS BIGINT) AS votes
       |  FROM r WHERE rn <= 10 GROUP BY 1, 2),
       |w AS (
       |  SELECT probe_id, label, votes,
       |         row_number() OVER (PARTITION BY probe_id
       |                            ORDER BY votes DESC, label) AS rn
       |  FROM v)
       |SELECT probe_id, CAST(label AS INTEGER) AS pred_label, votes
       |FROM w WHERE rn = 1 ORDER BY probe_id""".stripMargin

  /** Index APPEND without retraining [N] [r9] — the daily-refresh
    * lifecycle move: yesterday's index (trained on the even-id slice)
    * absorbs today's delta (the odd ids) by assigning the new vectors
    * against the SAVED centroids and appending their cell partitions —
    * no Lloyd rounds re-run, untouched cell directories keep their
    * files. Because assignment is pinned and deterministic,
    * cells(evens) ∪ cells(odds) ≡ assign(all) against the same
    * centroids, so the post-append serve is hash-checked by the same
    * generated mirror with training restricted to the even slice.
    * (The even-id seed slice yields 8 of the 16 requested seeds —
    * the mirror applies the identical filter.) */
  private def ivfAppend(s: SparkSession, d: String): DataFrame = {
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d)
    val dir = graft.Scratch.dir("ivf_index_append")
    buildIvfIndexPinned(e.filter(col("vec_id") % 2 === 0), dir)
    val centroids = s.read.parquet(s"$dir/centroids")
    val delta = e.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"), col("embedding"))
    pinnedAssign(delta, centroids).join(delta, Seq("vec_id"))
      .write.mode("append").partitionBy("cell").parquet(s"$dir/cells")
    servedTopKPinned(s, dir, probeTable(e))
  }

  /** Embedding drift between two corpus slices [N] [r9] — the ML-ops
    * monitoring primitive (did the embedding distribution move between
    * snapshots?): cosine between each label's even- and odd-slice
    * centroids, kept in the mergeable exact-integer sum form
    * (micro-unit grid, the emb_centroid_by_label discipline — cosine's
    * scale invariance makes sum-form ≡ mean-form). Cross products ride
    * DECIMAL(19,0)×DECIMAL(19,0)→DECIMAL(38,0) exact arithmetic; the
    * single double division at the end is the same correctly-rounded
    * IEEE op on both engines. One posexplode + two hash aggs — no
    * shuffle wider than (label × dim). */
  private def embDrift(s: SparkSession, d: String): DataFrame = {
    val parts = Tables.embeddings(s, d)
      .select(col("label"), (pmod(col("vec_id"), lit(2)) === 0).as("in_a"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .withColumn("vd", floor(col("v").cast("double") * lit(1e6)).cast("long"))
      .groupBy(col("label"), col("pos"))
      .agg(sum(when(col("in_a"), col("vd"))).as("sa"),
        sum(when(!col("in_a"), col("vd"))).as("sb"),
        sum(when(col("in_a"), 1L).otherwise(0L)).as("na"),
        sum(when(!col("in_a"), 1L).otherwise(0L)).as("nb"))
    val d19 = "decimal(19,0)"
    parts.groupBy(col("label"))
      .agg(min(col("na")).as("n_a"), min(col("nb")).as("n_b"),
        sum(col("sa").cast(d19) * col("sb").cast(d19)).as("dab"),
        sum(col("sa").cast(d19) * col("sa").cast(d19)).as("daa"),
        sum(col("sb").cast(d19) * col("sb").cast(d19)).as("dbb"))
      .select(col("label"), col("n_a"), col("n_b"),
        (col("dab").cast("double") /
          (sqrt(col("daa").cast("double")) * sqrt(col("dbb").cast("double"))))
          .as("drift_cosine"))
      .orderBy("label")
  }

  private def embDriftOracle: String =
    """WITH x AS (
      |  SELECT label, vec_id % 2 = 0 AS in_a,
      |         generate_subscripts(embedding, 1) - 1 AS pos,
      |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1e6)
      |              AS BIGINT) AS vd
      |  FROM embeddings),
      |g AS (
      |  SELECT label, pos,
      |         CAST(sum(CASE WHEN in_a THEN vd END) AS BIGINT) AS sa,
      |         CAST(sum(CASE WHEN NOT in_a THEN vd END) AS BIGINT) AS sb,
      |         CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS na,
      |         CAST(sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS BIGINT) AS nb
      |  FROM x GROUP BY 1, 2),
      |a AS (
      |  SELECT label, CAST(min(na) AS BIGINT) AS n_a,
      |         CAST(min(nb) AS BIGINT) AS n_b,
      |         sum(CAST(sa AS DECIMAL(19,0)) * CAST(sb AS DECIMAL(19,0))) AS dab,
      |         sum(CAST(sa AS DECIMAL(19,0)) * CAST(sa AS DECIMAL(19,0))) AS daa,
      |         sum(CAST(sb AS DECIMAL(19,0)) * CAST(sb AS DECIMAL(19,0))) AS dbb
      |  FROM g GROUP BY 1)
      |SELECT label, n_a, n_b,
      |       CAST(dab AS DOUBLE)
      |         / (sqrt(CAST(daa AS DOUBLE)) * sqrt(CAST(dbb AS DOUBLE)))
      |         AS drift_cosine
      |FROM a ORDER BY label""".stripMargin

  private def probeTable(e: DataFrame): DataFrame =
    e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe"))

  private def batch(s: SparkSession, d: String): DataFrame = {
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d)
    batchTopK(e, probeTable(e))
  }

  /** Cosine threshold for [[radiusSearch]] — ~2.8σ of the null cosine
    * distribution at dim 64 (σ ≈ 1/√64), so matches are genuine
    * structure, not noise, and the result stays output-bounded. */
  private val radiusTau = 0.35

  /** `sim_search_radius` [r9]: RANGE (radius) search — the other
    * fundamental similarity-query type next to top-k: ALL corpus
    * vectors within cosine ≥ τ of each probe, however many or few that
    * is. Top-k answers "the best k even if they're bad"; radius answers
    * "everything actually similar" — the semantics dedup candidate
    * generation and recall-oriented retrieval want. Same scale shape as
    * [[batchTopK]] minus the top-k state: broadcast probe batch, ONE
    * corpus scan, a codegen cosine per pair, and a map-side filter — no
    * aggregate at all, so it's the cheapest of the serving family. The
    * τ boundary is a comparison of bit-identical doubles, so the key
    * hash-matches the oracle exactly. */
  private def radiusSearch(s: SparkSession, d: String): DataFrame = {
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d)
    e.join(broadcast(probeTable(e)), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        cosine(col("embedding"), col("probe")).as("cosine"))
      .filter(col("cosine") >= lit(radiusTau))
      .orderBy("probe_id", "vec_id")
  }

  /** `sim_search_mips` [r9]: batch exact MAX-INNER-PRODUCT search — the
    * recommender-serving retrieval primitive (user·item affinity is a
    * raw dot product; un-normalized, so high-norm items win even when
    * their angle is worse — different answers than cosine by design).
    * Same scale shape as [[batchTopK]]: broadcast probe batch, one
    * corpus scan, bounded [[graft.functions.TopKByAgg]] partials on the
    * wire. The dot fold is the bit-identical sequential double
    * accumulation, so the key hash-matches the oracle. */
  private def mipsBatch(s: SparkSession, d: String): DataFrame = {
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d)
    val scored = e.join(broadcast(probeTable(e)),
        col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        dot(col("embedding"), col("probe")).as("dp"))
    scored.groupBy(col("probe_id"))
      .agg(VectorFunctions.topk_by(col("dp"), col("vec_id"), 10).as("nn"))
      .select(col("probe_id"), posexplode(col("nn")).as(Seq("pos", "e")))
      .select(col("probe_id"), (col("pos") + 1).cast("int").as("rnk"),
        col("e.id").as("vec_id"), col("e.ord").as("dot"))
      .orderBy("probe_id", "rnk")
  }

  /** `sim_search_mips_augmented` [r9]: the MIPS→cosine NORM-AUGMENTATION
    * reduction (Bachrach et al., RecSys'14 "Speeding Up the Xbox
    * Recommender"): append `sqrt(M² − ‖x‖²)` to every item vector
    * (M = max item norm) and `0` to the probe — every augmented item
    * then has norm exactly M, so cosine in the augmented space is
    * `dot(x,q) / (M·‖q‖)`, MONOTONE in the raw inner product. That is
    * the identity that lets MIPS ride the entire cosine-ANN stack
    * (LSH buckets, IVF cells, PQ codes) unchanged — the 100 TB path
    * for un-normalized retrieval. This key serves the reduction
    * exactly: the score IS `d/(M·‖q‖)` computed in that shape (max is
    * exact over doubles, sqrt/division correctly rounded), so it
    * hash-matches the oracle, and its per-probe ranking provably
    * equals `sim_search_mips`'s (asserted in Round9Spec). */
  private def mipsAugmented(s: SparkSession, d: String): DataFrame = {
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"),
      dot(col("embedding"), col("embedding")).as("nsq"))
    val maxn = e.agg(max(col("nsq")).as("maxnsq"))
    val probes = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe"),
        col("nsq").as("pnsq"))
    val scored = e.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .crossJoin(broadcast(maxn))
      .select(col("probe_id"), col("vec_id"),
        (dot(col("embedding"), col("probe")) /
          (sqrt(col("maxnsq")) * sqrt(col("pnsq")))).as("ac"))
    scored.groupBy(col("probe_id"))
      .agg(VectorFunctions.topk_by(col("ac"), col("vec_id"), 10).as("nn"))
      .select(col("probe_id"), posexplode(col("nn")).as(Seq("pos", "e")))
      .select(col("probe_id"), (col("pos") + 1).cast("int").as("rnk"),
        col("e.id").as("vec_id"), col("e.ord").as("aug_cosine"))
      .orderBy("probe_id", "rnk")
  }

  /** Hard-negative mining for contrastive training [N]: for each probe,
    * the top-10 most-similar corpus vectors with a DIFFERENT label —
    * the near-misses an embedding model most needs to push apart
    * (InfoNCE/triplet batch construction). Same scale shape as
    * [[batchTopK]]: broadcast probes, one corpus scan, bounded
    * [[graft.functions.TopKByAgg]] partials on the wire — the label
    * disequality rides the join condition, so same-label rows never
    * reach scoring. */
  private def hardNegatives(s: SparkSession, d: String): DataFrame = {
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d)
    val probes = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe"),
        col("label").as("plabel"))
    val scored = e.join(broadcast(probes), col("label") =!= col("plabel"))
      .select(col("probe_id"), col("vec_id"),
        cosine(col("embedding"), col("probe")).as("cosine"))
    explodeTopK(scored.groupBy(col("probe_id"))
      .agg(VectorFunctions.topk_by(col("cosine"), col("vec_id"), 10).as("nn")))
  }

  /** Query key [r9]: batch IVF serving on the PINNED trainer —
    * hash-checked. */
  private def ivfBatch(s: SparkSession, d: String): DataFrame = {
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d)
    val vecs = e.select(col("vec_id"), col("embedding"))
    val centroids = trainKmeansPinned(vecs, pinnedK, pinnedIters)
    val cells = pinnedAssign(vecs, centroids).join(vecs, Seq("vec_id"))
    servePinnedBatch(cells, centroids, probeTable(e), nprobe = 4, topK = 10)
  }

  /** Symmetric int8 embedding quantization [N] — the compression step a
    * 100 TB embedding store applies before serving (4× smaller, SIMD
    * int dot products): per-vector scale = 127 / max|v|, q = round(v ×
    * scale). Rounding is floor(x + 0.5) — exact in IEEE and identical
    * across engines, unlike banker's rounding on arbitrary binary
    * doubles — and zero vectors quantize to all-zeros with scale 0.
    * Emitted positionally (vec_id, pos, q) so the driver compare never
    * sees an array column. */
  private def quantizeInt8(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val mx = array_max(transform(col("embedding"), x => abs(x)))
    e.select(col("vec_id"), col("embedding"),
        when(mx > 0, lit(127.0) / mx.cast("double")).otherwise(lit(0.0)).as("scale"))
      .select(col("vec_id"), col("scale"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("vec_id"), col("pos").cast("int").as("pos"),
        floor(col("v").cast("double") * col("scale") + lit(0.5)).cast("int").as("q"))
      .orderBy("vec_id", "pos")
  }

  /** Top-k serving over the int8-quantized corpus [N]: score on the
    * quantized grid directly — per-vector scales cancel inside cosine
    * (cos(q_a/s_a, q_b/s_b) = cos(q_a, q_b)), so the serving path needs
    * only the int8 codes (4× less memory traffic than float32) and the
    * existing codegen cosine. int8 codes fit float32 exactly (|q| ≤
    * 127), so the same expression serves both paths. Approximate vs
    * the FLOAT answer (SimSearchRecallSpec floors recall@10), but
    * DETERMINISTIC in itself: the quantized dots are exact integers,
    * so since r8 the key is hash-checked against a token-mirrored
    * DuckDB oracle (no longer rows-only). */
  private def quantizedTopK(s: SparkSession, d: String): DataFrame = {
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d)
    val mx = array_max(transform(col("embedding"), x => abs(x)))
    val scale = when(mx > 0, lit(127.0) / mx.cast("double")).otherwise(lit(0.0))
    val quantized = e.select(col("vec_id"),
      transform(col("embedding"),
        v => floor(v.cast("double") * scale + lit(0.5)).cast("float")).as("qe"))
    val probe = quantized.filter(col("vec_id") === 0).select(col("qe").as("probe"))
    quantized.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"), cosine(col("qe"), col("probe")).as("qcosine"))
      .orderBy(col("qcosine").desc, col("vec_id"))
      .limit(10)
  }

  /** Product quantization [N] (Jégou et al., "Product Quantization for
    * Nearest Neighbor Search", public) — the canonical embedding
    * compression: the 64-dim vector splits into `m` subspaces, each
    * subspace learns a tiny k-centroid codebook (distributed Lloyd, same
    * machinery as the IVF path), and a vector is stored as m ONE-BYTE
    * codes (32× smaller than float32). Serving is asymmetric distance
    * computation: the probe precomputes an (m × k)-entry dot table (a
    * broadcast of 128 rows), the corpus side joins CODES against the
    * table and sums — the big-data scan touches only the code columns,
    * never the floats — then an exact-cosine rerank over the short
    * candidate list restores precision.
    *
    * INTEGER-GRID pinning [r9]: every Lloyd quantity lives on the
    * micro-unit grid (`floor(v·10⁶)` longs — the emb_centroid_by_label
    * discipline), so the distances (Σ(gv−mg)², exact longs), the argmin
    * (ties to the lower cid), the pinned mean (`floor(sum/count)` — one
    * IEEE divide + floor, identical on both engines) and the ADC dots
    * (Σ gp·mg, exact longs) are all order-invariant and cross-engine
    * exact — the whole train→encode→serve pipeline hash-matches a
    * generated DuckDB oracle (it replaced the float-mean trainer, whose
    * partition-order-sensitive centroids forced a rows-only check). The
    * only doubles are the approx_cos = adc/‖v‖ ranking and the exact
    * rerank, both bit-identical mirrored expressions. */
  private val gridScale = 1e6

  /** (vec_id, gv: long[]) — embeddings pinned to the micro-unit grid. */
  private def gridify(vecs: DataFrame): DataFrame =
    vecs.select(col("vec_id"), transform(col("embedding"),
      x => floor(x.cast("double") * lit(gridScale)).cast("long")).as("gv"))

  /** Split a long-array column into m contiguous subvectors:
    * (vec_id, sub, gvec). */
  private def sliceSubs(df: DataFrame, vecCol: String, m: Int,
                        subDim: Int): DataFrame =
    df.select(col("vec_id"), posexplode(expr(
      s"transform(sequence(0, ${m - 1}), s2 -> slice($vecCol, s2 * $subDim + 1, $subDim))"))
      .as(Seq("sub", "gvec")))

  /** Exact integer squared L2 / dot between grid subvectors. */
  private def gridL2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)

  private def gridDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Per-subspace pinned codebooks (sub, cid, cvec long[]) from `iters`
    * Lloyd rounds seeded by vec_id 1..k over gridded subvectors `sub`.
    * Distributed shape: broadcast codebook join (m·k rows), per-(vec,
    * sub) argmin, per-(sub, cid, pos) hash-agg mean — linear scans, no
    * shuffle wider than the code table. */
  def pqTrainCodebooksPinned(sub: DataFrame, k: Int, iters: Int): DataFrame = {
    var cents = sub.filter(col("vec_id").between(1, k))
      .select(col("sub"), (col("vec_id") - 1).cast("int").as("cid"),
        col("gvec").as("cvec"))
    (1 to iters).foreach { _ =>
      cents = sub.join(broadcast(cents), Seq("sub"))
        .select(col("vec_id"), col("sub"), col("gvec"), col("cid"),
          gridL2(col("gvec"), col("cvec")).as("d2"))
        .groupBy(col("vec_id"), col("sub"))
        .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cid"),
          first(col("gvec")).as("gvec"))
        .select(col("sub"), col("cid"),
          posexplode(col("gvec")).as(Seq("pos", "v")))
        .groupBy(col("sub"), col("cid"), col("pos"))
        // pinned mean back onto the grid: exact long sum (< 2^53), one
        // IEEE divide, floor — deterministic on both engines
        .agg(floor(sum(col("v")).cast("double") / count(lit(1)))
          .cast("long").as("mg"))
        .groupBy(col("sub"), col("cid"))
        .agg(sort_array(collect_list(struct(col("pos"), col("mg")))).as("dims"))
        .select(col("sub"), col("cid"),
          transform(col("dims"), x => x.getField("mg")).as("cvec"))
        .cut()
    }
    cents
  }

  /** Encode every vector as its per-subspace nearest codebook entry:
    * the (vec_id, sub, cid) code table IS the compressed corpus. */
  def pqEncodePinned(sub: DataFrame, cents: DataFrame): DataFrame =
    sub.join(broadcast(cents), Seq("sub"))
      .select(col("vec_id"), col("sub"), col("cid"),
        gridL2(col("gvec"), col("cvec")).as("d2"))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cid"))

  def pqTopKPinned(e: DataFrame, m: Int = 8, k: Int = 16, iters: Int = 3,
                   rerank: Int = 200, topK: Int = 10): DataFrame = {
    val subDim = 64 / m
    val vecs = e.select(col("vec_id"), col("embedding"))
    val sub = sliceSubs(gridify(vecs), "gv", m, subDim)
    val cents = pqTrainCodebooksPinned(sub, k, iters)
    val codes = pqEncodePinned(sub, cents)
    pqAdcServe(vecs, cents, codes, m, rerank, topK)
  }

  /** ADC + exact rerank from TRAINED artifacts — the serving half of
    * the PQ pipeline, factored out (r13, VERDICT #4) so the in-query
    * key (trains codebooks in the same plan) and the persisted-store
    * path ([[servePqFromStore]]) share it operation for operation:
    * store serving is spec-pinned bit-equal to the one-shot key.
    *
    * ADC for COSINE: the probe's per-subspace exact-integer dot with
    * every codebook entry (m × k = 128 rows, broadcast); approx_cos =
    * (Σ_sub adc) / ‖v‖ with the exact per-vector norm computed beside
    * the codes (one double per vector — standard PQ-for-cosine), then
    * an exact-cosine rerank of the short list. */
  private def pqAdcServe(vecs: DataFrame, cents: DataFrame, codes: DataFrame,
                         m: Int, rerank: Int, topK: Int): DataFrame = {
    val subDim = 64 / m
    val table = sliceSubs(gridify(vecs.filter(col("vec_id") === 0)),
        "gv", m, subDim)
      .join(broadcast(cents), Seq("sub"))
      .select(col("sub"), col("cid"),
        gridDot(col("gvec"), col("cvec")).as("pdot"))
    val norms = vecs.select(col("vec_id"),
      sqrt(dot(col("embedding"), col("embedding"))).as("vnorm"))
    val candidates = codes.filter(col("vec_id") =!= 0)
      .join(broadcast(table), Seq("sub", "cid"))
      .groupBy(col("vec_id"))
      .agg(sum(col("pdot")).as("approx_dot")) // exact long: order-invariant
      .join(norms, Seq("vec_id"))
      .select(col("vec_id"),
        (col("approx_dot").cast("double") / col("vnorm")).as("approx_cos"))
      .orderBy(col("approx_cos").desc, col("vec_id"))
      .limit(rerank)
    // exact rerank of the short list
    val probe = vecs.filter(col("vec_id") === 0).select(col("embedding").as("probe"))
    candidates.join(vecs, Seq("vec_id"))
      .crossJoin(broadcast(probe))
      .select(col("vec_id"), cosine(col("embedding"), col("probe")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(topK)
  }

  /** Persist the trained PQ index: codebooks, 8-byte codes, and the
    * raw vectors (the exact-rerank side + probe source). Deployment
    * trains ONCE and serves codes — the artifact split this store
    * realizes; `codes` is written LAST so its existence implies a
    * complete seed (the hnsw-store completeness rule). */
  def pqStoreSeed(e: DataFrame, storeDir: String, m: Int = 8, k: Int = 16,
                  iters: Int = 3): Unit = {
    val subDim = 64 / m
    val vecs = e.select(col("vec_id"), col("embedding"))
    val sub = sliceSubs(gridify(vecs), "gv", m, subDim)
    val cents = pqTrainCodebooksPinned(sub, k, iters)
    vecs.write.mode("overwrite").parquet(s"$storeDir/vecs")
    cents.write.mode("overwrite").parquet(s"$storeDir/cents")
    pqEncodePinned(sub, cents)
      .write.mode("overwrite").parquet(s"$storeDir/codes")
  }

  /** Serve from the persisted PQ index: ADC over the stored codes +
    * exact rerank — no Lloyd round anywhere in the plan. Grid pinning
    * makes the stored artifacts exact longs, so store serving is
    * bit-equal to the in-query key (spec-pinned). */
  def servePqFromStore(s: SparkSession, storeDir: String, m: Int = 8,
                       rerank: Int = 200, topK: Int = 10): DataFrame =
    pqAdcServe(
      s.read.parquet(s"$storeDir/vecs"),
      s.read.parquet(s"$storeDir/cents"),
      s.read.parquet(s"$storeDir/codes"),
      m, rerank, topK)

  private def pq(s: SparkSession, d: String): DataFrame = {
    VectorFunctions.register(s)
    pqTopKPinned(Tables.embeddings(s, d))
  }

  /** BATCH PQ serving [N] (r13) — the PQ leg of the batch-serving
    * matrix (`sim_search_batch` exact / `sim_search_ivf_batch` IVF /
    * `sim_search_graph_batch` graph): one codebook train amortized
    * across a probe TABLE. Each probe's ADC table is m×k exact-integer
    * dots; ALL probes' tables broadcast together (probes × 128 rows),
    * the code scan joins once, and per-probe rerank/top-k are
    * `row_number() OVER (PARTITION BY probe_id)` — the whole batch is
    * one pass over the codes, linear in probes, and the corpus side
    * still reads 8-byte codes, never floats, until the short rerank. */
  def pqBatchTopK(e: DataFrame, probes: DataFrame, m: Int = 8, k: Int = 16,
                  iters: Int = 3, rerank: Int = 200,
                  topK: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val subDim = 64 / m
    val vecs = e.select(col("vec_id"), col("embedding"))
    val sub = sliceSubs(gridify(vecs), "gv", m, subDim)
    val cents = pqTrainCodebooksPinned(sub, k, iters)
    val codes = pqEncodePinned(sub, cents)
    val psub = sliceSubs(
        gridify(probes.select(col("probe_id").as("vec_id"),
          col("probe").as("embedding"))), "gv", m, subDim)
      .select(col("vec_id").as("probe_id"), col("sub"), col("gvec"))
    val tables = psub.join(broadcast(cents), Seq("sub"))
      .select(col("probe_id"), col("sub"), col("cid"),
        gridDot(col("gvec"), col("cvec")).as("pdot"))
    val norms = vecs.select(col("vec_id"),
      sqrt(dot(col("embedding"), col("embedding"))).as("vnorm"))
    val wA = Window.partitionBy(col("probe_id"))
      .orderBy(col("approx_cos").desc, col("vec_id"))
    val candidates = codes.join(broadcast(tables), Seq("sub", "cid"))
      .filter(col("vec_id") =!= col("probe_id"))
      .groupBy(col("probe_id"), col("vec_id"))
      .agg(sum(col("pdot")).as("approx_dot")) // exact long
      .join(norms, Seq("vec_id"))
      .select(col("probe_id"), col("vec_id"),
        (col("approx_dot").cast("double") / col("vnorm")).as("approx_cos"))
      .withColumn("rn", row_number().over(wA))
      .filter(col("rn") <= rerank)
      .select(col("probe_id"), col("vec_id"))
    val wR = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    candidates.join(vecs, Seq("vec_id"))
      .join(broadcast(probes), Seq("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        cosine(col("embedding"), col("probe")).as("cosine"))
      .withColumn("rnk", row_number().over(wR))
      .filter(col("rnk") <= topK)
      .select(col("probe_id"), col("rnk").cast("int").as("rnk"),
        col("vec_id"), col("cosine"))
      .orderBy("probe_id", "rnk")
  }

  private def pqBatch(s: SparkSession, d: String): DataFrame = {
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d)
    pqBatchTopK(e, probeTable(e))
  }

  /** `sim_search_pq_served` [N] (r13, VERDICT #4) — the serving-cost
    * headline discipline applied to PQ, exactly the r12 HNSW swap's
    * argument: the in-query `sim_search_pq` pays 3 Lloyd rounds of
    * codebook training EVERY run, while deployment trains once and
    * serves 8-byte codes. First run per process seeds the store
    * (build); steady state is ADC lookup + rerank only. Same oracle as
    * the in-query key — store serving is bit-equal by construction. */
  private def pqServed(s: SparkSession, d: String): DataFrame = {
    VectorFunctions.register(s)
    val dir = graft.Scratch.dir(
      "pq_store_" + d.replaceAll("[^A-Za-z0-9.]", "_"))
    // _SUCCESS, not the dir: a seed crashed mid-write of codes (the
    // last artifact) must read as unseeded, not serve a partial index
    // (ADVICE r13)
    if (!graft.Hfs.exists(s"$dir/codes/_SUCCESS"))
      pqStoreSeed(Tables.embeddings(s, d), dir)
    servePqFromStore(s, dir)
  }

  /** The full FAISS-style two-stage serving architecture — IVF coarse
    * quantizer + PQ fine scoring + exact rerank — composed from
    * [[trainKmeansPinned]] and [[pqTrainCodebooksPinned]]:
    *
    *  1. COARSE: the probe visits only its `nprobe` nearest k-means
    *     cells, cutting the candidate corpus to ~nprobe/k of the data
    *     (the at-scale I/O win: cells are the partition key on disk).
    *  2. FINE: survivors are scored from their 8-byte PQ codes via the
    *     broadcast ADC table — no full vectors touched.
    *  3. RERANK: exact cosine on the short list only.
    *
    * RESIDUAL encoding (classic FAISS): codebooks train on
    * r = v − centroid(cell), so each codebook only covers the
    * within-cell spread, and the ADC score decomposes as dot(p, v) ≈
    * dot(p, c_cell) + Σ_sub dot(p_sub, code_sub) — one per-cell
    * constant plus the usual m-entry table lookup. [r9] The residuals
    * live on the integer grid (cell means pinned to micro-units via
    * floor(s·10⁶/n) from the trainer's exact (sum, count) form), so —
    * like [[pqTopKPinned]] — the whole pipeline is cross-engine exact
    * and hash-checked.
    *
    * nprobe is 12 of 16 cells since r9 (recall@10 = 0.9, floored in
    * SimSearchRecallSpec). Measured context for that setting: this
    * synthetic corpus is near-random in cosine space, so the
    * coverage-recall curve is almost linear in the probed corpus
    * fraction (k=16: 8 cells→0.8, 12→0.9; k=8: 5 cells→0.9;
    * 2-assignment replication: 6 cells→0.9 at 0.61 frac) — no cell
    * config prunes hard here. On a genuinely clustered 100 TB corpus
    * the same pipeline runs at nprobe 2-4; nprobe is the serving-time
    * dial, and multi-assignment (store each vector in its top-2 cells)
    * is the documented upgrade if a corpus needs a better curve. */
  def ivfPqTopKPinned(e: DataFrame, kCells: Int = pinnedK,
                      lloydIters: Int = pinnedIters, nprobe: Int = 12,
                      m: Int = 8, kCodes: Int = 16, pqIters: Int = 3,
                      rerank: Int = 200, topK: Int = 10): DataFrame = {
    val subDim = 64 / m
    val vecs = e.select(col("vec_id"), col("embedding"))
    val centroids = trainKmeansPinned(vecs, kCells, lloydIters)
    val cellOf = pinnedAssign(vecs, centroids)
    // pinned integer-grid cell means from the exact (sum, count) form
    val cellMeans = centroids.select(col("cid"),
      transform(col("cvec"),
        s => floor(s * lit(gridScale) / col("n_members")).cast("long")).as("cmg"))
    val grid = gridify(vecs)
    // residual grid: one broadcast mean join, element-wise exact subtract
    val rsub = sliceSubs(
      grid.join(cellOf, Seq("vec_id"))
        .join(broadcast(cellMeans), col("cell") === col("cid"))
        .select(col("vec_id"),
          zip_with(col("gv"), col("cmg"), (x, c) => x - c).as("rv")),
      "rv", m, subDim)
    val cents = pqTrainCodebooksPinned(rsub, kCodes, pqIters)
    val codes = pqEncodePinned(rsub, cents)
    // probed cells carry BOTH the membership key and the exact-integer
    // probe·cellmean constant the residual ADC score needs
    val probeVec = vecs.filter(col("vec_id") === 0)
      .select(col("embedding").as("probe"))
    val probeGrid = grid.filter(col("vec_id") === 0)
    val probeCells = probeVec.crossJoin(broadcast(centroids))
      .select(col("cid"), pinnedAffinity(col("probe"), col("cvec")).as("aff"))
      .orderBy(col("aff").desc, col("cid")).limit(nprobe)
      .join(broadcast(cellMeans), Seq("cid"))
      .crossJoin(broadcast(probeGrid))
      .select(col("cid").as("cell"), gridDot(col("gv"), col("cmg")).as("pdotc"))
    // ADC table: RAW probe grid subvectors (the centroid term is the
    // separate pdotc constant) against the residual codebooks
    val table = sliceSubs(probeGrid, "gv", m, subDim)
      .join(broadcast(cents), Seq("sub"))
      .select(col("sub"), col("cid"),
        gridDot(col("gvec"), col("cvec")).as("pdot"))
    val norms = vecs.select(col("vec_id"),
      sqrt(dot(col("embedding"), col("embedding"))).as("vnorm"))
    val candidates = codes
      .join(cellOf, Seq("vec_id"))
      .join(broadcast(probeCells), Seq("cell"))
      .filter(col("vec_id") =!= 0)
      .join(broadcast(table), Seq("sub", "cid"))
      .groupBy(col("vec_id"))
      .agg((first(col("pdotc")) + sum(col("pdot"))).as("approx_dot")) // exact longs
      .join(norms, Seq("vec_id"))
      .select(col("vec_id"),
        (col("approx_dot").cast("double") / col("vnorm")).as("approx_cos"))
      .orderBy(col("approx_cos").desc, col("vec_id")).limit(rerank)
    candidates.join(vecs, Seq("vec_id"))
      .crossJoin(broadcast(probeVec))
      .select(col("vec_id"), cosine(col("embedding"), col("probe")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id")).limit(topK)
  }

  private def ivfPq(s: SparkSession, d: String): DataFrame = {
    VectorFunctions.register(s)
    ivfPqTopKPinned(Tables.embeddings(s, d))
  }

  /** Per-label centroid in MERGEABLE (sum, count) form [N] — the class
    * prototype / cluster-profile aggregate, kept as the exact integer
    * sum vector + count instead of the mean: the k-means rounds proved
    * the mean's division ties are the one cross-engine hazard, and
    * every scale-invariant consumer (cosine, nearest-prototype) reads
    * the sum form identically. Components pin to micro-units
    * (`floor(v·10⁶)` — float→double is exact, one deterministic
    * product+floor), so the per-(label, dim) sums are exact BIGINT and
    * re-aggregate across any partitioning; the dim-domain rollup is
    * one extra hash agg, never a rescan. */
  private def centroidByLabel(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .withColumn("vd", floor(col("v").cast("double") * 1e6).cast("long"))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("vd")).as("s"), count(lit(1)).as("n"))
      .groupBy(col("label"))
      .agg(min(col("n")).as("n"),
        // string-serialized: the driver's row-sort can't hash arrays
        array_join(expr(
          "transform(sort_array(collect_list(struct(pos, s))), x -> x.s)"),
          ",").as("sums"))
      .orderBy("label")

  /** One micro-batch of INCREMENTAL centroid maintenance [N] (r14) —
    * the mergeable-state discipline made a lifecycle: per-label
    * centroids live as EXACT micro-unit integer partial sums
    * (label, pos, s, n) per epoch, so maintenance is pure append
    * (each batch writes its own partials, touched rows only) and the
    * serve is an exact fold — order-, partition-, and
    * epoch-composition-invariant, which is precisely why the
    * sum-form representation was chosen over means everywhere in the
    * embeddings family. Store: `ids` (re-delivery guard), `parts`
    * (partial sums), epoch-partitioned, replay-idempotent. Serve
    * output = the batch `emb_centroid_by_label` shape; the oracle is
    * its full-corpus recompute, so hash equality proves fold ≡ full. */
  def centroidDelta(batchIn: DataFrame, storeDir: String,
                    epoch: Long): DataFrame = {
    graft.pipeline.StoreCompact.assertNotCompacting(storeDir)
    val s = batchIn.sparkSession
    val batch = batchIn.select(col("vec_id"), col("label"), col("embedding"))
      .cut()
    val seen =
      if (graft.Hfs.exists(s"$storeDir/ids"))
        s.read.parquet(s"$storeDir/ids")
          .filter(col("epoch").cast("long") =!= epoch).select("vec_id")
      else batch.select("vec_id").limit(0)
    val fresh = batch.join(seen, Seq("vec_id"), "left_anti").cut()
    def writeEpoch(df: DataFrame, sub: String): Unit =
      df.write.mode("overwrite").parquet(s"$storeDir/$sub/epoch=$epoch")
    writeEpoch(fresh.select("vec_id"), "ids")
    writeEpoch(fresh
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .withColumn("vd", floor(col("v").cast("double") * 1e6).cast("long"))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("vd")).as("s"), count(lit(1)).as("n")), "parts")
    s.read.parquet(s"$storeDir/parts")
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("s")).as("s"), sum(col("n")).as("n"))
      .groupBy(col("label"))
      .agg(min(col("n")).as("n"),
        array_join(expr(
          "transform(sort_array(collect_list(struct(pos, s))), x -> x.s)"),
          ",").as("sums"))
      .orderBy("label")
  }

  /** Registered lifecycle key: two delta epochs (80/20 vec-id split),
    * served after the second against the batch key's oracle. */
  private def centroidIncremental(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding"))
    val split = (e.agg(max(col("vec_id"))).head().getLong(0) + 1L) * 4L / 5L
    val dir = graft.Scratch.dir(
      s"centroid_incr-${java.util.UUID.randomUUID()}")
    centroidDelta(e.filter(col("vec_id") < split), dir, 0L): Unit
    centroidDelta(e.filter(col("vec_id") >= split), dir, 1L)
  }

  /** Johnson-Lindenstrauss random projection [N] — embedding
    * dimensionality reduction with a SEEDED sign matrix: s(i,j) = ±1
    * from the first hex digit of md5(i ++ '_' ++ j), so both engines
    * regenerate the identical matrix from nothing (the md5-coin
    * discipline the text samplers use, applied to linear algebra).
    * Components pin to exact micro-unit longs, so each of the 8 output
    * components is an exact BIGINT dot product — order-invariant,
    * partition-invariant. Cost: |vecs|·dims·k rows through one hash
    * agg; the sign matrix is never materialized, it's computed inline
    * by codegen'd md5 — nothing to broadcast, nothing to store. */
  private def randomProjection(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "v")))
      .withColumn("vd", floor(col("v").cast("double") * 1e6).cast("long"))
      .select(col("vec_id"), col("i"), col("vd"),
        explode(sequence(lit(0), lit(7))).as("j"))
      .withColumn("sign",
        when(substring(md5(concat(col("i"), lit("_"), col("j"))), 1, 1)
          .between("0", "7"), 1L).otherwise(-1L))
      .groupBy(col("vec_id"), col("j"))
      .agg(sum(col("vd") * col("sign")).as("proj"))
      .orderBy("vec_id", "j")

  // ---------------------------------------------------------------------
  // MMR diversified retrieval — oracle-checked greedy re-ranking.
  // ---------------------------------------------------------------------

  /** Symmetric pinned affinity (both sides float[] embeddings):
    * the [[pinnedAffinity]] ordered-sum shape with casts on BOTH
    * arguments, bit-identical to the DuckDB parallel-unnest mirror. */
  private def pairAffinity(a: Column, b: Column): Column = {
    val d = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = aggregate(a, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double"))
    val nb = aggregate(b, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double"))
    d / (sqrt(na) * sqrt(nb))
  }

  private val mmrProbe = 11
  private val mmrPool = 12
  private val mmrK = 4

  /** Maximal-marginal-relevance re-ranking [N] (Carbonell & Goldstein
    * 1998; see PAPERS.md) — diversity-aware top-k, the retrieval twin of
    * near-dup removal: after the similarity stage ranks a candidate
    * pool, greedily pick k results maximizing
    * λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s), so every pick is relevant
    * AND far from what's already selected (λ = 0.7).
    *
    * Oracle-checked end to end: affinities use the pinned ordered-sum
    * (bit-identical across engines), the blend is two IEEE multiplies
    * and a subtract in mirrored order, and each greedy argmax breaks
    * ties on vec_id — the greedy loop unrolls as chained CTEs (the
    * kmeans/PageRank discipline applied to re-ranking).
    *
    * Scale shape: the pool build is the [[cosineTopK]] broadcast-probe
    * scan + TakeOrdered; the k selection steps then touch only the
    * bounded pool (≤ pool·k pair affinities), all tiny broadcasts. */
  private def mmrTopK(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val probe = e.filter(col("vec_id") === mmrProbe)
      .select(col("embedding").as("p"))
    val cand = e.crossJoin(broadcast(probe))
      .select(col("vec_id"), col("embedding"),
        pairAffinity(col("embedding"), col("p")).as("qaff"))
      .orderBy(col("qaff").desc, col("vec_id")).limit(mmrPool)
      .cut()
    var selected = cand.orderBy(col("qaff").desc, col("vec_id")).limit(1)
      .select(col("vec_id"), col("embedding"), col("qaff"),
        lit(1).as("rank"), col("qaff").as("score"))
      .cut()
    for (r <- 2 to mmrK) {
      val sel = selected.select(col("vec_id").as("sid"),
        col("embedding").as("semb"))
      val rest = cand.join(selected.select(col("vec_id")), Seq("vec_id"),
        "left_anti")
      val msim = rest.crossJoin(broadcast(sel))
        .select(col("vec_id"),
          pairAffinity(col("embedding"), col("semb")).as("ps"))
        .groupBy(col("vec_id")).agg(max(col("ps")).as("msim"))
      val pick = rest.join(msim, "vec_id")
        .select(col("vec_id"), col("embedding"), col("qaff"),
          (lit(0.7) * col("qaff") - lit(0.3) * col("msim")).as("score"))
        .orderBy(col("score").desc, col("vec_id")).limit(1)
        .select(col("vec_id"), col("embedding"), col("qaff"),
          lit(r).as("rank"), col("score"))
      selected = selected.unionAll(pick).cut()
    }
    selected.select(col("rank"), col("vec_id"), col("qaff"), col("score"))
      .orderBy("rank")
  }

  /** The greedy rounds unrolled as chained CTEs; `aff` is the
    * parallel-unnest ordered sum [[kmeansOracle]] uses. */
  private def mmrOracle: String = {
    def aff(a: String, b: String): String =
      s"""((SELECT sum(CAST(u.x AS DOUBLE) * CAST(u.y AS DOUBLE))
         |  FROM (SELECT unnest($a) AS x, unnest($b) AS y) u)
         | / (sqrt((SELECT sum(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE))
         |          FROM (SELECT unnest($a) AS x) u))
         |    * sqrt((SELECT sum(CAST(u.y AS DOUBLE) * CAST(u.y AS DOUBLE))
         |            FROM (SELECT unnest($b) AS y) u))))""".stripMargin
    val base =
      s"""WITH probe AS (SELECT embedding AS p FROM embeddings
         |              WHERE vec_id = $mmrProbe),
         |cand AS MATERIALIZED (
         |  SELECT vec_id, embedding,
         |         ${aff("embedding", "p")} AS qaff
         |  FROM embeddings CROSS JOIN probe
         |  ORDER BY qaff DESC, vec_id LIMIT $mmrPool),
         |sel1 AS MATERIALIZED (
         |  SELECT vec_id, embedding, qaff, 1 AS rank, qaff AS score
         |  FROM cand ORDER BY qaff DESC, vec_id LIMIT 1)""".stripMargin
    val rounds = (2 to mmrK).map { r =>
      val prev = (1 until r).map(i => s"SELECT * FROM sel$i")
        .mkString(" UNION ALL ")
      s"""r$r AS (
         |  SELECT c.vec_id, c.embedding, c.qaff,
         |         0.7 * c.qaff - 0.3 * max(${aff("c.embedding", "s.embedding")})
         |           AS score
         |  FROM cand c, ($prev) s
         |  WHERE c.vec_id NOT IN (SELECT vec_id FROM ($prev))
         |  GROUP BY c.vec_id, c.embedding, c.qaff),
         |sel$r AS MATERIALIZED (
         |  SELECT vec_id, embedding, qaff, $r AS rank, score
         |  FROM r$r ORDER BY score DESC, vec_id LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val out = (1 to mmrK).map(r =>
      s"SELECT rank, vec_id, qaff, score FROM sel$r").mkString("\nUNION ALL ")
    s"$base,\n$rounds\n$out\nORDER BY rank"
  }

  /** Semantic dedup [N] (SemDeDup, Abbas et al. 2023, re-expressed
    * over the exact k-NN graph): cluster embeddings whose k-NN edges
    * clear a cosine floor (0.35 here — the synthetic corpus has no
    * planted near-dups, so the floor sits in the top tail of the
    * observed cosine range), via the SAME min-label connected-
    * components loop the text near-dup family uses
    * ([[graft.ext.Dedup.connectedComponents]]); report multi-member
    * clusters with their min-id representative. Scale shape: knn
    * edges are label-blocked (never all-pairs), CC is the shared
    * iterative loop, the report is one hash agg. */
  private def semanticClusters(s: SparkSession, d: String): DataFrame = {
    // localCheckpoint: the CC loop joins the edge list EVERY round —
    // without the cut it would replay the blocked pair scan per round
    val edges = knnGraph(s, d)
      .filter(col("cosine") >= 0.35)
      .select(least(col("i"), col("j")).as("i"),
        greatest(col("i"), col("j")).as("j"))
      .distinct()
      .cut()
    val nodes = Tables.embeddings(s, d).select(col("vec_id").as("id"))
    Dedup.connectedComponents(nodes, edges)
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"),
        concat_ws(",", sort_array(collect_list(col("id")))).as("members"))
      .filter(col("cluster_size") >= 2)
      .orderBy("cluster_id")
  }

  /** SemDeDup with the LABEL-FREE build [N] (r11) — `dedup_semantic`'s
    * k-NN-graph stage swapped for [[knnGraphBucketed]], closing the
    * label crutch in the one downstream consumer of the blocked build:
    * at 100 TB SemDeDup runs on an unlabeled corpus, so its candidate
    * graph must come from the LSH-seeded NN-Descent machinery, not a
    * fixture label. CC is the alternating-STAR formulation, not
    * min-label rounds: unblocked threshold graphs over isotropic
    * embeddings grow long thin chains (measured at sf0.1: one
    * component's diameter exceeds 25 min-label rounds, splitting a
    * cluster), and large-star/small-star converges in O(log n) rounds
    * regardless of diameter — exactly the SCALE.md guidance. */
  private def semanticClustersBucketed(s: SparkSession, d: String): DataFrame = {
    VectorFunctions.register(s)
    import graft.Ckpt.CutOps
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val edges = knnGraphBucketed(e, GraphAnnDegree, NnDescentRounds)
      .filter(col("cosine") >= 0.35)
      .select(least(col("i"), col("j")).as("i"),
        greatest(col("i"), col("j")).as("j"))
      .distinct()
      .cut()
    val nodes = Tables.embeddings(s, d).select(col("vec_id").as("id"))
    Dedup.connectedComponentsStar(nodes, edges)._1
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"),
        concat_ws(",", sort_array(collect_list(col("id")))).as("members"))
      .filter(col("cluster_size") >= 2)
      .orderBy("cluster_id")
  }

  private def semanticBucketedOracle: String =
    s"""WITH RECURSIVE $lshWeightCtes,
       |${bucketedBuildCtes("", "embeddings")},
       |e0 AS MATERIALIZED (
       |  SELECT DISTINCT least(i, j) AS i, greatest(i, j) AS j
       |  FROM gk WHERE c >= 0.35),
       |edges AS MATERIALIZED (SELECT i AS src, j AS dst FROM e0
       |         UNION ALL SELECT j, i FROM e0),
       |nodes AS (SELECT vec_id AS id FROM embeddings),
       |reach(id, rr) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.dst, reach.rr FROM edges e JOIN reach ON e.src = reach.id),
       |lab AS (SELECT id, min(rr) AS cluster_id FROM reach GROUP BY id)
       |SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size,
       |       string_agg(CAST(id AS VARCHAR), ',' ORDER BY id) AS members
       |FROM lab GROUP BY cluster_id HAVING count(*) >= 2
       |ORDER BY cluster_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_semantic" -> semanticClusters,
    "dedup_semantic_bucketed" -> semanticClustersBucketed,
    "sim_search_mmr" -> mmrTopK,
    "emb_centroid_by_label" -> centroidByLabel,
    "emb_centroid_incremental" -> centroidIncremental,
    "emb_random_projection" -> randomProjection,
    "sim_search_ivf_pq" -> ivfPq,
    "sim_search_pq" -> pq,
    "sim_search_pq_served" -> pqServed,
    "sim_search_pq_batch" -> pqBatch,
    "emb_quantize_int8" -> quantizeInt8,
    "sim_search_quantized" -> quantizedTopK,
    "dedup_embedding_cosine" -> embCosinePairs,
    "emb_knn_graph" -> knnGraph,
    "sim_search_cosine" -> cosineTopK,
    "sim_search_truncated" -> truncatedTopK,
    "emb_hard_negatives" -> hardNegatives,
    "sim_search_ivf" -> ivfTopK,
    "sim_search_ivf_multi" -> ivfMulti,
    "sim_search_ivf_append" -> ivfAppend,
    "emb_knn_classify" -> knnClassify,
    "emb_drift" -> embDrift,
    "sim_search_ivf_kmeans" -> ivfKmeans,
    "sim_search_kmeans_assign" -> kmeansAssign,
    "sim_search_kmeans_centroids" -> kmeansCentroids,
    "sim_search_ivf_pinned" -> ivfPinnedServe,
    "sim_search_batch" -> batch,
    "sim_search_radius" -> radiusSearch,
    "sim_search_mips" -> mipsBatch,
    "sim_search_mips_augmented" -> mipsAugmented,
    "sim_search_ivf_batch" -> ivfBatch,
    "sim_search_ivf_saved" -> ivfSaved,
    "sim_search_knn_graph" -> knnGraphSearch,
    "sim_search_knn_graph_append" -> knnGraphAppend,
    "sim_search_knn_graph_bucketed" -> knnGraphBucketedSearch,
    "sim_search_hnsw" -> hnswServe,
    "sim_search_hnsw_served" -> hnswServedKey,
    "sim_search_hnsw_multi" -> hnswMultiServe,
    "sim_search_graph_batch" -> graphBatch)

  private val dotSql =
    """(SELECT sum(CAST(u.x AS DOUBLE) * CAST(u.y AS DOUBLE))
      | FROM (SELECT unnest(%s) AS x, unnest(%s) AS y) u)""".stripMargin

  private val centroidOracleSql =
      """WITH x AS (
        |  SELECT label,
        |         unnest(range(0, len(embedding))) AS pos,
        |         unnest(embedding) AS v
        |  FROM embeddings),
        |g AS (
        |  SELECT label, pos,
        |         CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1e6) AS BIGINT))
        |              AS BIGINT) AS s,
        |         count(*) AS n
        |  FROM x GROUP BY 1, 2)
        |SELECT label, CAST(min(n) AS BIGINT) AS n,
        |       array_to_string(list(s ORDER BY pos), ',') AS sums
        |FROM g GROUP BY label ORDER BY label""".stripMargin

  val oracles: Map[String, String] = Map(
    // zipped unnests give (pos, v); micro-unit pinning makes every sum
    // exact BIGINT on both engines
    "emb_centroid_by_label" -> centroidOracleSql,
    "emb_centroid_incremental" -> centroidOracleSql,
    "emb_random_projection" ->
      """WITH x AS (
        |  SELECT vec_id,
        |         unnest(range(0, len(embedding))) AS i,
        |         unnest(embedding) AS v
        |  FROM embeddings),
        |p AS (
        |  SELECT vec_id, i,
        |         CAST(floor(CAST(v AS DOUBLE) * 1e6) AS BIGINT) AS vd,
        |         j
        |  FROM x CROSS JOIN (SELECT unnest(range(0, 8)) AS j))
        |SELECT vec_id, CAST(j AS INTEGER) AS j,
        |       CAST(sum(vd * (CASE WHEN substr(md5(CAST(i AS VARCHAR)
        |              || '_' || CAST(j AS VARCHAR)), 1, 1)
        |              BETWEEN '0' AND '7' THEN 1 ELSE -1 END)) AS BIGINT)
        |         AS proj
        |FROM p GROUP BY vec_id, j
        |ORDER BY vec_id, j""".stripMargin,
    "sim_search_mmr" -> mmrOracle,
    "sim_search_kmeans_assign" -> kmeansAssignOracle,
    "sim_search_kmeans_centroids" -> kmeansCentroidsOracle,
    "sim_search_ivf_pinned" -> pinnedServeOracle(pinnedIters, nprobe = 4),
    "sim_search_ivf_kmeans" -> pinnedServeOracle(3, nprobe = 6),
    "sim_search_ivf_batch" -> pinnedBatchOracle(pinnedIters, nprobe = 4),
    "sim_search_ivf_saved" -> pinnedBatchOracle(pinnedIters, nprobe = 4),
    "sim_search_ivf" -> ivfLshOracle,
    "sim_search_knn_graph" -> knnGraphSearchOracle,
    "sim_search_knn_graph_append" -> knnGraphAppendOracle,
    "sim_search_knn_graph_bucketed" -> knnGraphBucketedOracle,
    "sim_search_hnsw" -> hnswOracle,
    // store serving is pinned bit-equal to the in-query descent, so the
    // served key shares the one-shot oracle verbatim
    "sim_search_hnsw_served" -> hnswOracle,
    "sim_search_hnsw_multi" -> hnswMultiOracle,
    "sim_search_graph_batch" -> graphBatchOracle,
    "sim_search_ivf_multi" -> ivfMultiOracle,
    "sim_search_ivf_append" ->
      pinnedBatchOracle(pinnedIters, nprobe = 4, "WHERE vec_id % 2 = 0"),
    "emb_knn_classify" -> knnClassifyOracle,
    "emb_drift" -> embDriftOracle,
    "sim_search_pq" -> pqOracle(m = 8, k = 16, iters = 3, rerank = 200),
    // store serving is pinned bit-equal to the in-query train+serve, so
    // the served key shares the one-shot oracle verbatim (the hnsw rule)
    "sim_search_pq_served" -> pqOracle(m = 8, k = 16, iters = 3, rerank = 200),
    "sim_search_pq_batch" -> pqBatchOracle(m = 8, k = 16, iters = 3, rerank = 200),
    "sim_search_ivf_pq" -> ivfPqOracle(pinnedIters, nprobe = 12, m = 8,
      kCodes = 16, pqIters = 3, rerank = 200),
    "emb_quantize_int8" ->
      """WITH m AS (
        |  SELECT vec_id, embedding,
        |         list_max(list_transform(embedding, x -> abs(x))) AS mx
        |  FROM embeddings),
        |s AS (
        |  SELECT vec_id, embedding,
        |         CASE WHEN mx > 0 THEN 127.0 / CAST(mx AS DOUBLE)
        |              ELSE 0.0 END AS scale
        |  FROM m),
        |u AS (
        |  SELECT vec_id, scale,
        |         generate_subscripts(embedding, 1) - 1 AS pos,
        |         unnest(embedding) AS v
        |  FROM s)
        |SELECT vec_id, CAST(pos AS INTEGER) AS pos,
        |       CAST(floor(CAST(v AS DOUBLE) * scale + 0.5) AS INTEGER) AS q
        |FROM u ORDER BY vec_id, pos""".stripMargin,
    "dedup_embedding_cosine" ->
      s"""WITH s AS (
         |  SELECT a.vec_id AS i, b.vec_id AS j,
         |         ${dotSql.format("a.embedding", "b.embedding")} AS d,
         |         ${dotSql.format("a.embedding", "a.embedding")} AS na,
         |         ${dotSql.format("b.embedding", "b.embedding")} AS nb
         |  FROM embeddings a JOIN embeddings b
         |    ON a.label = b.label AND a.vec_id < b.vec_id)
         |SELECT i, j, d / (sqrt(na) * sqrt(nb)) AS cosine
         |FROM s WHERE d / (sqrt(na) * sqrt(nb)) >= 0.45
         |ORDER BY i, j""".stripMargin,
    "dedup_semantic_bucketed" -> semanticBucketedOracle,
    "dedup_semantic" ->
      s"""WITH RECURSIVE s AS MATERIALIZED (
         |  SELECT a.vec_id AS i, b.vec_id AS j,
         |         ${dotSql.format("a.embedding", "b.embedding")} AS d,
         |         ${dotSql.format("a.embedding", "a.embedding")} AS na,
         |         ${dotSql.format("b.embedding", "b.embedding")} AS nb
         |  FROM embeddings a JOIN embeddings b
         |    ON a.label = b.label AND a.vec_id <> b.vec_id),
         |r AS MATERIALIZED (
         |  SELECT i, j, d / (sqrt(na) * sqrt(nb)) AS cosine,
         |         row_number() OVER (PARTITION BY i
         |           ORDER BY d / (sqrt(na) * sqrt(nb)) DESC, j) AS rnk
         |  FROM s),
         |e0 AS MATERIALIZED (
         |  SELECT DISTINCT least(i, j) AS i, greatest(i, j) AS j
         |  FROM r WHERE rnk <= 3 AND cosine >= 0.35),
         |edges AS MATERIALIZED (SELECT i AS src, j AS dst FROM e0
         |         UNION ALL SELECT j, i FROM e0),
         |nodes AS (SELECT vec_id AS id FROM embeddings),
         |reach(id, rr) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.dst, reach.rr FROM edges e JOIN reach ON e.src = reach.id),
         |lab AS (SELECT id, min(rr) AS cluster_id FROM reach GROUP BY id)
         |SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size,
         |       string_agg(CAST(id AS VARCHAR), ',' ORDER BY id) AS members
         |FROM lab GROUP BY cluster_id HAVING count(*) >= 2
         |ORDER BY cluster_id""".stripMargin,
    // r8: upgraded from rows-only — the int8 quantized dot products are
    // exact integers (≤ 64·127² ≈ 10⁶, far inside double-exact range),
    // so the quantized cosine is order-invariant and the whole query
    // mirrors exactly. Quantization itself is deterministic IEEE
    // (v·scale + 0.5 then floor), token-identical both engines.
    "sim_search_quantized" ->
      s"""WITH q AS MATERIALIZED (
         |  SELECT vec_id,
         |         list_transform(embedding, v ->
         |           CAST(floor(CAST(v AS DOUBLE) *
         |             (CASE WHEN mx > 0 THEN 127.0 / mx ELSE 0.0 END) + 0.5) AS FLOAT)) AS qe
         |  FROM (SELECT vec_id, embedding,
         |          CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) AS mx
         |        FROM embeddings)),
         |p AS (SELECT qe AS probe FROM q WHERE vec_id = 0)
         |SELECT q.vec_id,
         |       ${dotSql.format("q.qe", "p.probe")}
         |         / (sqrt(${dotSql.format("q.qe", "q.qe")})
         |            * sqrt(${dotSql.format("p.probe", "p.probe")})) AS qcosine
         |FROM q, p WHERE q.vec_id <> 0
         |ORDER BY qcosine DESC, vec_id LIMIT 10""".stripMargin,
    "emb_knn_graph" ->
      s"""WITH s AS (
         |  SELECT a.vec_id AS i, b.vec_id AS j,
         |         ${dotSql.format("a.embedding", "b.embedding")} AS d,
         |         ${dotSql.format("a.embedding", "a.embedding")} AS na,
         |         ${dotSql.format("b.embedding", "b.embedding")} AS nb
         |  FROM embeddings a JOIN embeddings b
         |    ON a.label = b.label AND a.vec_id <> b.vec_id),
         |r AS (
         |  SELECT i, j, d / (sqrt(na) * sqrt(nb)) AS cosine,
         |         row_number() OVER (PARTITION BY i
         |           ORDER BY d / (sqrt(na) * sqrt(nb)) DESC, j) AS rnk
         |  FROM s)
         |SELECT i, CAST(rnk AS INTEGER) AS rnk, j, cosine
         |FROM r WHERE rnk <= 3 ORDER BY i, rnk""".stripMargin,
    "sim_search_cosine" ->
      s"""WITH p AS (SELECT embedding AS pe FROM embeddings WHERE vec_id = 0),
         |s AS (
         |  SELECT e.vec_id,
         |         ${dotSql.format("e.embedding", "p.pe")} AS d,
         |         ${dotSql.format("e.embedding", "e.embedding")} AS na,
         |         ${dotSql.format("p.pe", "p.pe")} AS np
         |  FROM embeddings e, p WHERE e.vec_id <> 0)
         |SELECT vec_id, d / (sqrt(na) * sqrt(np)) AS cosine
         |FROM s ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin,
    "sim_search_truncated" ->
      s"""WITH p AS (SELECT list_slice(embedding, 1, 16) AS pe
         |           FROM embeddings WHERE vec_id = 0),
         |t AS (SELECT vec_id, list_slice(embedding, 1, 16) AS e16
         |      FROM embeddings WHERE vec_id <> 0),
         |s AS (
         |  SELECT t.vec_id,
         |         ${dotSql.format("t.e16", "p.pe")} AS d,
         |         ${dotSql.format("t.e16", "t.e16")} AS na,
         |         ${dotSql.format("p.pe", "p.pe")} AS np
         |  FROM t, p)
         |SELECT vec_id, d / (sqrt(na) * sqrt(np)) AS cosine
         |FROM s ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin,
    // hard negatives: same bit-identical cosine, restricted to rows with
    // a different label than the probe's
    "emb_hard_negatives" ->
      s"""WITH p AS (SELECT vec_id AS probe_id, embedding AS pe, label AS pl
         |           FROM embeddings WHERE vec_id < 20),
         |s AS (
         |  SELECT p.probe_id, e.vec_id,
         |         ${dotSql.format("e.embedding", "p.pe")} AS d,
         |         ${dotSql.format("e.embedding", "e.embedding")} AS na,
         |         ${dotSql.format("p.pe", "p.pe")} AS np
         |  FROM embeddings e, p WHERE e.label <> p.pl),
         |r AS (
         |  SELECT probe_id, vec_id, d / (sqrt(na) * sqrt(np)) AS cosine,
         |         row_number() OVER (PARTITION BY probe_id
         |           ORDER BY d / (sqrt(na) * sqrt(np)) DESC, vec_id) AS rn
         |  FROM s)
         |SELECT probe_id, CAST(rn AS INTEGER) AS rnk, vec_id, cosine
         |FROM r WHERE rn <= 10 ORDER BY probe_id, rnk""".stripMargin,
    // batch form: same bit-identical cosine, per-probe row_number top-10
    "sim_search_radius" ->
      s"""WITH p AS (SELECT vec_id AS probe_id, embedding AS pe
         |           FROM embeddings WHERE vec_id < 20),
         |s AS (
         |  SELECT p.probe_id, e.vec_id,
         |         ${dotSql.format("e.embedding", "p.pe")} AS d,
         |         ${dotSql.format("e.embedding", "e.embedding")} AS na,
         |         ${dotSql.format("p.pe", "p.pe")} AS np
         |  FROM embeddings e, p WHERE e.vec_id <> p.probe_id)
         |SELECT probe_id, vec_id, d / (sqrt(na) * sqrt(np)) AS cosine
         |FROM s WHERE d / (sqrt(na) * sqrt(np)) >= 0.35
         |ORDER BY probe_id, vec_id""".stripMargin,
    "sim_search_batch" ->
      s"""WITH p AS (SELECT vec_id AS probe_id, embedding AS pe
         |           FROM embeddings WHERE vec_id < 20),
         |s AS (
         |  SELECT p.probe_id, e.vec_id,
         |         ${dotSql.format("e.embedding", "p.pe")} AS d,
         |         ${dotSql.format("e.embedding", "e.embedding")} AS na,
         |         ${dotSql.format("p.pe", "p.pe")} AS np
         |  FROM embeddings e, p WHERE e.vec_id <> p.probe_id),
         |r AS (
         |  SELECT probe_id, vec_id, d / (sqrt(na) * sqrt(np)) AS cosine,
         |         row_number() OVER (PARTITION BY probe_id
         |           ORDER BY d / (sqrt(na) * sqrt(np)) DESC, vec_id) AS rn
         |  FROM s)
         |SELECT probe_id, CAST(rn AS INTEGER) AS rnk, vec_id, cosine
         |FROM r WHERE rn <= 10 ORDER BY probe_id, rnk""".stripMargin,
    // MIPS: raw dot-product ranking — no normalization anywhere
    "sim_search_mips" ->
      s"""WITH p AS (SELECT vec_id AS probe_id, embedding AS pe
         |           FROM embeddings WHERE vec_id < 20),
         |s AS (
         |  SELECT p.probe_id, e.vec_id,
         |         ${dotSql.format("e.embedding", "p.pe")} AS d
         |  FROM embeddings e, p WHERE e.vec_id <> p.probe_id),
         |r AS (
         |  SELECT probe_id, vec_id, d,
         |         row_number() OVER (PARTITION BY probe_id
         |           ORDER BY d DESC, vec_id) AS rn
         |  FROM s)
         |SELECT probe_id, CAST(rn AS INTEGER) AS rnk, vec_id, d AS dot
         |FROM r WHERE rn <= 10 ORDER BY probe_id, rnk""".stripMargin,
    // norm-augmentation reduction: score = d / (sqrt(max ‖x‖²)·‖q‖),
    // the exact cosine of the augmented vectors — same shape both engines
    "sim_search_mips_augmented" ->
      s"""WITH mx AS (
         |  SELECT max(${dotSql.format("e.embedding", "e.embedding")}) AS maxnsq
         |  FROM embeddings e),
         |p AS (SELECT vec_id AS probe_id, embedding AS pe,
         |             ${dotSql.format("embedding", "embedding")} AS pnsq
         |      FROM embeddings WHERE vec_id < 20),
         |s AS (
         |  SELECT p.probe_id, e.vec_id,
         |         ${dotSql.format("e.embedding", "p.pe")}
         |           / (sqrt(mx.maxnsq) * sqrt(p.pnsq)) AS ac
         |  FROM embeddings e, p, mx WHERE e.vec_id <> p.probe_id),
         |r AS (
         |  SELECT probe_id, vec_id, ac,
         |         row_number() OVER (PARTITION BY probe_id
         |           ORDER BY ac DESC, vec_id) AS rn
         |  FROM s)
         |SELECT probe_id, CAST(rn AS INTEGER) AS rnk, vec_id,
         |       ac AS aug_cosine
         |FROM r WHERE rn <= 10 ORDER BY probe_id, rnk""".stripMargin)
}
