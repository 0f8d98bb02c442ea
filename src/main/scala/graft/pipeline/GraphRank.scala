package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Link-analysis quality ranking over the corpus's SOURCE graph — the
  * "rank domains by how the web links them" signal (PageRank; Page et
  * al. 1999) that web-corpus pipelines fold into document quality
  * scores. The fixture corpus has no hyperlinks, so the graph is
  * derived from content: source A links source B when they share a
  * verbatim 8-token span (syndication/quotation), edge weight = the
  * number of distinct shared spans. Both the derivation and the 10
  * damped iterations are deterministic, so the whole operator carries a
  * DuckDB oracle (iterations unrolled as chained CTEs, the same move as
  * d_semdedup's unrolled k-means).
  *
  * Shape at 100 TB: span posting lists are df-capped (a span on more
  * than `maxSources` sources is template noise carrying no link signal
  * — the same capping rule as the dedup tiers), so edge generation is
  * bounded per span; the rank iteration moves only node- and edge-sized
  * frames (domains and domain pairs — millions of rows when documents
  * are billions), each round one aggregation behind a localCheckpoint
  * that truncates the 10-join lineage.
  */
object GraphRank {
  type Q = (SparkSession, String) => DataFrame

  /** Directed cross-source edges (both directions of each undirected
    * link): (src, dst, w) with w = distinct shared `n`-token spans,
    * spans on more than `maxSources` sources dropped.
    */
  def sourceEdges(docs: DataFrame, n: Int = 8,
      maxSources: Int = 10): DataFrame = {
    val base = graft.Tables.spread(docs)
      .select(col("source"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= n)
    val grams = base
      .select(col("source"),
        explode(sequence(lit(0), size(col("t")) - n)).as("pos"), col("t"))
      .select(col("source"),
        xxhash64((0 until n).map(j =>
          element_at(col("t"), col("pos") + j + 1)): _*).as("g"))
      .distinct()
    val capped = grams.groupBy("g")
      .agg(collect_list(col("source")).as("srcs"))
      .filter(size(col("srcs")).between(2, maxSources))
    capped
      .select(explode(col("srcs")).as("src"), col("srcs"))
      .select(col("src"), explode(col("srcs")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
  }

  /** Damped PageRank over weighted directed edges: 10 synchronous
    * rounds of `rank = (1-d)/N + d · Σ_in rank·w/outW`. Dangling-node
    * mass is dropped (not redistributed) — the simplest standard
    * variant, mirrored exactly by the oracle. Each round checkpoints
    * the node-sized frame, truncating lineage.
    */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int = 10,
      d: Double = 0.85): DataFrame = {
    val spark = nodes.sparkSession
    val nNodes = nodes.count()
    val base = (1.0 - d) / nNodes
    val outW = edges.groupBy("src").agg(sum(col("w")).as("ow"))
    val contribEdges = edges.join(outW, Seq("src"))
      .select(col("src"), col("dst"), (col("w") / col("ow")).as("frac"))
      .persist()
    // Size-gated driver fast path — the [[Dedup.dupClusters]] rule
    // applied to power iteration (r16): each synchronous round costs a
    // join + aggregate + checkpoint job over a NODE-sized frame, so a
    // source graph (nodes and edges bounded by |sources|², thousands at
    // any corpus size) pays 10 rounds of pure job overhead for driver-
    // trivial arithmetic. Graphs above the gate (or non-string node
    // ids) take the distributed path unchanged; GraphRankSpec pins both
    // paths to the same in-memory reference. The gate count doubles as
    // the distributed path's materialization of the reused edge frame.
    val maxEdges = spark.conf.getOption("graft.graph.driverMaxEdges")
      .map(_.toLong).getOrElse(1L << 20)
    val strIds = (nodes.schema.fields.head.dataType ==
      org.apache.spark.sql.types.StringType) &&
      edges.schema("src").dataType ==
        org.apache.spark.sql.types.StringType &&
      edges.schema("dst").dataType ==
        org.apache.spark.sql.types.StringType
    val eCnt = contribEdges.count()
    if (strIds && eCnt <= maxEdges && nNodes <= maxEdges) {
      import spark.implicits._
      val es = contribEdges
        .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      contribEdges.unpersist()
      val ns = nodes.collect().map(_.getString(0))
      var r = ns.map(_ -> 1.0 / nNodes).toMap
      for (_ <- 1 to iters) {
        val in = scala.collection.mutable.Map.empty[String, Double]
        es.foreach { case (s, t, frac) =>
          in(t) = in.getOrElse(t, 0.0) + r(s) * frac
        }
        r = ns.map(x => x -> (base + d * in.getOrElse(x, 0.0))).toMap
      }
      return ns.toSeq.map(x => (x, r(x))).toDF("node", "rank")
    }
    var ranks = nodes.select(col("node"),
      lit(1.0 / nNodes).as("rank")).localCheckpoint(true)
    for (_ <- 1 to iters) {
      val inMass = contribEdges
        .join(ranks, contribEdges("src") === ranks("node"))
        .groupBy("dst").agg(sum(col("rank") * col("frac")).as("ic"))
      // one eager checkpoint per round; batching 3 rounds between
      // checkpoints re-benched within host noise of this form (±15%,
      // overlapping ranges across JVMs), so the simpler
      // bounded-lineage-by-construction form stays
      ranks = nodes.join(inMass, nodes("node") === inMass("dst"), "left")
        .select(col("node"),
          (lit(base) + lit(d) * coalesce(col("ic"), lit(0.0))).as("rank"))
        .localCheckpoint(true)
    }
    contribEdges.unpersist()
    ranks
  }

  val queries: Map[String, Q] = Map(
    // rank rounded to 4 decimals: cross-engine double sums differ only
    // in the last couple of ulps (~1e-15 here) and Spark's partial-agg
    // order is partition-dependent, so the grain is kept coarse enough
    // (1e-4) that a rounding-boundary landing is astronomically
    // unlikely, while real rank differences still sit at 1e-3
    "p_source_rank" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val nodes = docs.select(col("source").as("node")).distinct()
      pageRank(nodes, sourceEdges(docs))
        .select(col("node").as("source"), round(col("rank"), 4).as("rank"))
        .orderBy("source")
    })

  /** The 10 rounds unrolled as chained CTEs r1..r10 over the edge CTEs. */
  private def pageRankOracle(iters: Int = 10, d: Double = 0.85): String = {
    val rounds = (1 to iters).map { i =>
      s"""r$i AS (
         |  SELECT n.node,
         |    (SELECT (1.0 - $d)/count(*) FROM nodes) + $d * coalesce(
         |      (SELECT sum(r.rank * e.frac)
         |       FROM r${i - 1} r JOIN fedges e ON e.src = r.node
         |       WHERE e.dst = n.node), 0) AS rank
         |  FROM nodes n)""".stripMargin
    }.mkString(",\n")
    s"""WITH toks AS (
       |  SELECT source, string_split(text, ' ') t FROM documents),
       |g AS (
       |  SELECT DISTINCT source,
       |    t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
       |      || ' ' || t[i+4] || ' ' || t[i+5] || ' ' || t[i+6]
       |      || ' ' || t[i+7] AS s
       |  FROM toks, unnest(range(1, len(t) - 8 + 2)) AS u(i)
       |  WHERE len(t) >= 8),
       |keep AS (
       |  SELECT s FROM (SELECT s, count(*) c FROM g GROUP BY s)
       |  WHERE c BETWEEN 2 AND 10),
       |edges AS (
       |  SELECT a.source AS src, b.source AS dst, count(*) AS w
       |  FROM g a JOIN keep USING (s)
       |  JOIN g b ON a.s = b.s AND a.source <> b.source
       |  GROUP BY 1, 2),
       |outw AS (SELECT src, sum(w) ow FROM edges GROUP BY src),
       |fedges AS (
       |  SELECT e.src, e.dst, e.w * 1.0 / o.ow AS frac
       |  FROM edges e JOIN outw o USING (src)),
       |nodes AS (SELECT DISTINCT source AS node FROM documents),
       |r0 AS (
       |  SELECT node, 1.0/(SELECT count(*) FROM nodes) AS rank
       |  FROM nodes),
       |$rounds
       |SELECT node AS source, round(rank, 4) AS rank
       |FROM r$iters ORDER BY source""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "p_source_rank" -> pageRankOracle())
}
