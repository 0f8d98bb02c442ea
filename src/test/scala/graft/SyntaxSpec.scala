package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.syntax._

/** The fluent facade must delegate (not reimplement), and GraftExtensions
  * must be the one-stop registration: functions + TopK strategy + its
  * optimizer rules.
  */
class SyntaxSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"

  test("fluent syntax equals the module operators") {
    val ev = Tables.events(spark, sf)
    val viaSyntax = ev
      .graftTopKPerKey(Seq("user_id"), Seq(("event_id", false)), 3)
      .select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = plans.TopKPerKey
      .topKPerKey(ev, Seq("user_id"), Seq(("event_id", false)), 3)
      .select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaSyntax == direct && viaSyntax.nonEmpty)

    val docs = Tables.documents(spark, sf)
    assert(docs.graftJaccardPairs(0.8).count() ==
      pipeline.Dedup.jaccardPairs(docs, 0.8).count())
    assert(docs.graftTrainingSet.columns.toSeq ==
      Seq("doc_id", "quality", "n_tokens"))
    assert(docs.graftQualityGate(0.25).count() ==
      pipeline.TrainingSet.qualityPercentileGate(docs, 0.25).count())

    val spec = filters.FilterSpec(Seq(filters.PayloadFilter(
      "k", filters.FilterVerbs.GreaterThanOrEqual, "1")))
    assert(ev.graftFilterPayload(spec, col("props")).count() ==
      ev.filter(filters.FilterCompiler.compile(spec, col("props"))).count())

    val stages = Seq("signup", "view", "click", "purchase")
    assert(ev.graftFunnel(stages).collect().toSeq ==
      pipeline.EventWindows.funnel(ev, stages).collect().toSeq)
    assert(ev.graftCohortRetention("signup").count() ==
      pipeline.EventWindows.cohortRetention(ev, "signup").count())
    assert(ev.graftTransitions.count() ==
      pipeline.EventWindows.transitions(ev).count())
    val fq = pipeline.Retrieval.FixtureQueries
    val legs = Seq(pipeline.Retrieval.bm25TopK(docs, fq, 10),
      docs.graftQlTopK(fq, 10))
    assert(legs.head.graftRrfFuse(legs.tail, 10).count() ==
      pipeline.Retrieval.rrfFuse(legs, 10).count())
    val factors = Seq("src0" -> 2, "src1" -> 3)
    assert(docs.graftEpochMix(factors).count() ==
      pipeline.TrainingSet.epochMix(docs, factors).count())
    // round-7 facade entries
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pe"), unix_micros(col("ts")).as("lus"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("ce"), unix_micros(col("ts")).as("rus"))
    assert(p.graftBandJoin(c, "lus", "rus", 60000000L).count() ==
      operators.BandJoin.bandJoin(p, c, "lus", "rus", 60000000L).count())
    assert(docs.graftInterleaveSources("wv7").collect().toSet ==
      pipeline.CorpusOps.interleaveSources(docs, "wv7").collect().toSet)
    assert(ev.graftGapFillHourly.count() ==
      pipeline.EventWindows.gapFillHourly(ev).count())
    val emb = Tables.embeddings(spark, sf)
    assert(emb.graftMahalanobisTop(5).collect().toSeq ==
      pipeline.Projection.mahalanobisTop(emb, 5).collect().toSeq)
  }

  test("GraftExtensions injects functions, strategy, and optimizer rules") {
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new functions.GraftExtensions()(e)
    import org.apache.spark.sql.graftshim.Bridge
    assert(Bridge.extensionOptimizerRules(e, spark).toSet ==
      plans.TopKOptimizations.rules.toSet + plans.BandJoinRewrite)
    assert(Bridge.extensionStrategies(e, spark)
      .contains(plans.TopKPerKeyStrategy))
  }

  test("deployment recipe: the spark.sql.extensions path registers " +
      "EXACTLY the function surface register() does, and the class " +
      "satisfies the reflective contract a stock shell uses") {
    import org.apache.spark.sql.graftshim.Bridge
    // what `spark.sql.extensions=graft.functions.GraftExtensions` does:
    // reflectively instantiate by name (zero-arg ctor, Function1 type —
    // the exact contract SparkSession.applyExtensions requires)...
    val inst = Class.forName("graft.functions.GraftExtensions")
      .getDeclaredConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
    val e = new org.apache.spark.sql.SparkSessionExtensions
    inst(e)
    // ...and the function set it would install on the new session is
    // the SAME set the imperative register() path installs
    val viaExt = Bridge.extensionFunctionIds(e).map(_.funcName).toSet
    assert(viaExt == functions.GraftFunctions.all.map(_._1.funcName).toSet)
    functions.GraftFunctions.register(spark)
    viaExt.foreach(n =>
      assert(spark.catalog.functionExists(n), s"register() missing $n"))
  }
}
