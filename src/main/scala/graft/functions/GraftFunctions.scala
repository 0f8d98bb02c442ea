package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.SparkSessionExtensions

/** SQL-surface registration of the engine's native expressions, so
  * `spark.sql("SELECT graft_rolling_hash(text) ...")` works alongside the
  * Column API.
  *
  * Two routes:
  *   - [[GraftExtensions]]: `SparkSessionExtensions` for new sessions —
  *     `SparkSession.builder().withExtensions(new GraftExtensions)` or
  *     `spark.sql.extensions=graft.functions.GraftExtensions`;
  *   - [[GraftFunctions.register]]: imperative registration on an
  *     existing session (what `SparkEntry.queries` uses).
  */
object GraftFunctions {
  /** P9 discipline for the SQL surface: wrong arity is an
    * IllegalArgumentException naming the function, never a silent extra
    * argument (`graft_array_dot(a, b, c)` computing dot(a, b)) or a bare
    * IndexOutOfBounds.
    */
  private def arity(name: String, n: Int)(
      exprs: Seq[Expression]): Seq[Expression] = {
    if (exprs.length != n) throw new IllegalArgumentException(
      s"$name takes $n argument(s), got ${exprs.length}")
    exprs
  }

  val all: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "graft_rolling_hash"),
      (exprs: Seq[Expression]) =>
        RollingHash(arity("graft_rolling_hash", 1)(exprs).head)),
    (FunctionIdentifier("graft_array_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "graft_array_dot"),
      (exprs: Seq[Expression]) => {
        val e = arity("graft_array_dot", 2)(exprs)
        ArrayDot(e(0), e(1))
      }),
    (FunctionIdentifier("graft_array_normalize"),
      new ExpressionInfo(classOf[ArrayNormalize].getName,
        "graft_array_normalize"),
      (exprs: Seq[Expression]) =>
        ArrayNormalize(arity("graft_array_normalize", 1)(exprs).head)),
    (FunctionIdentifier("graft_simhash_sketch"),
      new ExpressionInfo(classOf[SimHashSketch].getName,
        "graft_simhash_sketch"),
      (exprs: Seq[Expression]) =>
        SimHashSketch(arity("graft_simhash_sketch", 1)(exprs).head)
          .toAggregateExpression()),
    (FunctionIdentifier("graft_minhash_sketch"),
      new ExpressionInfo(classOf[MinHashSketch].getName,
        "graft_minhash_sketch"),
      (exprs: Seq[Expression]) => {
        // k must be a positive literal int: graft_minhash_sketch(h, 32).
        // Arity and range are checked here so SQL misuse gets the same
        // IllegalArgumentException discipline as the filter verbs (P9),
        // not an IndexOutOfBounds — and k <= 0 would build empty
        // signatures whose LSH bands all collide (all-pairs explosion).
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"graft_minhash_sketch takes (hash, k), got ${exprs.length} args")
        val k = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
            if v.isInstanceOf[Int] && v.asInstanceOf[Int] > 0 =>
            v.asInstanceOf[Int]
          case other => throw new IllegalArgumentException(
            "graft_minhash_sketch k must be a positive integer literal, " +
              s"got $other")
        }
        MinHashSketch(exprs.head, k).toAggregateExpression()
      }),
    (FunctionIdentifier("graft_freq_sketch"),
      new ExpressionInfo(classOf[FreqSketch].getName, "graft_freq_sketch"),
      (exprs: Seq[Expression]) => {
        // same literal discipline as minhash's k: the counter budget must
        // be a positive literal (m <= 0 could never admit an item)
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"graft_freq_sketch takes (item, m), got ${exprs.length} args")
        val m = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
            if v.isInstanceOf[Int] && v.asInstanceOf[Int] > 0 =>
            v.asInstanceOf[Int]
          case other => throw new IllegalArgumentException(
            "graft_freq_sketch m must be a positive integer literal, " +
              s"got $other")
        }
        FreqSketch(exprs.head, m).toAggregateExpression()
      }),
    (FunctionIdentifier("graft_lcs_length"),
      new ExpressionInfo(classOf[LcsLength].getName, "graft_lcs_length"),
      (exprs: Seq[Expression]) => {
        val e = arity("graft_lcs_length", 2)(exprs)
        LcsLength(e(0), e(1))
      }),
    (FunctionIdentifier("graft_zvalue"),
      new ExpressionInfo("graft.sources.ZOrderLayout", "graft_zvalue"),
      (exprs: Seq[Expression]) => {
        // the Morton interleave as a catalyst tree built from the SAME
        // step list the Column/oracle forms use — three spellings, one
        // definition (sources.ZOrderLayout.SpreadSteps)
        val e = arity("graft_zvalue", 2)(exprs)
        graft.sources.ZOrderLayout.zvalueExpr(e(0), e(1))
      }),
    (FunctionIdentifier("graft_hilbert_value"),
      new ExpressionInfo(classOf[HilbertValue].getName,
        "graft_hilbert_value"),
      (exprs: Seq[Expression]) => {
        // fixed 16-bit curve, the HilbertLayout contract — a SQL-surface
        // `bits` argument would let two call sites silently disagree on
        // the curve a layout was written with
        val e = arity("graft_hilbert_value", 2)(exprs)
        HilbertValue(
          org.apache.spark.sql.catalyst.expressions.Cast(e(0),
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.catalyst.expressions.Cast(e(1),
            org.apache.spark.sql.types.LongType),
          graft.sources.HilbertLayout.Bits)
      }))

  /** Register on a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    org.apache.spark.sql.graftshim.Bridge.registerFunctions(spark, all)
}

/** Extensions entry point for `withExtensions` / `spark.sql.extensions`:
  * the whole engine in one registration — SQL functions, the TopKPerKey
  * planner strategy, and its optimizer rules. (`graft.plans
  * .TopKExtensions` remains available for strategy/rules alone.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (id, info, builder) =>
      e.injectFunction((id, info, builder))
    }
    new graft.plans.TopKExtensions()(e)
    // rescue naive |a − b| <= δ joins from the nested-loop product
    e.injectOptimizerRule(_ => graft.plans.BandJoinRewrite)
  }
}
