package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ArrayDot, GraftExtensions, GraftFunctions, RollingHash}
import graft.operators.AsOfJoin

/** SQL registration of native expressions + the composed as-of join. */
class FunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  test("registered SQL functions match the Column API") {
    GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_rolling_hash('hello world') AS h, " +
        "graft_array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head()
    assert(viaSql.getLong(0) == RollingHash.hashString("hello world"))
    assert(viaSql.getDouble(1) == 11.0)
    // z-order curve through SQL == the Column API form
    import org.apache.spark.sql.functions.{col, lit}
    val viaCol = spark.range(1)
      .select(graft.sources.ZOrderLayout.zvalue(lit(123456789L),
        lit(987654321L))).head().getLong(0)
    val zSql = spark.sql(
      "SELECT graft_zvalue(123456789L, 987654321L) AS z").head().getLong(0)
    assert(zSql == viaCol)
    // hilbert curve through SQL == the Column API form (fixed 16-bit
    // curve, the HilbertLayout contract)
    val hCol = spark.range(1)
      .select(graft.functions.HilbertValue.hilbert_value(
        lit(12345L), lit(54321L), graft.sources.HilbertLayout.Bits))
      .head().getLong(0)
    val hSql = spark.sql(
      "SELECT graft_hilbert_value(12345L, 54321L) AS h").head().getLong(0)
    assert(hSql == hCol)
    assert(hSql == graft.functions.HilbertValue.xy2d(12345L, 54321L, 16))
    // LCS through SQL == the Column API / reference value
    val lcsSql = spark.sql(
      "SELECT graft_lcs_length(array('a','x','b','y','c'), " +
        "array('a','b','c')) AS l").head().getInt(0)
    assert(lcsSql == 3)
    // P9 discipline: wrong arity names the function
    val err = intercept[Exception] {
      spark.sql("SELECT graft_lcs_length(array('a')) AS l").collect()
    }
    assert(err.getMessage.contains("graft_lcs_length"))
  }

  test("withExtensions sessions get the functions at build time") {
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val h = s2.sql("SELECT graft_rolling_hash('abc') AS h").head().getLong(0)
      assert(h == RollingHash.hashString("abc"))
    } finally () // shared-context session; do not stop the underlying SC
  }

  test("sketch aggregates are SQL-registered and match the Column API") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq((1L, 7L), (1L, 9L), (2L, 7L)).toDF("id", "h")
      .createOrReplaceTempView("sketch_in")
    val viaSql = spark.sql(
      """SELECT id, graft_simhash_sketch(h) AS sh,
        |       graft_minhash_sketch(h, 32) AS mh
        |FROM sketch_in GROUP BY id ORDER BY id""".stripMargin).collect()
    val viaCol = Seq((1L, 7L), (1L, 9L), (2L, 7L)).toDF("id", "h")
      .groupBy("id")
      .agg(graft.functions.SketchAggregates.simhash_sketch(col("h")).as("sh"),
        graft.functions.SketchAggregates.minhash_sketch(col("h"), 32)
          .as("mh"))
      .orderBy("id").collect()
    assert(viaSql.map(_.getLong(1)).toSeq == viaCol.map(_.getLong(1)).toSeq)
    assert(viaSql.map(_.getSeq[Long](2)).toSeq ==
      viaCol.map(_.getSeq[Long](2)).toSeq)
    // non-literal k is rejected at analysis
    intercept[Exception] {
      spark.sql("SELECT graft_minhash_sketch(h, id) FROM sketch_in").collect()
    }
  }

  test("ArrayNormalize: codegen, interpreted, and reference agree") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val samples = Seq(Seq(3.0, 4.0), Seq(1.0), Seq(0.0, 0.0), Seq.empty[Double])
    def ref(a: Seq[Double]): Seq[Double] = {
      val s = a.map(x => x * x).sum
      val inv = if (s > 0) 1.0 / math.sqrt(s) else 1.0
      a.map(_ * inv) // multiply-by-inverse, bit-exact with the expression
    }
    val viaExpr = samples.toDF("a")
      .select(graft.pipeline.VectorOps.normalized(col("a")))
      .collect().map(_.getSeq[Double](0).toSeq).toSeq
    assert(viaExpr == samples.map(ref))
    // unit norm for non-zero inputs
    assert(math.abs(viaExpr.head.map(x => x * x).sum - 1.0) < 1e-12)
    // SQL registration route agrees
    val viaSql = spark.sql(
      "SELECT graft_array_normalize(array(3.0d, 4.0d)) AS v")
      .head().getSeq[Double](0).toSeq
    assert(viaSql == ref(Seq(3.0, 4.0)))
    // null passes through; wrong type is an analysis error
    assert(Seq[Seq[Double]](null).toDF("a")
      .select(graft.pipeline.VectorOps.normalized(col("a"))).head().isNullAt(0))
    // a null ELEMENT nulls the result (never read as 0/garbage) — for
    // both normalize and dot
    val nullElem = spark.sql(
      """SELECT graft_array_normalize(array(1.0d, CAST(NULL AS DOUBLE))) n,
        |       graft_array_dot(array(1.0d, CAST(NULL AS DOUBLE)),
        |                       array(1.0d, 2.0d)) d""".stripMargin).head()
    assert(nullElem.isNullAt(0) && nullElem.isNullAt(1))
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq("x").toDF("s")
        .select(graft.functions.ArrayNormalize.array_normalize(col("s")))
        .collect()
    }
    // LENGTH mismatch nulls the dot (corrupt row must surface, not
    // silently truncate to the shorter length and deflate similarity)
    val mismatch = spark.sql(
      """SELECT graft_array_dot(array(1.0d, 2.0d, 3.0d),
        |                       array(1.0d, 2.0d)) d""".stripMargin).head()
    assert(mismatch.isNullAt(0))
    // SQL arity misuse is an IllegalArgumentException naming the
    // function — never a silently-ignored extra argument
    val wrongArity = intercept[Exception] {
      spark.sql("SELECT graft_array_dot(array(1.0d), array(1.0d), 3)")
        .collect()
    }
    assert(wrongArity.getMessage.contains("graft_array_dot") ||
      Option(wrongArity.getCause)
        .exists(_.getMessage.contains("graft_array_dot")),
      wrongArity.toString)
  }

  test("as-of join picks the latest right row at-or-before, per key") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val left = Seq( // (key, time, label)
      ("a", ts(100), "L1"), ("a", ts(200), "L2"), ("b", ts(150), "L3"),
      ("c", ts(10), "L4")) // key with no right rows at all
      .toDF("k", "t", "label")
    val right = Seq(
      ("a", ts(50), 1L), ("a", ts(100), 2L),  // equality: 2 matches L1
      ("a", ts(150), 3L), ("a", ts(250), 4L), // 250 is AFTER L2 → ignored
      ("b", ts(160), 5L))                     // after L3 → b unmatched
      .toDF("k", "t", "rid")
    val out = AsOfJoin.asOf(left, right, "k", "t", Seq("rid" -> "match"))
      .select("label", "match").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out == Map("L1" -> 2L, "L2" -> 3L, "L3" -> -1L, "L4" -> -1L))
  }

  test("as-of join carries genuine null payloads, not stale older values") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val left = Seq(("a", ts(200), "L")).toDF("k", "t", "label")
    val right = Seq(
      ("a", ts(50), Some(1L), "old"),
      ("a", ts(150), None: Option[Long], "new")) // most recent: null payload
      .toDF("k", "t", "rid", "tag2")
    val row = AsOfJoin.asOf(left, right, "k", "t",
      Seq("rid" -> "m_rid", "tag2" -> "m_tag")).head()
    // the ts=150 row wins: its rid is genuinely null (NOT the stale 1L),
    // and both carried columns come from that same row
    assert(row.isNullAt(row.fieldIndex("m_rid")))
    assert(row.getString(row.fieldIndex("m_tag")) == "new")
  }

  test("as-of join rejects colliding output names") {
    import spark.implicits._
    val df = Seq(("a", new java.sql.Timestamp(0L), 1L)).toDF("k", "t", "x")
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(df, df, "k", "t", Seq("x" -> "x"))
    }
  }
}
