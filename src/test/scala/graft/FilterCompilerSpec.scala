package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.filters._

/** Unit coverage of the filter compiler against the reference semantics
  * (`Decisions.Kinesis/KinesisThreadJobs.cs:731-814`): all 18 verbs,
  * AND/OR composition, missing property, parse pass-through, unknown verb.
  */
class FilterCompilerSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  private def verdicts(bodies: Seq[String], spec: FilterSpec): Seq[Boolean] = {
    val df = bodies.toDF("body")
    df.select(FilterCompiler.compile(spec, col("body")).as("v"))
      .collect().map(_.getBoolean(0)).toSeq
  }

  private def one(body: String, f: PayloadFilter, useOr: Boolean = false) =
    verdicts(Seq(body), FilterSpec(Seq(f), useOr)).head

  val doc = """{"user":{"type":"Admin"},"n":"42","s":"Hello"}"""

  test("Equals / Not Equals, case-sensitive and insensitive") {
    assert(one(doc, PayloadFilter("user.type", "Equals", "Admin")))
    assert(!one(doc, PayloadFilter("user.type", "Equals", "admin")))
    assert(one(doc, PayloadFilter("user.type", "Equals (Case Insensitive)", "ADMIN")))
    assert(one(doc, PayloadFilter("user.type", "Not Equals", "admin")))
    assert(!one(doc, PayloadFilter("user.type", "Not Equals (Case Insensitive)", "admin")))
  }

  test("Contains / Starts With / Ends With") {
    assert(one(doc, PayloadFilter("s", "Contains", "ell")))
    assert(!one(doc, PayloadFilter("s", "Contains", "ELL")))
    assert(one(doc, PayloadFilter("s", "Contains (Case Insensitive)", "ELL")))
    assert(one(doc, PayloadFilter("s", "Starts With", "He")))
    assert(one(doc, PayloadFilter("s", "Starts With (Case Insensitive)", "hE")))
    assert(one(doc, PayloadFilter("s", "Ends With", "llo")))
    assert(one(doc, PayloadFilter("s", "Ends With (Case Insensitive)", "LLO")))
  }

  test("ordering verbs are STRING comparisons (finding S1)") {
    // "9" > "1000" ordinal-string-wise — the reference's actual behavior
    // (KinesisThreadJobs.cs:778-801), despite README claiming numeric.
    val d = """{"v":"9"}"""
    assert(one(d, PayloadFilter("v", "Greater Than", "1000")))
    assert(!one(d, PayloadFilter("v", "Less Than", "1000")))
    assert(one(d, PayloadFilter("v", "Greater Than or Equal", "9")))
    assert(one(d, PayloadFilter("v", "Less Than or Equal", "9")))
    assert(one(doc, PayloadFilter("s", "Greater Than (Case Insensitive)", "GOODBYE")))
    assert(one(doc, PayloadFilter("s", "Less Than (Case Insensitive)", "hellp")))
    assert(one(doc, PayloadFilter("s", "Greater Than or Equal (Case Insensitive)", "HELLO")))
    assert(one(doc, PayloadFilter("s", "Less Than or Equal (Case Insensitive)", "HELLO")))
  }

  test("numeric JSON values compare as their string form") {
    val d = """{"k": 87}"""
    assert(one(d, PayloadFilter("k", "Equals", "87")))
    assert(one(d, PayloadFilter("k", "Greater Than", "50"))) // "87" > "50"
    assert(!one(d, PayloadFilter("k", "Greater Than", "9"))) // "87" < "9"
  }

  test("AND: all must match; first fail rejects (TJ:809-810)") {
    val spec = FilterSpec(Seq(
      PayloadFilter("s", "Starts With", "He"),
      PayloadFilter("n", "Equals", "42")))
    assert(verdicts(Seq(doc), spec) == Seq(true))
    val spec2 = FilterSpec(Seq(
      PayloadFilter("s", "Starts With", "He"),
      PayloadFilter("n", "Equals", "43")))
    assert(verdicts(Seq(doc), spec2) == Seq(false))
  }

  test("OR: any match accepts (TJ:807-808)") {
    val spec = FilterSpec(Seq(
      PayloadFilter("s", "Equals", "nope"),
      PayloadFilter("n", "Equals", "42")), useOr = true)
    assert(verdicts(Seq(doc), spec) == Seq(true))
    val spec2 = FilterSpec(Seq(
      PayloadFilter("s", "Equals", "nope"),
      PayloadFilter("n", "Equals", "43")), useOr = true)
    assert(verdicts(Seq(doc), spec2) == Seq(false))
  }

  test("missing property: AND rejects, OR skips (TJ:736-741)") {
    assert(!one(doc, PayloadFilter("missing", "Equals", "x")))
    // Not Equals on a missing property is ALSO a reject under AND — the
    // reference returns false before the verb is even evaluated.
    assert(!one(doc, PayloadFilter("missing", "Not Equals", "x")))
    val orSpec = FilterSpec(Seq(
      PayloadFilter("missing", "Equals", "x"),
      PayloadFilter("n", "Equals", "42")), useOr = true)
    assert(verdicts(Seq(doc), orSpec) == Seq(true))
    val orMiss = FilterSpec(Seq(
      PayloadFilter("missing", "Equals", "x")), useOr = true)
    assert(verdicts(Seq(doc), orMiss) == Seq(false))
  }

  test("parse failure passes the record through (P8, TJ:694-714)") {
    val bad = """{"k": 87"""
    val spec = FilterSpec(Seq(PayloadFilter("k", "Equals", "nomatch")))
    assert(verdicts(Seq(bad), spec) == Seq(true))   // delivered despite filter
    assert(verdicts(Seq(doc), spec) == Seq(false))  // valid JSON is filtered
  }

  test("empty filter list delivers everything regardless of useOr (TJ:694)") {
    assert(verdicts(Seq(doc), FilterSpec(Nil, useOr = false)) == Seq(true))
    assert(verdicts(Seq(doc), FilterSpec(Nil, useOr = true)) == Seq(true))
  }

  test("vacuous matchPredicate follows TJ:813: AND ∅=true, OR ∅=false") {
    val df = Seq(doc).toDF("body")
    val and = df.select(FilterCompiler
      .matchPredicate(FilterSpec(Nil, useOr = false), col("body")).as("v"))
      .head().getBoolean(0)
    val or = df.select(FilterCompiler
      .matchPredicate(FilterSpec(Nil, useOr = true), col("body")).as("v"))
      .head().getBoolean(0)
    assert(and && !or)
  }

  test("unknown verb fails at compile time (P9, TJ:802-804)") {
    val spec = FilterSpec(Seq(PayloadFilter("s", "Approximately", "x")))
    intercept[IllegalArgumentException] {
      FilterCompiler.compile(spec, col("body"))
    }
  }

  test("validation rejects empty property/verb/value (P10, MQ:459-470)") {
    assert(FilterValidation.validate(FilterSpec(Seq(
      PayloadFilter("", "Equals", "x")))).nonEmpty)
    assert(FilterValidation.validate(FilterSpec(Seq(
      PayloadFilter("p", "", "x")))).nonEmpty)
    assert(FilterValidation.validate(FilterSpec(Seq(
      PayloadFilter("p", "Equals", "")))).nonEmpty)
    assert(FilterValidation.validate(FilterSpec(Seq(
      PayloadFilter("p", "Equals", "x")))).isEmpty)
  }

  test("nested JSON path with arbitrary depth") {
    val deep = """{"a":{"b":{"c":"leaf"}}}"""
    assert(one(deep, PayloadFilter("a.b.c", "Equals", "leaf")))
  }

  private def oneTyped(body: String, f: PayloadFilter): Boolean =
    Seq(body).toDF("body")
      .select(FilterCompiler.compileTyped(FilterSpec(Seq(f)), col("body"))
        .as("v")).head().getBoolean(0)

  test("typed extension compares numerically where S1 compares ordinally") {
    val d9 = """{"n":"9"}"""
    // the locked-in reference semantics: "9" > "10" ordinally
    assert(one(d9, PayloadFilter("n", "Greater Than", "10")))
    // the typed extension: 9 > 10 is false, 9 < 10 is true
    assert(!oneTyped(d9, PayloadFilter("n", "Greater Than", "10")))
    assert(oneTyped(d9, PayloadFilter("n", "Less Than", "10")))
    // bare JSON numbers work the same as quoted ones
    assert(oneTyped("""{"n":42}""", PayloadFilter("n", "Equals", "42")))
  }

  test("typed extension keeps P7/P8: missing→non-match, non-object→deliver") {
    assert(!oneTyped("""{"other":1}""", PayloadFilter("n", "Equals", "1")))
    assert(!oneTyped("""{"n":"abc"}""", PayloadFilter("n", "Equals", "1")))
    assert(oneTyped("not json", PayloadFilter("n", "Equals", "1")))
    assert(oneTyped("[1,2]", PayloadFilter("n", "Equals", "1")))
  }

  test("typed extension rejects substring verbs and non-numeric values") {
    intercept[IllegalArgumentException] {
      FilterCompiler.compileTyped(
        FilterSpec(Seq(PayloadFilter("n", "Contains", "1"))), col("body"))
    }
    intercept[IllegalArgumentException] {
      FilterCompiler.compileTyped(
        FilterSpec(Seq(PayloadFilter("n",
          "Greater Than (Case Insensitive)", "1"))), col("body"))
    }
    intercept[IllegalArgumentException] {
      FilterCompiler.compileTyped(
        FilterSpec(Seq(PayloadFilter("n", "Equals", "abc"))), col("body"))
    }
  }

  // ---- single-parse path (compileParsed) ---------------------------------

  private val parsedSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "user STRUCT<type: STRING>, n STRING, s STRING, " +
      "ids ARRAY<STRING>, ks ARRAY<INT>, missing STRING")

  /** compileParsed over one from_json of the body. */
  private def verdictsParsed(bodies: Seq[String],
      spec: FilterSpec): Seq[Boolean] = {
    val df = bodies.toDF("body")
      .withColumn("parsed",
        FilterCompiler.parseForFilters(col("body"), parsedSchema))
    df.select(FilterCompiler.compileParsed(spec, col("parsed")).as("v"))
      .collect().map(_.getBoolean(0)).toSeq
  }

  test("compileParsed ≡ compile across object / missing-prop / array / " +
      "scalar / malformed / null bodies (P5-P8 parity)") {
    val bodies = Seq(
      doc,                               // object, all props present
      """{"s":"Hello"}""",               // object, filter prop missing
      "[1,2,3]",                         // top-level array → deliver
      "42",                              // bare scalar → deliver
      "\"just a string\"",               // bare string → deliver
      "not json at all",                 // malformed → deliver
      "null",                            // bare null → deliver
      null)                              // null body → deliver
    val specs = Seq(
      FilterSpec(Seq(PayloadFilter("user.type", "Equals", "Admin"))),
      FilterSpec(Seq(PayloadFilter("n", "Greater Than", "100"))), // S1 string
      FilterSpec(Seq(
        PayloadFilter("user.type", "Equals", "Admin"),
        PayloadFilter("missing", "Equals", "x"))),
      FilterSpec(Seq(
        PayloadFilter("user.type", "Equals", "nope"),
        PayloadFilter("s", "Starts With (Case Insensitive)", "hel")),
        useOr = true),
      FilterSpec(Nil))
    for (spec <- specs)
      assert(verdictsParsed(bodies, spec) == verdicts(bodies, spec),
        s"single-parse verdicts diverged for $spec")
  }

  test("compileParsedTyped ≡ compileTyped across the same body shapes " +
      "(numeric verbs, P7/P8 parity)") {
    val bodies = Seq(
      doc,                               // n = "42"
      """{"n":"9"}""",                   // 9 < 100 numerically, > ordinally
      """{"n":"abc"}""",                 // unparseable number → non-match
      """{"s":"Hello"}""",               // n missing → non-match
      "[1,2,3]", "42", "not json at all", "null", null) // all deliver
    val specs = Seq(
      FilterSpec(Seq(PayloadFilter("n", "Greater Than", "100"))),
      FilterSpec(Seq(PayloadFilter("n", "Less Than or Equal", "42"))),
      FilterSpec(Seq(
        PayloadFilter("n", "Greater Than or Equal", "9"),
        PayloadFilter("n", "Less Than", "50"))),
      FilterSpec(Seq(
        PayloadFilter("n", "Equals", "42"),
        PayloadFilter("missing", "Not Equals", "5")), useOr = true))
    for (spec <- specs) {
      val df = bodies.toDF("body")
        .withColumn("parsed",
          FilterCompiler.parseForFilters(col("body"), parsedSchema))
      val parsed = df
        .select(FilterCompiler.compileParsedTyped(spec, col("parsed")).as("v"))
        .collect().map(_.getBoolean(0)).toSeq
      val reparse = bodies.toDF("body")
        .select(FilterCompiler.compileTyped(spec, col("body")).as("v"))
        .collect().map(_.getBoolean(0)).toSeq
      assert(parsed == reparse, s"typed single-parse diverged for $spec")
    }
  }

  test("compileParsed resolves array-index paths against the struct " +
      "(P4 grammar: ids[0], ks[1])") {
    val bodies = Seq(
      """{"ids":["purchase","backup"],"ks":[7,5]}""",
      """{"ids":["refund","backup"],"ks":[7,5]}""",
      """{"ids":[],"ks":[7,5]}""") // index out of range → null → non-match
    val spec = FilterSpec(Seq(PayloadFilter("ids[0]", "Equals", "purchase")))
    assert(verdictsParsed(bodies, spec) == Seq(true, false, false))
    // typed field compared as its STRING form (S1 parity): ks[1]="5"
    val spec2 = FilterSpec(Seq(PayloadFilter("ks[1]", "Equals", "5")))
    assert(verdictsParsed(bodies.take(1), spec2) == Seq(true))
    // and ordinal-string ordering survives the typed field: "7" > "10"
    val spec3 = FilterSpec(Seq(PayloadFilter("ks[0]", "Greater Than", "10")))
    assert(verdictsParsed(bodies.take(1), spec3) == Seq(true))
  }

  test("structPath rejects malformed path segments") {
    intercept[IllegalArgumentException] {
      FilterCompiler.structPath(col("p"), "ids[")
    }
  }
}
