package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.filters._

/** The reference's query core expressed as oracle-checkable batch queries
  * over the `events` fixture (`props` = the JSON message body, SURVEY §2.3).
  *
  * Each query compiles a [[FilterSpec]] with [[FilterCompiler]] — the same
  * code path a streaming queue definition uses — so the DuckDB differential
  * check locks in the reference's semantics: string-only comparisons
  * (finding S1, `KinesisThreadJobs.cs:743,778-801`), AND/OR composition
  * (`:807-813`), missing-property handling (`:736-741`), parse-failure
  * pass-through (`:694-714`).
  */
object FilterQueries {
  type Q = (SparkSession, String) => DataFrame

  private def events(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)

  /** Single-parse plan for the whole family (the shape SCALING.md
    * documents): ONE `from_json` feeds the P8 validity gate, every
    * filter extraction, and the output projection. The legacy
    * `get_json_object` path re-parses the body per call — a one-verb
    * query pays 3 Jackson parses per row (validity probe + filter +
    * output), measured ~1.0 s vs ~0.4 s per query at sf0.1, and the
    * parse runs inside the SCAN stage (the filter pushes below any
    * exchange), so it cannot be parallelized away on a one-row-group
    * fixture. Parity with the re-parse path across object/array/scalar/
    * malformed/null bodies is spec-pinned in FilterCompilerSpec; every
    * oracle below is unchanged.
    */
  private val KSchema =
    org.apache.spark.sql.types.StructType.fromDDL("k STRING")

  /** Spark side of a verb query on `props.$.k` (case-sensitive family). */
  private def verbOnK(verb: String, value: String): Q = (s, d) => {
    val spec = FilterSpec(Seq(PayloadFilter("k", verb, value)))
    events(s, d)
      .withColumn("parsed",
        FilterCompiler.parseForFilters(col("props"), KSchema))
      .filter(FilterCompiler.compileParsed(spec, col("parsed")))
      .select(col("event_id"), col("parsed.k").as("k"))
      .orderBy("event_id")
  }

  private def verbOnKSql(op: String, value: String): String =
    s"""SELECT event_id, json_extract_string(props, '$$.k') AS k
       |FROM events
       |WHERE json_extract_string(props, '$$.k') $op '$value'
       |ORDER BY event_id""".stripMargin

  /** Case-insensitive family runs against a JSON body synthesized from
    * `event_type` (identical text in both engines) so that case actually
    * varies: `{"t":"purchase"}` etc.
    */
  private def ciBody = concat(lit("{\"t\":\""), col("event_type"), lit("\"}"))
  private val ciBodySql = """concat('{"t":"', event_type, '"}')"""

  private val TSchema =
    org.apache.spark.sql.types.StructType.fromDDL("t STRING")

  private def verbOnTypeCi(baseVerb: String, value: String): Q = (s, d) => {
    val spec = FilterSpec(Seq(
      PayloadFilter("t", baseVerb + FilterVerbs.CaseInsensitiveSuffix, value)))
    events(s, d)
      .withColumn("parsed", FilterCompiler.parseForFilters(ciBody, TSchema))
      .filter(FilterCompiler.compileParsed(spec, col("parsed")))
      .select(col("event_id"), col("event_type"))
      .orderBy("event_id")
  }

  private def verbOnTypeCiSql(predicate: String): String =
    s"""SELECT event_id, event_type
       |FROM (SELECT event_id, event_type,
       |        lower(json_extract_string($ciBodySql, '$$.t')) AS t
       |      FROM events)
       |WHERE $predicate
       |ORDER BY event_id""".stripMargin

  val queries: Map[String, Q] = Map(
    // ---- the nine case-sensitive verbs (string semantics, finding S1) ----
    "f_eq" -> verbOnK(FilterVerbs.Equals, "87"),
    "f_neq" -> verbOnK(FilterVerbs.NotEquals, "87"),
    "f_contains" -> verbOnK(FilterVerbs.Contains, "7"),
    "f_starts" -> verbOnK(FilterVerbs.StartsWith, "8"),
    "f_ends" -> verbOnK(FilterVerbs.EndsWith, "3"),
    // "9" > "50" and "100" < "50" under ordinal string compare — the oracle
    // (string-typed in DuckDB too) locks in that the engine does NOT
    // numerically coerce, same as the reference.
    "f_gt" -> verbOnK(FilterVerbs.GreaterThan, "50"),
    "f_lt" -> verbOnK(FilterVerbs.LessThan, "50"),
    "f_gte" -> verbOnK(FilterVerbs.GreaterThanOrEqual, "50"),
    "f_lte" -> verbOnK(FilterVerbs.LessThanOrEqual, "50"),
    // ---- the nine case-insensitive variants ----
    "f_eq_ci" -> verbOnTypeCi(FilterVerbs.Equals, "PURCHASE"),
    "f_neq_ci" -> verbOnTypeCi(FilterVerbs.NotEquals, "ERROR"),
    "f_contains_ci" -> verbOnTypeCi(FilterVerbs.Contains, "IGN"),
    "f_starts_ci" -> verbOnTypeCi(FilterVerbs.StartsWith, "Pur"),
    "f_ends_ci" -> verbOnTypeCi(FilterVerbs.EndsWith, "UP"),
    "f_gt_ci" -> verbOnTypeCi(FilterVerbs.GreaterThan, "ERROR"),
    "f_lt_ci" -> verbOnTypeCi(FilterVerbs.LessThan, "Purchase"),
    "f_gte_ci" -> verbOnTypeCi(FilterVerbs.GreaterThanOrEqual, "SIGNUP"),
    "f_lte_ci" -> verbOnTypeCi(FilterVerbs.LessThanOrEqual, "click"),
    // ---- composition (P6) ----
    "f_and" -> { (s, d) =>
      val spec = FilterSpec(Seq(
        PayloadFilter("k", FilterVerbs.GreaterThan, "2"),
        PayloadFilter("k", FilterVerbs.LessThan, "6"),
        PayloadFilter("k", FilterVerbs.Contains, "3")))
      events(s, d)
        .withColumn("parsed",
          FilterCompiler.parseForFilters(col("props"), KSchema))
        .filter(FilterCompiler.compileParsed(spec, col("parsed")))
        .select(col("event_id"), col("parsed.k").as("k"))
        .orderBy("event_id")
    },
    "f_or" -> { (s, d) =>
      val spec = FilterSpec(Seq(
        PayloadFilter("k", FilterVerbs.Equals, "87"),
        PayloadFilter("k", FilterVerbs.Equals, "12"),
        PayloadFilter("k", FilterVerbs.StartsWith, "99")), useOr = true)
      events(s, d)
        .withColumn("parsed",
          FilterCompiler.parseForFilters(col("props"), KSchema))
        .filter(FilterCompiler.compileParsed(spec, col("parsed")))
        .select(col("event_id"), col("parsed.k").as("k"))
        .orderBy("event_id")
    },
    // ---- missing property (P7): AND rejects, OR skips ----
    "f_missing_and" -> { (s, d) =>
      val spec = FilterSpec(Seq(
        PayloadFilter("k", FilterVerbs.GreaterThan, "1"),
        PayloadFilter("nope", FilterVerbs.Equals, "x")))
      events(s, d)
        .withColumn("parsed", FilterCompiler.parseForFilters(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "k STRING, nope STRING")))
        .filter(FilterCompiler.compileParsed(spec, col("parsed")))
        .select(col("event_id")).orderBy("event_id")
    },
    "f_missing_or" -> { (s, d) =>
      val spec = FilterSpec(Seq(
        PayloadFilter("nope", FilterVerbs.Equals, "x"),
        PayloadFilter("k", FilterVerbs.Equals, "87")), useOr = true)
      events(s, d)
        .withColumn("parsed", FilterCompiler.parseForFilters(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "k STRING, nope STRING")))
        .filter(FilterCompiler.compileParsed(spec, col("parsed")))
        .select(col("event_id")).orderBy("event_id")
    },
    // ---- parse-failure pass-through (P8) ----
    "f_parse_passthrough" -> { (s, d) =>
      // Deterministically corrupt every 10th body, then filter k=87: the
      // corrupt records must be DELIVERED (reference catch falls through to
      // dispatch, `KinesisThreadJobs.cs:705-714`).
      val spec = FilterSpec(Seq(PayloadFilter("k", FilterVerbs.Equals, "87")))
      val body = when(col("event_id") % 10 === 0, substring(col("props"), 1, 3))
        .otherwise(col("props"))
      events(s, d)
        .withColumn("parsed", FilterCompiler.parseForFilters(body, KSchema))
        .filter(FilterCompiler.compileParsed(spec, col("parsed")))
        .select(col("event_id")).orderBy("event_id")
    },
    // ---- typed-comparison EXTENSION: numeric verbs over JSON fields.
    // Not reference behavior (S1 string semantics stay the default);
    // gate-checked so the extension surface is as hard-verified as the
    // ported one. ft_gt_typed vs f_gt differ on ~800 rows at sf0.01
    // ("9" > "10" string-wise but not numerically). ----
    "ft_gt_typed" -> { (s, d) =>
      val spec = FilterSpec(Seq(
        PayloadFilter("k", FilterVerbs.GreaterThan, "10")))
      events(s, d)
        .withColumn("parsed",
          FilterCompiler.parseForFilters(col("props"), KSchema))
        .filter(FilterCompiler.compileParsedTyped(spec, col("parsed")))
        .select(col("event_id")).orderBy("event_id")
    },
    "ft_range_typed" -> { (s, d) => // AND of numeric bounds: 25 ≤ k < 75
      val spec = FilterSpec(Seq(
        PayloadFilter("k", FilterVerbs.GreaterThanOrEqual, "25"),
        PayloadFilter("k", FilterVerbs.LessThan, "75")))
      events(s, d)
        .withColumn("parsed",
          FilterCompiler.parseForFilters(col("props"), KSchema))
        .filter(FilterCompiler.compileParsedTyped(spec, col("parsed")))
        .select(col("event_id")).orderBy("event_id")
    },
    // ---- P8 object-shape: top-level arrays / bare scalars are NOT
    // JObjects — JObject.Parse throws and the record is delivered
    // unfiltered, exactly like malformed JSON ----
    "f_object_only" -> { (s, d) =>
      val spec = FilterSpec(Seq(
        PayloadFilter("k", FilterVerbs.GreaterThan, "5")))
      val body = when(col("event_id") % 4 === 1, lit("[1,2,3]"))
        .when(col("event_id") % 4 === 2,
          FilterCompiler.extract(col("props"), "k")) // bare numeric scalar
        .when(col("event_id") % 4 === 3, lit("\"just a string\""))
        .otherwise(col("props")) // a real object: filters apply
      events(s, d)
        .withColumn("parsed", FilterCompiler.parseForFilters(body, KSchema))
        .filter(FilterCompiler.compileParsed(spec, col("parsed")))
        .select(col("event_id")).orderBy("event_id")
    },
    // ---- empty filter list: everything delivered (TJ:694 guard) ----
    "f_empty_spec" -> { (s, d) =>
      events(s, d)
        .filter(FilterCompiler.compile(FilterSpec(Nil, useOr = true),
          col("props")))
        .select(col("event_id")).orderBy("event_id")
    },
    // ---- JSON array paths: SelectToken supports indexing ("items[0].id")
    // and so does get_json_object — same verb machinery, deeper paths ----
    "f_array_path" -> { (s, d) =>
      val body = concat(lit("{\"ids\":[\""), col("event_type"),
        lit("\",\"backup\"],\"ks\":["),
        FilterCompiler.extract(col("props"), "k"), lit(",5]}"))
      val spec = FilterSpec(Seq(
        PayloadFilter("ids[0]", FilterVerbs.Equals, "purchase")))
      // Single-parse plan (SCALING.md): filter AND both output extractions
      // run against ONE from_json of the body via compileParsed — the
      // earlier shape paid three Jackson parses per row (validity probe +
      // filter extract via get_json_object + from_json for outputs).
      val parsedSchema = org.apache.spark.sql.types.StructType.fromDDL(
        "ids ARRAY<STRING>, ks ARRAY<INT>")
      events(s, d)
        .withColumn("parsed",
          FilterCompiler.parseForFilters(body, parsedSchema))
        .filter(FilterCompiler.compileParsed(spec, col("parsed")))
        .select(col("event_id"),
          col("parsed.ks").getItem(0).cast("string").as("k0"),
          col("parsed.ids").getItem(1).as("backup"))
        .orderBy("event_id")
    },
    // ---- metadata/data projections (P1-P3, KinesisUtils.cs:146-183) ----
    "f_projection" -> { (s, d) =>
      Tables.events(s, d).select(
        col("event_id").cast("string").as("sequence_number"),
        col("user_id").cast("string").as("partition_key"),
        date_format(date_trunc("second", col("ts")), "yyyy-MM-dd HH:mm:ss")
          .as("arrival"),
        // P3 analog: null-defaulting projection (EncryptionType ?? "None")
        coalesce(nullif(col("event_type"), lit("error")), lit("None"))
          .as("encryption_type"))
        .orderBy(col("sequence_number"))
    })

  val oracles: Map[String, String] = Map(
    "f_eq" -> verbOnKSql("=", "87"),
    "f_neq" -> verbOnKSql("<>", "87"),
    "f_contains" ->
      """SELECT event_id, json_extract_string(props, '$.k') AS k
        |FROM events
        |WHERE contains(json_extract_string(props, '$.k'), '7')
        |ORDER BY event_id""".stripMargin,
    "f_starts" ->
      """SELECT event_id, json_extract_string(props, '$.k') AS k
        |FROM events
        |WHERE starts_with(json_extract_string(props, '$.k'), '8')
        |ORDER BY event_id""".stripMargin,
    "f_ends" ->
      """SELECT event_id, json_extract_string(props, '$.k') AS k
        |FROM events
        |WHERE ends_with(json_extract_string(props, '$.k'), '3')
        |ORDER BY event_id""".stripMargin,
    "f_gt" -> verbOnKSql(">", "50"),
    "f_lt" -> verbOnKSql("<", "50"),
    "f_gte" -> verbOnKSql(">=", "50"),
    "f_lte" -> verbOnKSql("<=", "50"),
    "f_eq_ci" -> verbOnTypeCiSql("t = lower('PURCHASE')"),
    "f_neq_ci" -> verbOnTypeCiSql("t <> lower('ERROR')"),
    "f_contains_ci" -> verbOnTypeCiSql("contains(t, lower('IGN'))"),
    "f_starts_ci" -> verbOnTypeCiSql("starts_with(t, lower('Pur'))"),
    "f_ends_ci" -> verbOnTypeCiSql("ends_with(t, lower('UP'))"),
    "f_gt_ci" -> verbOnTypeCiSql("t > lower('ERROR')"),
    "f_lt_ci" -> verbOnTypeCiSql("t < lower('Purchase')"),
    "f_gte_ci" -> verbOnTypeCiSql("t >= lower('SIGNUP')"),
    "f_lte_ci" -> verbOnTypeCiSql("t <= lower('click')"),
    "f_and" ->
      """SELECT event_id, json_extract_string(props, '$.k') AS k
        |FROM events
        |WHERE json_extract_string(props, '$.k') > '2'
        |  AND json_extract_string(props, '$.k') < '6'
        |  AND contains(json_extract_string(props, '$.k'), '3')
        |ORDER BY event_id""".stripMargin,
    "f_or" ->
      """SELECT event_id, json_extract_string(props, '$.k') AS k
        |FROM events
        |WHERE json_extract_string(props, '$.k') = '87'
        |   OR json_extract_string(props, '$.k') = '12'
        |   OR starts_with(json_extract_string(props, '$.k'), '99')
        |ORDER BY event_id""".stripMargin,
    "f_missing_and" ->
      """SELECT event_id FROM events
        |WHERE json_extract_string(props, '$.k') > '1'
        |  AND json_extract_string(props, '$.nope') = 'x'
        |ORDER BY event_id""".stripMargin,
    "f_missing_or" ->
      """SELECT event_id FROM events
        |WHERE json_extract_string(props, '$.nope') = 'x'
        |   OR json_extract_string(props, '$.k') = '87'
        |ORDER BY event_id""".stripMargin,
    "f_parse_passthrough" ->
      """SELECT event_id FROM (
        |  SELECT event_id,
        |         CASE WHEN event_id % 10 = 0 THEN substr(props, 1, 3)
        |              ELSE props END AS body
        |  FROM events)
        |WHERE CASE WHEN coalesce(
        |             CASE WHEN json_valid(body) THEN json_type(body) END
        |               = 'OBJECT', FALSE)
        |           THEN json_extract_string(body, '$.k') = '87'
        |           ELSE TRUE END
        |ORDER BY event_id""".stripMargin,
    // the oracles mirror compileTyped's full semantics INCLUDING the
    // non-object deliver branch (every fixture props row happens to be a
    // valid object, but the oracle must not rely on that staying true)
    "ft_gt_typed" ->
      """SELECT event_id FROM events
        |WHERE CASE WHEN coalesce(
        |        CASE WHEN json_valid(props) THEN json_type(props) END
        |          = 'OBJECT', FALSE)
        |      THEN TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)
        |             > 10
        |      ELSE TRUE END
        |ORDER BY event_id""".stripMargin,
    "ft_range_typed" ->
      """SELECT event_id FROM events
        |WHERE CASE WHEN coalesce(
        |        CASE WHEN json_valid(props) THEN json_type(props) END
        |          = 'OBJECT', FALSE)
        |      THEN TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)
        |             >= 25
        |       AND TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)
        |             < 75
        |      ELSE TRUE END
        |ORDER BY event_id""".stripMargin,
    "f_object_only" ->
      """SELECT event_id FROM (
        |  SELECT event_id,
        |         CASE WHEN event_id % 4 = 1 THEN '[1,2,3]'
        |              WHEN event_id % 4 = 2
        |                THEN json_extract_string(props, '$.k')
        |              WHEN event_id % 4 = 3 THEN '"just a string"'
        |              ELSE props END AS body
        |  FROM events)
        |WHERE NOT coalesce(
        |        CASE WHEN json_valid(body) THEN json_type(body) END
        |          = 'OBJECT', FALSE)
        |   OR json_extract_string(body, '$.k') > '5'
        |ORDER BY event_id""".stripMargin,
    "f_empty_spec" ->
      "SELECT event_id FROM events ORDER BY event_id",
    "f_array_path" ->
      """SELECT event_id,
        |       json_extract_string(body, '$.ks[0]') AS k0,
        |       json_extract_string(body, '$.ids[1]') AS backup
        |FROM (
        |  SELECT event_id,
        |    concat('{"ids":["', event_type, '","backup"],"ks":[',
        |           json_extract_string(props, '$.k'), ',5]}') AS body
        |  FROM events)
        |WHERE json_extract_string(body, '$.ids[0]') = 'purchase'
        |ORDER BY event_id""".stripMargin,
    "f_projection" ->
      """SELECT CAST(event_id AS VARCHAR) AS sequence_number,
        |       CAST(user_id AS VARCHAR) AS partition_key,
        |       strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S')
        |         AS arrival,
        |       coalesce(nullif(event_type, 'error'), 'None')
        |         AS encryption_type
        |FROM events
        |ORDER BY sequence_number""".stripMargin)
}
