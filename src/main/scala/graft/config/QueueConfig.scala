package graft.config

import graft.filters.{FilterSpec, FilterValidation}

/** Global/project-level connection settings.
  *
  * Reference: `Decisions.Kinesis/KinesisSettings.cs:14-117` — region, auth
  * method, static keys, optional assume-role. The engine treats these as a
  * plain config layer (SparkConf / reader options in a real deployment).
  */
final case class KinesisSettings(
    region: String = "",
    /** "DefaultCredentials" | "StaticCredentials"
      * (`KinesisMessageQueue.cs:380-390`). */
    authMethod: String = KinesisSettings.DefaultCredentials,
    accessKeyId: String = "",
    secretAccessKey: String = "",
    /** Optional assume-role wrap (`KinesisUtils.cs:100-136`; session name
      * "DecisionsKinesisSession", `KinesisUtils.cs:131`). */
    roleArn: String = "")

object KinesisSettings {
  val DefaultCredentials = "DefaultCredentials"
  val StaticCredentials = "StaticCredentials"
}

/** Queue definition — the reference's "DDL" (SURVEY §2.9). Defaults match
  * CODE, not README (README drift documented in SURVEY §6/BASELINE.md).
  *
  * Reference: `Decisions.Kinesis/KinesisMessageQueue.cs:27-349`.
  */
final case class QueueConfig(
    /** Required (`KinesisMessageQueue.cs:27-41`, validated `:421-422`). */
    streamName: String,
    /** Required, ∈ {oldest, latest} (`KinesisMessageQueue.cs:53-68,352-362`,
      * validated `:424-425`). */
    initialStreamPosition: String,
    /** Payload filters + AND/OR flag (`KinesisMessageQueue.cs:70-88`). */
    filters: FilterSpec = FilterSpec(Nil),
    /** EFO (`KinesisMessageQueue.cs:90-149`; ARN xor name `:430-437`). */
    useEnhancedFanOut: Boolean = false,
    consumerArn: String = "",
    consumerName: String = "",
    /** Default 100, range 1–10000 (`KinesisMessageQueue.cs:153,427-428`). */
    maxRecordsPerRequest: Int = 100,
    /** Default 3, ≥0 (`KinesisMessageQueue.cs:170,439-440`). */
    maxRetries: Int = 3,
    /** Seconds; default 10, ≥1 (`KinesisMessageQueue.cs:186,442-443`). */
    requestTimeout: Int = 10,
    /** Seconds; default 30 (`KinesisMessageQueue.cs:213`). */
    shardPollInterval: Int = 30,
    /** Seconds; default 1 (`KinesisMessageQueue.cs:230`). */
    shardBatchWaitTime: Int = 1,
    /** Seconds; default 5 (`KinesisMessageQueue.cs:246`). */
    errorBackoffTime: Int = 5,
    /** Per-queue settings override (`KinesisMessageQueue.cs:261-275`). */
    overrideSettings: Boolean = false,
    settings: KinesisSettings = KinesisSettings())

object QueueConfig {
  /** `KinesisMessageQueue.cs:352-362` — the two initial positions. */
  val StartFromOldest = "Start from oldest record" // ⇒ TRIM_HORIZON
  val StartFromLatest = "Start from latest record" // ⇒ LATEST

  /** Operational constants (BASELINE.md). */
  val LeaseTtlSeconds = 60           // KinesisCheckPointer.cs:11
  val LeaseRenewalIntervalSeconds = 30 // KinesisThreadJobs.cs:32
  val ShardAcquisitionStaggerSeconds = 5 // KinesisThreadJobs.cs:33
  val MaxBackoffDelaySeconds = 32    // KinesisThreadJobs.cs:226

  /** Config-time validation — the engine analog of
    * `GetAdditionalValidationIssues` (`KinesisMessageQueue.cs:417-472`).
    */
  def validate(c: QueueConfig): Seq[String] = {
    val issues = Seq.newBuilder[String]
    if (c.streamName == null || c.streamName.trim.isEmpty)
      issues += "Stream Name is required"
    if (c.initialStreamPosition != StartFromOldest &&
        c.initialStreamPosition != StartFromLatest)
      issues += s"Initial Stream Position must be one of " +
        s"'$StartFromOldest', '$StartFromLatest'"
    if (c.maxRecordsPerRequest < 1 || c.maxRecordsPerRequest > 10000)
      issues += "Max Records Per Request must be between 1 and 10000"
    if (c.maxRetries < 0)
      issues += "Max Retries cannot be negative"
    if (c.requestTimeout < 1)
      issues += "Request Timeout must be at least 1 second"
    if (c.useEnhancedFanOut) {
      val hasArn = c.consumerArn != null && c.consumerArn.nonEmpty
      val hasName = c.consumerName != null && c.consumerName.nonEmpty
      if (hasArn == hasName) // both or neither
        issues += "Enhanced Fan-Out requires exactly one of Consumer ARN " +
          "or Consumer Name"
    }
    issues ++= FilterValidation.validate(c.filters)
    issues.result()
  }

  def requireValid(c: QueueConfig): QueueConfig = {
    val issues = validate(c)
    if (issues.nonEmpty)
      throw new IllegalArgumentException(issues.mkString("; "))
    c
  }

  /** Instance-vs-global settings resolution (`KinesisUtils.cs:54-66,92-93`):
    * the queue's own settings win only when `overrideSettings` is set.
    */
  def effectiveSettings(c: QueueConfig, global: KinesisSettings): KinesisSettings =
    if (c.overrideSettings) c.settings else global
}
