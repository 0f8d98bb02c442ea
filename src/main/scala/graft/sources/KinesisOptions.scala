package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.DataStreamReader

import graft.config.{KinesisSettings, QueueConfig}

/** The connector seam: maps the engine's validated [[QueueConfig]] +
  * [[KinesisSettings]] onto Structured-Streaming reader/writer options —
  * the one place where the reference's connection surface
  * (`Decisions.Kinesis/KinesisMessageQueue.cs:27-349`,
  * `KinesisUtils.cs:54-136`) meets `spark.readStream.format(...)`.
  *
  * Option names follow the public AWS Kinesis connector for Spark
  * Structured Streaming (format `"aws-kinesis"`, options namespaced
  * `kinesis.*`). The connector jar is not present in this build
  * environment, so nothing here calls `.load()`; the mapping itself is the
  * unit-tested contract, and `reader(...)` returns a fully configured
  * `DataStreamReader` a deployment can `.load()` directly.
  *
  * Semantics carried over from the reference:
  *   - start position: "Start from oldest record" ⇒ TRIM_HORIZON,
  *     "Start from latest record" ⇒ LATEST
  *     (`KinesisMessageQueue.cs:352-362`).
  *   - EFO: consumer ARN XOR consumer name (`KinesisMessageQueue
  *     .cs:430-437`); polling ⇔ GetRecords, EFO ⇔ SubscribeToShard
  *     (`KinesisThreadJobs.cs:326-440` vs `:442-531`).
  *   - credentials: DefaultCredentials ⇒ provider-chain (no keys emitted),
  *     StaticCredentials ⇒ key id + secret; optional assume-role wraps
  *     either, with the reference's fixed session name
  *     (`KinesisUtils.cs:100-136`, session "DecisionsKinesisSession"
  *     `:131`).
  *   - per-queue settings override the global ones only when
  *     `overrideSettings` is set (`KinesisUtils.cs:54-66`).
  */
object KinesisOptions {
  val Format = "aws-kinesis"
  val StsSessionName = "DecisionsKinesisSession" // KinesisUtils.cs:131

  /** Reader options for the consume path. Validates the config first —
    * an invalid config must fail here, not at stream start.
    */
  def readerOptions(c: QueueConfig,
      global: KinesisSettings): Map[String, String] = {
    QueueConfig.requireValid(c)
    val s = QueueConfig.effectiveSettings(c, global)
    val base = Map(
      "kinesis.streamName" -> c.streamName,
      "kinesis.startingPosition" ->
        (if (c.initialStreamPosition == QueueConfig.StartFromOldest)
          "TRIM_HORIZON" else "LATEST"),
      "kinesis.consumerType" ->
        (if (c.useEnhancedFanOut) "SubscribeToShard" else "GetRecords"),
      // KinesisMessageQueue.cs:153 (default 100, 1–10000)
      "kinesis.maxFetchRecordsPerShard" -> c.maxRecordsPerRequest.toString,
      // KinesisMessageQueue.cs:170/186/213/246 — seconds in the reference,
      // milliseconds in the connector
      "kinesis.maxRetries" -> c.maxRetries.toString,
      "kinesis.requestTimeoutMs" -> (c.requestTimeout * 1000L).toString,
      "kinesis.describeShardIntervalMs" ->
        (c.shardPollInterval * 1000L).toString,
      "kinesis.retryIntervalMs" -> (c.errorBackoffTime * 1000L).toString)
    // Option(...).exists(...) throughout: json4s maps an explicit JSON
    // null onto a null String field, and requireValid deliberately
    // treats null-as-absent — so the option mapping must too, not NPE
    val efo =
      if (!c.useEnhancedFanOut) Map.empty[String, String]
      else if (Option(c.consumerArn).exists(_.nonEmpty))
        Map("kinesis.consumerArn" -> c.consumerArn)
      else Map("kinesis.consumerName" -> c.consumerName)
    base ++ efo ++ credentialOptions(s)
  }

  /** Producer (PutRecord) twin behind the same seam
    * (`KinesisMessageQueueImpl.cs:99-126`: partition key = explicit key,
    * else a fresh UUID — mirrored by the sink's partition-key column).
    */
  def writerOptions(streamName: String,
      s: KinesisSettings): Map[String, String] = {
    require(streamName != null && streamName.trim.nonEmpty,
      "Stream Name is required")
    Map("kinesis.streamName" -> streamName) ++ credentialOptions(s)
  }

  private def credentialOptions(s: KinesisSettings): Map[String, String] = {
    val region =
      if (Option(s.region).exists(_.nonEmpty))
        Map("kinesis.region" -> s.region)
      else Map.empty[String, String]
    val creds = s.authMethod match {
      case KinesisSettings.StaticCredentials =>
        Map("kinesis.awsAccessKeyId" -> s.accessKeyId,
          "kinesis.awsSecretKey" -> s.secretAccessKey)
      case _ => Map.empty[String, String] // provider chain: emit nothing
    }
    val role =
      if (Option(s.roleArn).exists(_.nonEmpty))
        Map("kinesis.stsRoleArn" -> s.roleArn,
          "kinesis.stsSessionName" -> StsSessionName)
      else Map.empty[String, String]
    region ++ creds ++ role
  }

  /** A configured (not yet loaded) streaming reader for the queue. */
  def reader(spark: SparkSession, c: QueueConfig,
      global: KinesisSettings): DataStreamReader =
    spark.readStream.format(Format).options(readerOptions(c, global))
}
