package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config.{ConfigSerde, KinesisSettings, QueueConfig}
import graft.filters.{FilterSpec, PayloadFilter}

/** Round-trip of the queue-definition blob (MQ:392-416 analog). */
class ConfigSerdeSpec extends AnyFunSuite {
  private val full = QueueConfig(
    streamName = "orders-stream",
    initialStreamPosition = QueueConfig.StartFromOldest,
    filters = FilterSpec(Seq(
      PayloadFilter("user.type", "Equals (Case Insensitive)", "Admin"),
      PayloadFilter("order.amount", "Greater Than", "1000")),
      useOr = true),
    useEnhancedFanOut = true,
    consumerName = "graft-consumer",
    maxRecordsPerRequest = 500,
    maxRetries = 5,
    requestTimeout = 20,
    shardPollInterval = 10,
    shardBatchWaitTime = 2,
    errorBackoffTime = 7,
    overrideSettings = true,
    settings = KinesisSettings(region = "eu-west-1",
      authMethod = KinesisSettings.StaticCredentials,
      accessKeyId = "AKIA_TEST", secretAccessKey = "s3cr3t",
      roleArn = "arn:aws:iam::123:role/x"))

  test("queue config round-trips through JSON exactly") {
    val json = ConfigSerde.queueToJson(full)
    assert(ConfigSerde.queueFromJson(json) == full)
  }

  test("filters round-trip preserves order, verbs, and useOr") {
    val json = ConfigSerde.filtersToJson(full.filters)
    assert(ConfigSerde.filtersFromJson(json) == full.filters)
  }

  test("deserialization validates: invalid blobs are rejected") {
    val bad = full.copy(maxRecordsPerRequest = 0)
    val json = ConfigSerde.queueToJson(bad)
    intercept[IllegalArgumentException] {
      ConfigSerde.queueFromJson(json)
    }
  }

  test("defaults survive a minimal blob") {
    val minimal = QueueConfig("s", QueueConfig.StartFromLatest)
    val back = ConfigSerde.queueFromJson(ConfigSerde.queueToJson(minimal))
    assert(back.maxRecordsPerRequest == 100) // MQ:153
    assert(back.maxRetries == 3)             // MQ:170
    assert(back.shardPollInterval == 30)     // MQ:213
    assert(back.errorBackoffTime == 5)       // MQ:246
  }
}
