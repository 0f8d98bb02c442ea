package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config.{BlobSerde, ConfigSerde, KinesisSettings, QueueConfig}
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

  // ---- binary keyed-stream layout (MQ:392-416) ---------------------------

  test("binary: queue config round-trips through the keyed-stream blob") {
    assert(BlobSerde.readQueue(BlobSerde.saveQueue(full)) == full)
    val minimal = QueueConfig("s", QueueConfig.StartFromLatest)
    assert(BlobSerde.readQueue(BlobSerde.saveQueue(minimal)) == minimal)
  }

  test("binary: filters serialize as filters_Count + 1-based per-index " +
      "blobs, each independently parseable") {
    val bytes = BlobSerde.saveQueue(full)
    val r = BlobSerde.parse(bytes)
    assert(r.getInt("filters_Count") == 2)
    // 1-based indexing (Save writes filters_{index + 1}, MQ:414)
    assert(r.containsValue("filters_1") && r.containsValue("filters_2"))
    assert(!r.containsValue("filters_0"))
    // each blob is a self-contained serialization of ONE filter
    assert(BlobSerde.filterFromBlob(r.getBytes("filters_1"))
      == full.filters.filters.head)
    assert(BlobSerde.filterFromBlob(r.getBytes("filters_2"))
      == full.filters.filters(1))
  }

  test("binary: a missing or null filters_{i} entry is SKIPPED, not an " +
      "error (Read's ContainsValue guard, MQ:395-401)") {
    // hand-build a stream claiming 3 filters but carrying only #1 present
    // and #2 null — the reference loads such a definition with 1 filter
    val w = new BlobSerde.WriteStream
    w.addString("streamName", "s")
    w.addString("initialStreamPosition", QueueConfig.StartFromLatest)
    w.addBool("useEnhancedFanOut", false)
    w.addString("consumerArn", ""); w.addString("consumerName", "")
    w.addInt("maxRecordsPerRequest", 100); w.addInt("maxRetries", 3)
    w.addInt("requestTimeout", 10); w.addInt("shardPollInterval", 30)
    w.addInt("shardBatchWaitTime", 1); w.addInt("errorBackoffTime", 5)
    w.addBool("overrideSettings", false)
    w.addString("settings_region", ""); w.addString("settings_authMethod",
      KinesisSettings.DefaultCredentials)
    w.addString("settings_accessKeyId", "")
    w.addString("settings_secretAccessKey", "")
    w.addString("settings_roleArn", "")
    w.addBool("useOr", false)
    w.addInt("filters_Count", 3)
    w.addBytes("filters_1",
      BlobSerde.filterToBlob(PayloadFilter("a", "Equals", "1")))
    w.addBytes("filters_2", null) // present but null → skipped
    // filters_3 absent entirely → skipped
    val back = BlobSerde.readQueue(w.toBytes)
    assert(back.filters.filters == Seq(PayloadFilter("a", "Equals", "1")))
  }

  test("binary: malformed blobs are rejected, not misparsed") {
    val good = BlobSerde.saveQueue(full)
    // bad magic
    intercept[BlobSerde.MalformedBlobException] {
      BlobSerde.parse("NOPE".getBytes("US-ASCII") ++ good.drop(4))
    }
    // truncation at every eighth of the blob
    (1 until 8).foreach { i =>
      intercept[BlobSerde.MalformedBlobException] {
        BlobSerde.readQueue(good.take(good.length * i / 8))
      }
    }
    // a filter blob is NOT a queue blob (missing keys)
    val filterBlob = BlobSerde.filterToBlob(PayloadFilter("a", "Equals", "1"))
    intercept[BlobSerde.MalformedBlobException] {
      BlobSerde.readQueue(filterBlob)
    }
    // type confusion: int read where a string was written
    val w = new BlobSerde.WriteStream
    w.addString("filters_Count", "two")
    intercept[BlobSerde.MalformedBlobException] {
      BlobSerde.parse(w.toBytes).getInt("filters_Count")
    }
  }

  test("binary: load validates like the reference (invalid config and " +
      "unknown verbs rejected)") {
    intercept[IllegalArgumentException] {
      BlobSerde.readQueue(
        BlobSerde.saveQueue(full.copy(maxRecordsPerRequest = 0)))
    }
    val badVerb = full.copy(filters = FilterSpec(Seq(
      PayloadFilter("a", "Regexes", "x"))))
    intercept[IllegalArgumentException] {
      BlobSerde.readQueue(BlobSerde.saveQueue(badVerb))
    }
  }
}
