package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config.{KinesisSettings, QueueConfig}
import graft.sources.KinesisOptions

/** The §2.9 config matrix mapped through the connector seam: every row the
  * reference validates (`KinesisMessageQueue.cs:417-472`) must either map
  * to the documented reader option or be rejected before a stream starts.
  */
class KinesisOptionsSpec extends AnyFunSuite {
  private val base = QueueConfig(
    streamName = "orders-stream",
    initialStreamPosition = QueueConfig.StartFromOldest)
  private val global = KinesisSettings(region = "eu-west-1")

  test("start positions map to TRIM_HORIZON / LATEST") {
    val oldest = KinesisOptions.readerOptions(base, global)
    assert(oldest("kinesis.startingPosition") == "TRIM_HORIZON")
    val latest = KinesisOptions.readerOptions(
      base.copy(initialStreamPosition = QueueConfig.StartFromLatest), global)
    assert(latest("kinesis.startingPosition") == "LATEST")
  }

  test("polling mode is GetRecords with no consumer identity") {
    val o = KinesisOptions.readerOptions(base, global)
    assert(o("kinesis.consumerType") == "GetRecords")
    assert(!o.contains("kinesis.consumerName"))
    assert(!o.contains("kinesis.consumerArn"))
  }

  test("EFO maps name XOR arn to SubscribeToShard") {
    val byName = KinesisOptions.readerOptions(
      base.copy(useEnhancedFanOut = true, consumerName = "c1"), global)
    assert(byName("kinesis.consumerType") == "SubscribeToShard")
    assert(byName("kinesis.consumerName") == "c1")
    assert(!byName.contains("kinesis.consumerArn"))
    val byArn = KinesisOptions.readerOptions(
      base.copy(useEnhancedFanOut = true,
        consumerArn = "arn:aws:kinesis:eu-west-1:1:stream/s/consumer/c"),
      global)
    assert(byArn("kinesis.consumerArn").endsWith("consumer/c"))
    assert(!byArn.contains("kinesis.consumerName"))
  }

  test("EFO with both or neither identity is rejected") {
    intercept[IllegalArgumentException] {
      KinesisOptions.readerOptions(
        base.copy(useEnhancedFanOut = true), global)
    }
    intercept[IllegalArgumentException] {
      KinesisOptions.readerOptions(
        base.copy(useEnhancedFanOut = true, consumerName = "c",
          consumerArn = "arn:x"), global)
    }
  }

  test("bounds enforced before any option is produced") {
    intercept[IllegalArgumentException] {
      KinesisOptions.readerOptions(
        base.copy(maxRecordsPerRequest = 10001), global)
    }
    intercept[IllegalArgumentException] {
      KinesisOptions.readerOptions(base.copy(streamName = "  "), global)
    }
  }

  test("reference seconds become connector milliseconds") {
    val o = KinesisOptions.readerOptions(base, global)
    assert(o("kinesis.maxFetchRecordsPerShard") == "100")
    assert(o("kinesis.requestTimeoutMs") == "10000")
    assert(o("kinesis.describeShardIntervalMs") == "30000")
    assert(o("kinesis.retryIntervalMs") == "5000")
    assert(o("kinesis.maxRetries") == "3")
  }

  test("default credentials emit provider-chain (no keys); static emit keys") {
    val chain = KinesisOptions.readerOptions(base, global)
    assert(!chain.contains("kinesis.awsAccessKeyId"))
    assert(chain("kinesis.region") == "eu-west-1")
    val stat = KinesisOptions.readerOptions(base,
      KinesisSettings(region = "us-east-1",
        authMethod = KinesisSettings.StaticCredentials,
        accessKeyId = "AKIA", secretAccessKey = "s3cr3t"))
    assert(stat("kinesis.awsAccessKeyId") == "AKIA")
    assert(stat("kinesis.awsSecretKey") == "s3cr3t")
  }

  test("assume-role adds the reference's fixed session name") {
    val o = KinesisOptions.readerOptions(base,
      global.copy(roleArn = "arn:aws:iam::1:role/reader"))
    assert(o("kinesis.stsRoleArn") == "arn:aws:iam::1:role/reader")
    assert(o("kinesis.stsSessionName") == "DecisionsKinesisSession")
  }

  test("per-queue settings apply only under overrideSettings") {
    val queueLocal = KinesisSettings(region = "ap-south-1")
    val ignored = KinesisOptions.readerOptions(
      base.copy(settings = queueLocal), global)
    assert(ignored("kinesis.region") == "eu-west-1")
    val used = KinesisOptions.readerOptions(
      base.copy(settings = queueLocal, overrideSettings = true), global)
    assert(used("kinesis.region") == "ap-south-1")
  }

  test("producer twin shares the credential mapping") {
    val o = KinesisOptions.writerOptions("out-stream",
      KinesisSettings(region = "eu-west-1",
        authMethod = KinesisSettings.StaticCredentials,
        accessKeyId = "AKIA", secretAccessKey = "x"))
    assert(o("kinesis.streamName") == "out-stream")
    assert(o("kinesis.awsAccessKeyId") == "AKIA")
    intercept[IllegalArgumentException] {
      KinesisOptions.writerOptions(" ", global)
    }
  }

  test("reader() yields a configured DataStreamReader without network") {
    val r = KinesisOptions.reader(SparkTestSession.get, base, global)
    assert(r != null) // format+options applied; .load() is deployment-side
  }
}
