package graft.config

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream, EOFException}
import scala.collection.mutable

import graft.filters.{FilterSpec, FilterValidation, PayloadFilter}

/** Binary queue-definition serde mirroring the reference's storage layout
  * (`KinesisMessageQueue.cs:392-416`): a KEYED value stream holding the
  * queue's scalar properties plus `filters_Count` and one opaque byte blob
  * per filter under `filters_{i}` (1-BASED — `Save` writes
  * `filters_{index + 1}`).
  *
  * The reference delegates each filter blob to the platform's
  * `ObjectGraphSerializer` (proprietary); here each blob is itself a keyed
  * stream of the filter's three fields, so a blob is self-contained and
  * independently versioned, which is the property the reference's design
  * relies on (filters deserialize one by one; a missing or null blob is
  * SKIPPED, not an error — `Read`'s `ContainsValue` guard).
  *
  * Wire format (big-endian, all strings UTF-8 length-prefixed):
  *   magic "GKB1" | entryCount: int | entries…
  *   entry := key: string | tag: byte | value
  *   tag 'I' → int, 'Z' → bool, 'S' → string, 'B' → len-prefixed bytes
  */
object BlobSerde {
  private val Magic = "GKB1".getBytes("US-ASCII")

  // ---- keyed stream primitives -------------------------------------------

  final class WriteStream {
    private[BlobSerde] val entries =
      mutable.LinkedHashMap.empty[String, (Byte, Array[Byte])]

    private def put(key: String, tag: Byte, value: Array[Byte]): Unit =
      entries(key) = (tag, value)

    def addInt(key: String, v: Int): Unit = {
      val b = java.nio.ByteBuffer.allocate(4).putInt(v)
      put(key, 'I', b.array())
    }
    def addBool(key: String, v: Boolean): Unit =
      put(key, 'Z', Array[Byte](if (v) 1 else 0))
    def addString(key: String, v: String): Unit =
      put(key, 'S', if (v == null) null else v.getBytes("UTF-8"))
    def addBytes(key: String, v: Array[Byte]): Unit = put(key, 'B', v)

    def toBytes: Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.write(Magic)
      out.writeInt(entries.size)
      entries.foreach { case (key, (tag, value)) =>
        val k = key.getBytes("UTF-8")
        out.writeInt(k.length); out.write(k)
        out.writeByte(tag.toInt)
        if (value == null) out.writeInt(-1) // null value marker
        else { out.writeInt(value.length); out.write(value) }
      }
      out.flush()
      bos.toByteArray
    }
  }

  /** `ContainsValue`/`GetValue` semantics (`KinesisMessageQueue.cs:395-401`):
    * presence and nullness are distinct — the reference checks both.
    */
  final class ReadStream private[BlobSerde] (
      entries: Map[String, (Byte, Array[Byte])]) {
    def containsValue(key: String): Boolean = entries.contains(key)

    private def get(key: String, tag: Byte): Array[Byte] =
      entries.get(key) match {
        case None => throw new MalformedBlobException(s"missing key: $key")
        case Some((t, _)) if t != tag =>
          throw new MalformedBlobException(
            s"key $key has tag '${t.toChar}', expected '${tag.toChar}'")
        case Some((_, v)) => v
      }

    def getInt(key: String): Int = {
      val v = get(key, 'I')
      if (v == null || v.length != 4)
        throw new MalformedBlobException(s"bad int value for $key")
      java.nio.ByteBuffer.wrap(v).getInt
    }
    def getBool(key: String): Boolean = {
      val v = get(key, 'Z')
      if (v == null || v.length != 1)
        throw new MalformedBlobException(s"bad bool value for $key")
      v(0) != 0
    }
    def getString(key: String): String = {
      val v = get(key, 'S')
      if (v == null) null else new String(v, "UTF-8")
    }
    /** Null blobs read back as null — the reference's Read checks
      * `GetValue<byte[]>(...) != null` explicitly. */
    def getBytes(key: String): Array[Byte] = get(key, 'B')
  }

  final class MalformedBlobException(msg: String)
    extends IllegalArgumentException(msg)

  def parse(bytes: Array[Byte]): ReadStream = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    try {
      val magic = new Array[Byte](4)
      in.readFully(magic)
      if (!java.util.Arrays.equals(magic, Magic))
        throw new MalformedBlobException("bad magic — not a queue blob")
      val n = in.readInt()
      if (n < 0 || n > 1000000)
        throw new MalformedBlobException(s"implausible entry count: $n")
      val entries = (1 to n).map { _ =>
        val klen = in.readInt()
        if (klen < 0 || klen > (1 << 20))
          throw new MalformedBlobException(s"implausible key length: $klen")
        val k = new Array[Byte](klen); in.readFully(k)
        val tag = in.readByte()
        val vlen = in.readInt()
        val v =
          if (vlen == -1) null
          else if (vlen < 0 || vlen > bytes.length)
            throw new MalformedBlobException(s"implausible value length: $vlen")
          else { val a = new Array[Byte](vlen); in.readFully(a); a }
        new String(k, "UTF-8") -> (tag, v)
      }.toMap
      new ReadStream(entries)
    } catch {
      case _: EOFException =>
        throw new MalformedBlobException("truncated blob")
    }
  }

  // ---- filter blob (the ObjectGraphSerializer stand-in) ------------------

  def filterToBlob(f: PayloadFilter): Array[Byte] = {
    val w = new WriteStream
    w.addString("property", f.property)
    w.addString("filterverb", f.verb) // entity field name, PF:27-31
    w.addString("value", f.value)
    w.toBytes
  }

  def filterFromBlob(bytes: Array[Byte]): PayloadFilter = {
    val r = parse(bytes)
    PayloadFilter(r.getString("property"), r.getString("filterverb"),
      r.getString("value"))
  }

  // ---- queue definition Save/Read ----------------------------------------

  /** `Save` (`KinesisMessageQueue.cs:406-416`): scalar properties plus —
    * only when filters exist — `filters_Count` and 1-based per-index blobs.
    */
  def saveQueue(c: QueueConfig): Array[Byte] = {
    val w = new WriteStream
    w.addString("streamName", c.streamName)
    w.addString("initialStreamPosition", c.initialStreamPosition)
    w.addBool("useEnhancedFanOut", c.useEnhancedFanOut)
    w.addString("consumerArn", c.consumerArn)
    w.addString("consumerName", c.consumerName)
    w.addInt("maxRecordsPerRequest", c.maxRecordsPerRequest)
    w.addInt("maxRetries", c.maxRetries)
    w.addInt("requestTimeout", c.requestTimeout)
    w.addInt("shardPollInterval", c.shardPollInterval)
    w.addInt("shardBatchWaitTime", c.shardBatchWaitTime)
    w.addInt("errorBackoffTime", c.errorBackoffTime)
    w.addBool("overrideSettings", c.overrideSettings)
    w.addString("settings_region", c.settings.region)
    w.addString("settings_authMethod", c.settings.authMethod)
    w.addString("settings_accessKeyId", c.settings.accessKeyId)
    w.addString("settings_secretAccessKey", c.settings.secretAccessKey)
    w.addString("settings_roleArn", c.settings.roleArn)
    w.addBool("useOr", c.filters.useOr)
    if (c.filters.filters.nonEmpty) {
      w.addInt("filters_Count", c.filters.filters.length)
      c.filters.filters.zipWithIndex.foreach { case (f, index) =>
        w.addBytes(s"filters_${index + 1}", filterToBlob(f))
      }
    }
    w.toBytes
  }

  /** `Read` (`KinesisMessageQueue.cs:392-404`): reconstitute and validate.
    * Reference semantics kept exactly: no `filters_Count` ⇒ no filters;
    * a missing or null `filters_{i}` entry is skipped, shrinking the list
    * rather than failing the load.
    */
  def readQueue(bytes: Array[Byte]): QueueConfig = {
    val r = parse(bytes)
    val filters =
      if (r.containsValue("filters_Count")) {
        (0 until r.getInt("filters_Count")).flatMap { index =>
          val key = s"filters_${index + 1}"
          if (r.containsValue(key) && r.getBytes(key) != null)
            Some(filterFromBlob(r.getBytes(key)))
          else None
        }
      } else Seq.empty
    val spec = FilterSpec(filters, r.getBool("useOr"))
    FilterValidation.requireValid(spec)
    QueueConfig.requireValid(QueueConfig(
      streamName = r.getString("streamName"),
      initialStreamPosition = r.getString("initialStreamPosition"),
      filters = spec,
      useEnhancedFanOut = r.getBool("useEnhancedFanOut"),
      consumerArn = r.getString("consumerArn"),
      consumerName = r.getString("consumerName"),
      maxRecordsPerRequest = r.getInt("maxRecordsPerRequest"),
      maxRetries = r.getInt("maxRetries"),
      requestTimeout = r.getInt("requestTimeout"),
      shardPollInterval = r.getInt("shardPollInterval"),
      shardBatchWaitTime = r.getInt("shardBatchWaitTime"),
      errorBackoffTime = r.getInt("errorBackoffTime"),
      overrideSettings = r.getBool("overrideSettings"),
      settings = KinesisSettings(
        region = r.getString("settings_region"),
        authMethod = r.getString("settings_authMethod"),
        accessKeyId = r.getString("settings_accessKeyId"),
        secretAccessKey = r.getString("settings_secretAccessKey"),
        roleArn = r.getString("settings_roleArn"))))
  }
}
