package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing (north star): media as opaque `binary`
  * columns with typed metadata, decode/feature-extract as a partition-wise
  * typed transform, frame sampling as a generator.
  *
  * The real decode (image/audio codecs) is STUBBED — the container has no
  * media libraries — behind [[FakeDecoder.decode]], a deterministic fake
  * keyed on byte length. Everything around the stub is real and tested:
  * the binary envelope schema, the `Dataset[MediaRecord] → mapPartitions`
  * batch shape (the Scala twin of a Python `mapInPandas` decode), the
  * metadata struct, and the frame-sampling explode. Swapping
  * `FakeDecoder.decode` for a codec call is the only change needed at
  * deployment.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** Binary media envelope: payload + modality + source id. */
  final case class MediaRecord(doc_id: Long, kind: String, media: Array[Byte])

  /** Extracted (fake) media metadata. */
  final case class MediaMeta(doc_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int)

  /** ??? in spirit: a stand-in for the codec. Deterministic in the payload
    * so oracle SQL can replicate it from `length(text)`.
    */
  object FakeDecoder {
    def decode(r: MediaRecord): MediaMeta = {
      val n = r.media.length.toLong
      MediaMeta(r.doc_id, r.kind, n,
        width = ((n % 64) * 10 + 16).toInt,
        height = ((n / 64 % 48) * 10 + 16).toInt,
        n_frames = (n % 50 + 1).toInt)
    }
  }

  /** documents → binary media envelope (text bytes play the payload;
    * modality assigned round-robin like a mixed crawl).
    */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("media"))

  /** Partition-wise decode: the batch shape a real codec UDF needs — one
    * iterator in, one iterator out, no per-row task overhead, pipelined
    * with the scan.
    */
  def decodeMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d).as[MediaRecord]
      .mapPartitions(_.map(FakeDecoder.decode))
      .toDF()
  }

  /** Banded pHash near-dup pairs (ida, idb, hamming ≤ 3): 4×16-bit
    * bands (pigeonhole-complete for hamming ≤ 3, like d_simhash — a
    * 16-bit band keyspace keeps buckets O(1) as the catalog grows; the
    * earlier 8-bit keys cap at 256 buckets/band, which saturates and
    * turns the bucket all-pairs step quadratic), candidates via the
    * skew-capped join, exact popcount verify.
    */
  private def phashPairs(s: SparkSession, d: String): DataFrame = {
    val ph = decodeMeta(s, d).filter(col("kind") === "image")
      .select(col("doc_id"),
        (col("width").cast("long") * lit(2097169L) +
          col("height").cast("long") * lit(8191L) +
          col("n_bytes")).as("ph"))
    // the banded explode feeds BOTH cappedPairs consumers (bucket
    // counts + pair enumeration) — lazy persist per the diamond rule or
    // the Generate runs twice (round-13 DiamondLint per-subtree finding;
    // harness owns release, auditDiamond-gated)
    val banded = ph.select(col("doc_id"),
        explode(array((0 until 4).map(b => struct(lit(b).as("band"),
          shiftrightunsigned(col("ph"), b * 16)
            .bitwiseAND(lit(0xFFFFL)).as("bkey"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"),
        col("bk.bkey").as("bkey"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Fingerprints.cappedPairs(banded, Seq("band", "bkey"), "doc_id")
      .join(ph.select(col("doc_id").as("ida"), col("ph").as("pa")), "ida")
      .join(ph.select(col("doc_id").as("idb"), col("ph").as("pb")), "idb")
      .select(col("ida"), col("idb"),
        bit_count(col("pa").bitwiseXOR(col("pb"))).as("hamming"))
      .filter(col("hamming") <= 3)
  }

  val queries: Map[String, Q] = Map(
    // decode → typed metadata (stubbed codec, real plumbing)
    "m_decode_meta" -> { (s, d) =>
      decodeMeta(s, d)
        .select(col("doc_id"), col("kind"), col("n_bytes"),
          col("width"), col("height"))
        .orderBy("doc_id")
    },
    // per-modality feature aggregate over decoded metadata
    "m_kind_stats" -> { (s, d) =>
      decodeMeta(s, d)
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n"),
          max(col("width")).as("max_w"),
          min(col("height")).as("min_h"),
          TextAnalysis.roundHalfUp(avg(col("n_bytes")), 2).as("avg_bytes"))
        .orderBy("kind")
    },
    // binary content dedup: md5-address the media BYTES (the standard
    // image/audio dedup tier — no decode needed, so it runs before any
    // codec work at scan speed). A re-ingested slice under shifted ids
    // plants real collisions; keeper = min doc_id.
    "m_binary_dup" -> { (s, d) =>
      val m = mediaTable(s, d).select("doc_id", "media")
      val reingested = m.filter(col("doc_id") < 100)
        .withColumn("doc_id", col("doc_id") + 1000000)
      m.union(reingested)
        .groupBy(md5(col("media")).as("content_md5"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("copies"))
        .filter(col("copies") > 1)
        .select(col("keeper"), col("copies"))
        .orderBy("keeper")
    },
    // perceptual-hash near-dup for images: a 64-bit pHash (stub: quantized
    // geometry features, the codec-DCT twin lives behind the decode stub),
    // banded 4×16 bits and candidate pairs from band
    // buckets via the skew-capped join, then exact hamming ≤ 3 verify. By
    // pigeonhole, ≤3 differing bits must leave one of the 4 bands intact,
    // so the banded candidates are EXACTLY complete — the all-pairs DuckDB
    // oracle proves it (probed: max band bucket 75 << cap; 28 pairs at
    // sf0.01, 2832 at sf0.1). At scale: linear banding + bucket joins,
    // never an image×image product.
    "m_phash_pairs" -> { (s, d) =>
      phashPairs(s, d).orderBy("ida", "idb")
    },
    // Media dedup CLUSTERS: the banded phash pair set through the same
    // connected-components keeper machinery as the text and embedding
    // tiers (Dedup.dupClusters) — near-dup handling is one machinery,
    // whatever modality produced the pairs. Oracle: recursive CTE over
    // the all-pairs phash SQL.
    "m_phash_clusters" -> { (s, d) =>
      graft.pipeline.Dedup.dupClusters(
        phashPairs(s, d).select(col("ida"), col("idb")))
        .orderBy("doc_id")
    },
    // resize: target box 224x224 preserving aspect ratio (integer math so
    // the oracle can replicate; the real resample lives behind the same
    // stub boundary as decode)
    "m_resize" -> { (s, d) =>
      decodeMeta(s, d)
        .filter(col("kind") === "image")
        .select(col("doc_id"), col("width"), col("height"),
          least(lit(224) * lit(1000) / col("width"),
            lit(224) * lit(1000) / col("height")).as("scale_k"))
        .select(col("doc_id"),
          floor(col("width") * col("scale_k") / 1000).cast("int")
            .as("out_w"),
          floor(col("height") * col("scale_k") / 1000).cast("int")
            .as("out_h"))
        .orderBy("doc_id")
    },
    // Audio fingerprint near-dup (chromaprint-shaped plumbing): frame the
    // payload into 32-byte windows at a 16-byte hop, fingerprint each
    // window (here the window BYTES are the fingerprint — a real
    // deployment swaps in the spectral hash behind the same framing),
    // and pair audio docs sharing ≥ 4 windows. Hop-aligned framing is
    // the property under test: a copy trimmed by a hop multiple (the
    // planted +1000000 re-ingest drops the first 16 bytes) still shares
    // every subsequent window, exactly how audio fingerprinting survives
    // head trims. Ubiquitous windows (silence/boilerplate) are df-capped
    // before any pair enumerates — same skew rule as every blocking join
    // in the engine. Cost: posting lists over (doc, window), one shuffle;
    // never an audio×audio product.
    "m_audio_fp_dup" -> { (s, d) =>
      val audio = Tables.spread(Tables.documents(s, d))
        .filter(col("doc_id") % 3 === 1)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      val trimmed = audio.filter(col("doc_id") < 200)
        .select((col("doc_id") + 1000000).as("doc_id"),
          expr("substring(media, 17)").as("media"))
      val frames = audio.union(trimmed)
        .filter(length(col("media")) >= 32)
        .select(col("doc_id"), explode(array_distinct(
          transform(
            sequence(lit(0),
              floor((length(col("media")) - 32) / 16).cast("int")),
            i => col("media").substr(i * 16 + 1, lit(32))))).as("f"))
      frames.groupBy("f").agg(collect_list(col("doc_id")).as("ids"))
        .filter(size(col("ids")).between(2, 20))
        .select(explode(col("ids")).as("ida"), col("ids"))
        .select(col("ida"), explode(col("ids")).as("idb"))
        .filter(col("ida") < col("idb"))
        .groupBy("ida", "idb").agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 4)
        .orderBy("ida", "idb")
    },
    // frame sampling: every 5th frame of each fake video
    "m_frame_sample" -> { (s, d) =>
      decodeMeta(s, d)
        .filter(col("kind") === "video")
        .select(col("doc_id"),
          explode(sequence(lit(0), col("n_frames") - 1, lit(5)))
            .as("frame_idx"))
        .orderBy("doc_id", "frame_idx")
    })

  // Oracle replicates the deterministic fake from length(text) (docs are
  // ASCII, so octet length == char length).
  private val meta =
    """SELECT doc_id,
      |  ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
      |  length(text) AS n_bytes,
      |  CAST((length(text) % 64) * 10 + 16 AS INT) AS width,
      |  CAST((length(text) // 64 % 48) * 10 + 16 AS INT) AS height,
      |  CAST(length(text) % 50 + 1 AS INT) AS n_frames
      |FROM documents""".stripMargin

  val oracles: Map[String, String] = Map(
    "m_decode_meta" ->
      s"""SELECT doc_id, kind, n_bytes, width, height FROM ($meta)
         |ORDER BY doc_id""".stripMargin,
    "m_kind_stats" ->
      s"""SELECT kind, count(*) AS n, max(width) AS max_w,
         |       min(height) AS min_h, floor(avg(n_bytes) * 100 + 0.5) / 100.0 AS avg_bytes
         |FROM ($meta) GROUP BY kind ORDER BY kind""".stripMargin,
    "m_frame_sample" ->
      s"""SELECT doc_id, unnest(range(0, n_frames, 5)) AS frame_idx
         |FROM ($meta) WHERE kind = 'video'
         |ORDER BY doc_id, frame_idx""".stripMargin,
    "m_binary_dup" ->
      """SELECT keeper, copies FROM (
        |  SELECT min(doc_id) AS keeper, count(*) AS copies FROM (
        |    SELECT doc_id, text FROM documents
        |    UNION ALL
        |    SELECT doc_id + 1000000, text FROM documents
        |    WHERE doc_id < 100)
        |  GROUP BY md5(text))
        |WHERE copies > 1 ORDER BY keeper""".stripMargin,
    // frames recomputed over text (ASCII fixture: octet == char, so
    // substr-on-text mirrors the engine's substr-on-binary exactly)
    "m_audio_fp_dup" ->
      """WITH audio AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 1
        |  UNION ALL
        |  SELECT doc_id + 1000000, substr(text, 17) FROM documents
        |  WHERE doc_id % 3 = 1 AND doc_id < 200),
        |fr AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(0, (length(text) - 32) // 16 + 1),
        |    i -> substr(text, CAST(i * 16 + 1 AS INT), 32)))) AS f
        |  FROM audio WHERE length(text) >= 32),
        |dfc AS (SELECT f, count(*) AS c FROM fr GROUP BY f)
        |SELECT a.doc_id AS ida, b.doc_id AS idb,
        |  count(*) AS n_shared
        |FROM fr a JOIN fr b ON a.f = b.f AND a.doc_id < b.doc_id
        |JOIN dfc ON dfc.f = a.f
        |WHERE dfc.c BETWEEN 2 AND 20
        |GROUP BY 1, 2
        |HAVING count(*) >= 4
        |ORDER BY ida, idb""".stripMargin,
    "m_phash_pairs" ->
      """WITH ph AS (
        |  SELECT doc_id,
        |    (CAST((length(text) % 64) * 10 + 16 AS BIGINT) * 2097169
        |     + CAST((length(text) // 64 % 48) * 10 + 16 AS BIGINT) * 8191
        |     + length(text)) AS ph
        |  FROM documents WHERE doc_id % 3 = 0)
        |SELECT a.doc_id AS ida, b.doc_id AS idb,
        |  CAST(bit_count(xor(a.ph, b.ph)) AS INT) AS hamming
        |FROM ph a JOIN ph b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.ph, b.ph)) <= 3
        |ORDER BY ida, idb""".stripMargin,
    "m_phash_clusters" ->
      """WITH RECURSIVE ph AS (
        |  SELECT doc_id,
        |    (CAST((length(text) % 64) * 10 + 16 AS BIGINT) * 2097169
        |     + CAST((length(text) // 64 % 48) * 10 + 16 AS BIGINT) * 8191
        |     + length(text)) AS ph
        |  FROM documents WHERE doc_id % 3 = 0),
        |pairs AS (
        |  SELECT a.doc_id AS ida, b.doc_id AS idb
        |  FROM ph a JOIN ph b ON a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.ph, b.ph)) <= 3),
        |edges AS (
        |  SELECT ida AS s, idb AS t FROM pairs
        |  UNION ALL SELECT idb, ida FROM pairs),
        |reach(id, r) AS (
        |  SELECT DISTINCT s, s FROM edges
        |  UNION
        |  SELECT e.t, reach.r FROM reach JOIN edges e ON reach.id = e.s)
        |SELECT id AS doc_id, min(r) AS cluster
        |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,
    "m_resize" ->
      s"""SELECT doc_id,
         |  CAST(floor(width * scale_k / 1000) AS INT) AS out_w,
         |  CAST(floor(height * scale_k / 1000) AS INT) AS out_h
         |FROM (
         |  SELECT doc_id, width, height,
         |    least(224 * 1000 / width, 224 * 1000 / height) AS scale_k
         |  FROM ($meta) WHERE kind = 'image')
         |ORDER BY doc_id""".stripMargin)
}
