package graft.model

import org.apache.spark.sql.types._

/** The engine's record envelope — the Spark-native equivalent of the
  * reference's per-record projection (SURVEY §1.1).
  *
  * Reference: `Decisions.Kinesis/KinesisThreadJobs.cs:685-727` materializes
  * each AWS Kinesis `Record` as (messageId=SequenceNumber, messageBody,
  * messageText) plus the metadata pairs built in
  * `Decisions.Kinesis/KinesisUtils.cs:146-183`. We model the same envelope
  * as one typed case class; `data` is the raw payload (`BinaryType`),
  * `messageText` its UTF-8 decode.
  *
  * The schema deliberately matches Spark's own kinesis/kafka-style source
  * output (`data, partitionKey, sequenceNumber, approximateArrivalTimestamp`)
  * so a real connector can be dropped in without reshaping.
  */
final case class KinesisRecord(
    data: Array[Byte],
    partitionKey: String,
    sequenceNumber: String,
    approximateArrivalTimestamp: java.sql.Timestamp,
    /** `KinesisUtils.cs:173`: null encryption reported as "None". */
    encryptionType: String)

object KinesisRecord {
  /** Fixed envelope schema (SURVEY §1.1). */
  val schema: StructType = StructType(Seq(
    StructField("data", BinaryType),
    StructField("partitionKey", StringType),
    StructField("sequenceNumber", StringType),
    StructField("approximateArrivalTimestamp", TimestampType),
    StructField("encryptionType", StringType)))
}
