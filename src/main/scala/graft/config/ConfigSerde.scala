package graft.config

import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

import graft.filters.FilterSpec

/** Queue-definition (de)serialization — the engine analog of the
  * reference's filter blob round-trip (`KinesisMessageQueue.cs:392-416`,
  * `Read`/`Save` with `filters_Count` + per-index byte blobs). JSON via
  * json4s (ships with Spark) instead of the platform's binary ORM blobs;
  * the observable contract is the same: a definition survives storage and
  * reconstitutes an identical, validated config.
  */
object ConfigSerde {
  private implicit val formats: Formats = DefaultFormats

  def queueToJson(c: QueueConfig): String = Serialization.write(c)

  /** Parse + validate (`requireValid` mirrors the reference validating on
    * load, MQ:417-472).
    */
  def queueFromJson(json: String): QueueConfig =
    QueueConfig.requireValid(Serialization.read[QueueConfig](json))

  def filtersToJson(s: FilterSpec): String = Serialization.write(s)
  // validated on load like its queue twin — the round-trip contract is
  // "reconstitutes an identical, VALIDATED config", and an invalid verb
  // must fail here, not later inside the filter compiler
  def filtersFromJson(json: String): FilterSpec = {
    val s = Serialization.read[FilterSpec](json)
    graft.filters.FilterValidation.requireValid(s)
    s
  }
}
