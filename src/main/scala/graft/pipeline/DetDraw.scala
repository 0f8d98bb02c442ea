package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE deterministic md5-draw idiom — one definition for every
  * engine-side draw and its DuckDB oracle twin (r13 ADVICE: three
  * hand-rolled spellings had grown — the BLEU/ROUGE drop gates, the
  * FIM/T5 cut draws, and the hash-split family — each separately
  * replayed in its oracle; a fourth spelling diverging silently from
  * its twin is exactly the bug class this kills).
  *
  * The idiom: a draw key is the ':'-joined string forms of its parts
  * (ids, block indexes, a salt tag); the md5 hex of that key yields
  *   - [[hash]]    — the full 32-hex digest (ordering / threshold
  *                   compares: shard layout, downsampling, interleave),
  *   - [[draw]]    — the first `nibbles` hex digits as an integer,
  *                   uniform in [0, 16^nibbles) (cut positions, span
  *                   gates, judge flips),
  *   - [[keepGate]] — the 1-in-16 position-drop gate (true = keep;
  *                   first nibble ≠ '0') used by the gen-eval
  *                   corruptions.
  * Every form is pure column arithmetic both engines compute
  * identically; the `sql*` builders emit the DuckDB replay of the SAME
  * value (DuckDB has no hex→int conv, so [[sqlDraw]] expands the
  * strpos-per-nibble polynomial — the former TrainingSet.md5Head4).
  * SQL fragment TEXT may differ from a hand-written spelling; the
  * VALUE is the contract, and the oracle hash compare enforces it.
  */
object DetDraw {
  /** ':'-joined draw key — NULL-PROPAGATING: any null part nulls the
    * whole key, so the md5/draw/gate downstream null out and the row
    * drops from samplers exactly like the SQL twins (whose `||` chain
    * null-propagates natively). concat_ws alone would silently SKIP a
    * null part and draw from a truncated key — a corrupt input (null
    * doc_id) would then sample on the surviving parts instead of
    * falling out (r14 ADVICE).
    */
  def key(parts: Column*): Column =
    when(parts.map(_.isNotNull).reduce(_ && _),
      concat_ws(":", parts.map(_.cast("string")): _*))

  /** Full md5 hex of the key — the hash-split family's order/threshold
    * value.
    */
  def hash(parts: Column*): Column = md5(key(parts: _*))

  /** First `nibbles` md5 hex digits as a BIGINT draw, uniform in
    * [0, 16^nibbles).
    */
  def draw(nibbles: Int, parts: Column*): Column =
    conv(substring(hash(parts: _*), 1, nibbles), 16, 10).cast("long")

  /** The 1-in-16 keep gate: true unless the first md5 nibble is '0'. */
  def keepGate(parts: Column*): Column =
    substring(hash(parts: _*), 1, 1) =!= "0"

  // ---- DuckDB twins (each part is a SQL expression string; quote
  // literal tags yourself: sqlDraw(4, "doc_id", "'fim1'")) ----

  def sqlKey(parts: String*): String =
    parts.map(p => s"CAST($p AS VARCHAR)").mkString(" || ':' || ")

  def sqlHash(parts: String*): String = s"md5(${sqlKey(parts: _*)})"

  /** Integer draw twin: the strpos-per-nibble polynomial (DuckDB lacks
    * a hex→int conv on arbitrary substrings).
    */
  def sqlDraw(nibbles: Int, parts: String*): String = {
    val arg = sqlHash(parts: _*)
    (1 to nibbles).map { i =>
      val mul = math.pow(16, nibbles - i).toLong
      s"(strpos('0123456789abcdef', substr($arg, $i, 1)) - 1) * $mul"
    }.mkString("(", " + ", ")")
  }

  def sqlKeepGate(parts: String*): String =
    s"substr(${sqlHash(parts: _*)}, 1, 1) != '0'"
}
