package graft.pipeline

import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

/** Persistence for trained tokenizer artifacts — the model files a
  * pipeline writes once at training time and ships to every consumer
  * (the engine-side analog of a `merges.txt` / SentencePiece model).
  * Same contract as [[graft.config.ConfigSerde]]: round-trips
  * reconstitute an identical, VALIDATED artifact, and a corrupt file
  * fails on load — never later inside `applyMerge`/`viterbi` where the
  * error would surface as silently-wrong segmentations.
  */
object TokenizerSerde {
  private implicit val formats: Formats = DefaultFormats

  case class BpeMerge(rank: Int, left: String, right: String, count: Long)
  case class BpeModel(merges: Seq[BpeMerge])
  case class UnigramPiece(piece: String, count: Long)
  case class UnigramModel(pieces: Seq[UnigramPiece])

  def bpeToJson(merges: Seq[(Int, String, String, Long)]): String =
    Serialization.write(BpeModel(merges.map { case (r, a, b, c) =>
      BpeMerge(r, a, b, c) }))

  /** Load + validate: ranks must be exactly 1..n in order (BPE merges
    * CASCADE — rank i's output feeds rank i+1's matches, so a missing or
    * shuffled rank silently changes every later merge), sides non-empty,
    * counts positive.
    */
  def bpeFromJson(json: String): Seq[(Int, String, String, Long)] = {
    val m = Serialization.read[BpeModel](json).merges
    require(m.map(_.rank) == (1 to m.size),
      s"BPE ranks must be contiguous 1..${m.size} in order, " +
        s"got ${m.map(_.rank).take(8)}")
    m.foreach { e =>
      require(e.left.nonEmpty && e.right.nonEmpty,
        s"empty merge side at rank ${e.rank}")
      require(e.count > 0, s"non-positive count at rank ${e.rank}")
    }
    m.map(e => (e.rank, e.left, e.right, e.count))
  }

  def unigramToJson(table: Seq[(String, Long)]): String =
    Serialization.write(UnigramModel(table.map { case (p, c) =>
      UnigramPiece(p, c) }))

  /** Load + validate: pieces distinct and non-empty, counts non-negative
    * (zero is legal — unused single chars stay for coverage), and every
    * multi-char piece's characters covered by the single-char tier, the
    * invariant [[Unigram.viterbi]]'s fallback relies on.
    */
  def unigramFromJson(json: String): Seq[(String, Long)] = {
    val t = Serialization.read[UnigramModel](json).pieces
    require(t.nonEmpty, "empty unigram table")
    val ps = t.map(_.piece)
    require(ps.distinct.size == ps.size, "duplicate pieces")
    t.foreach { e =>
      require(e.piece.nonEmpty, "empty piece")
      require(e.count >= 0, s"negative count for '${e.piece}'")
    }
    val chars = ps.filter(_.length == 1).map(_.charAt(0)).toSet
    val uncovered = ps.filter(_.length > 1)
      .flatMap(_.toSeq).filterNot(chars.contains).distinct
    require(uncovered.isEmpty,
      s"multi-char pieces use chars missing from the single-char tier: " +
        s"${uncovered.take(8).mkString("'", "', '", "'")}")
    t.map(e => (e.piece, e.count))
  }
}
