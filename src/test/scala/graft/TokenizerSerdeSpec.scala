package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Bpe, TokenizerSerde, Unigram}

/** Round-trip + validate-on-load contract for tokenizer artifacts, and
  * the end-to-end guarantee that matters: a RELOADED model encodes
  * byte-identically to the in-memory one it was saved from.
  */
class TokenizerSerdeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  private val sf = "/root/testdata/sf0.001"

  test("BPE merges: save → load → encode equals the in-memory model") {
    val docs = Tables.documents(spark, sf)
    val merges = Bpe.learnMerges(Bpe.vocabulary(docs), 10)
    val reloaded = TokenizerSerde.bpeFromJson(
      TokenizerSerde.bpeToJson(merges))
    assert(reloaded == merges)
    val a = Bpe.encode(docs, merges).orderBy("doc_id").collect().toSeq
    val b = Bpe.encode(docs, reloaded).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("unigram table: save → load → encode equals the in-memory model") {
    val docs = Tables.documents(spark, sf)
    val table = Unigram.train(Bpe.vocabulary(docs))
    val reloaded = TokenizerSerde.unigramFromJson(
      TokenizerSerde.unigramToJson(table))
    assert(reloaded == table)
    val a = Unigram.encode(docs, table).orderBy("doc_id").collect().toSeq
    val b = Unigram.encode(docs, reloaded).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("corrupt artifacts fail on load, not at apply time") {
    val merges = Seq((1, "a", "b", 5L), (2, "ab", "c", 3L))
    // shuffled ranks: cascade order would silently change
    intercept[IllegalArgumentException] {
      TokenizerSerde.bpeFromJson(TokenizerSerde.bpeToJson(
        merges.map { case (r, a, b, c) => (3 - r, a, b, c) }))
    }
    // gap in ranks
    intercept[IllegalArgumentException] {
      TokenizerSerde.bpeFromJson(TokenizerSerde.bpeToJson(
        Seq((1, "a", "b", 5L), (3, "ab", "c", 3L))))
    }
    intercept[IllegalArgumentException] {
      TokenizerSerde.unigramFromJson("""{"pieces":[]}""")
    }
    // duplicate piece
    intercept[IllegalArgumentException] {
      TokenizerSerde.unigramFromJson(TokenizerSerde.unigramToJson(
        Seq("a" -> 1L, "a" -> 2L)))
    }
    // multi-char piece over chars the single-char tier doesn't cover:
    // viterbi's fallback would be unable to segment its words
    intercept[IllegalArgumentException] {
      TokenizerSerde.unigramFromJson(TokenizerSerde.unigramToJson(
        Seq("a" -> 1L, "xy" -> 2L)))
    }
  }
}
