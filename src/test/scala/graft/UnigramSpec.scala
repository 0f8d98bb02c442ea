package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Bpe, Unigram}

/** The unigram trainer's contract, pinned the same way BpeSpec pins BPE:
  * the distributed hard-EM must equal an independently-written
  * sequential reference (same seeding/tie-break rules, separate code
  * path), plus the encode invariants and non-vacuity.
  */
class UnigramSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Sequential reference: driver-side maps/loops only. */
  private def refTrain(words: Seq[(String, Long)], vocabSize: Int,
      rounds: Int, maxPieceLen: Int, maxWordLen: Int): Map[String, Long] = {
    val ws = words.filter { case (w, _) =>
      w.nonEmpty && w.length <= maxWordLen }
    // seed: frequency-weighted substring occurrence counts
    val occ = scala.collection.mutable.Map.empty[String, Long]
    for ((w, f) <- ws; st <- 0 until w.length;
         ln <- 1 to math.min(maxPieceLen, w.length - st))
      occ.updateWith(w.substring(st, st + ln)) {
        c => Some(c.getOrElse(0L) + f) }
    val chars = occ.filter(_._1.length == 1).toSeq.sortBy(_._1)
    val multi = occ.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, vocabSize - chars.size))
    var table: Seq[(String, Long)] = chars ++ multi
    def seg(w: String, score: Map[String, Long]): Seq[String] = {
      // forward DP over 1e-6-grid INTEGER scores (the round-10
      // portability grid), lengths DESCENDING with strict > (longest-
      // piece tie-break, the same rule the engine's ascending-j loop
      // encodes)
      val best = Array.fill(w.length + 1)(Long.MinValue)
      val back = new Array[Int](w.length + 1)
      best(0) = 0L
      for (i <- 1 to w.length;
           ln <- math.min(i, maxPieceLen) to 1 by -1) {
        val j = i - ln
        if (best(j) != Long.MinValue)
          score.get(w.substring(j, i)).foreach { s =>
            if (best(j) + s > best(i)) { best(i) = best(j) + s; back(i) = j }
          }
      }
      if (best(w.length) == Long.MinValue)
        return w.map(_.toString)
      var p = w.length
      var acc = List.empty[String]
      while (p > 0) { acc = w.substring(back(p), p) :: acc; p = back(p) }
      acc
    }
    for (_ <- 1 to rounds) {
      val total = math.max(1L, table.map(_._2).sum)
      val score = table.collect { case (p, c) if c > 0 =>
        p -> math.floor((math.log(c.toDouble) - math.log(total.toDouble))
          * 1000000.0 + 0.5).toLong }.toMap
      val counts = scala.collection.mutable.Map.empty[String, Long]
      for ((w, f) <- ws; p <- seg(w, score))
        counts.updateWith(p)(c => Some(c.getOrElse(0L) + f))
      table = table.flatMap { case (p, _) =>
        counts.get(p) match {
          case Some(c) => Some(p -> c)
          case None => if (p.length == 1) Some(p -> 0L) else None
        }
      }
    }
    table.toMap
  }

  test("distributed hard-EM equals the sequential reference on the " +
      "fixture vocabulary") {
    val vocab = Bpe.vocabulary(Tables.documents(spark, sf))
    val words = vocab.as[(String, Long)].collect().toSeq
    val want = refTrain(words, 512, 3, 6, 20)
    val got = Unigram.train(vocab, 512, 3, 6, 20).toMap
    assert(got == want,
      s"tables differ: only-engine=${(got.keySet -- want.keySet).take(5)} " +
        s"only-ref=${(want.keySet -- got.keySet).take(5)} " +
        s"count-diffs=${got.collect { case (p, c)
          if want.get(p).exists(_ != c) => (p, c, want(p)) }.take(5)}")
  }

  test("training is non-vacuous: multi-char pieces carry real usage") {
    val table = Unigram.train(
      Bpe.vocabulary(Tables.documents(spark, sf)))
    assert(table.exists { case (p, c) => p.length > 1 && c > 0 })
    // and the corpus's dominant words surface as whole pieces
    val pieces = table.filter(_._2 > 0).map(_._1).toSet
    assert(pieces.exists(_.length >= 3))
  }

  test("encode invariants: n_words <= n_pieces <= n_chars, deterministic") {
    val docs = Tables.documents(spark, sf)
    val table = Unigram.train(Bpe.vocabulary(docs))
    val enc = Unigram.encode(docs, table)
      .join(docs.select(col("doc_id"),
        length(regexp_replace(col("text"), " ", "")).cast("long")
          .as("n_chars")), "doc_id")
    val bad = enc.filter(col("n_pieces") < col("n_words") ||
      col("n_pieces") > col("n_chars")).count()
    assert(bad == 0)
    val a = Unigram.encode(docs, table).orderBy("doc_id").collect().toSeq
    val b = Unigram.encode(docs, table).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("driver fast path equals the distributed rounds (gate forced)") {
    // r17: the trainer collects the capped vocabulary and runs the
    // seed + hard-EM loop locally under the gate; gate 0 re-runs the
    // distributed path on the same corpus and must match exactly
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val vocab = graft.pipeline.Bpe.vocabulary(docs)
    val local = Unigram.train(vocab, 128, 2, 6, 20)
    spark.conf.set("graft.tokenizer.driverMaxVocab", "0")
    try {
      val dist = Unigram.train(vocab, 128, 2, 6, 20)
      assert(local == dist,
        s"local ${local.size} rows vs dist ${dist.size}")
    } finally spark.conf.unset("graft.tokenizer.driverMaxVocab")
  }

}
