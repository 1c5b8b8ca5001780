package graft

import org.apache.spark.sql.functions._

import graft.operators.{Blocklist, Profile}

/** Vocab-growth curve and blocklist matching vs brute-force on small
  * hand-checked corpora. */
class CorpusProfileSpec extends SparkSpec {
  import spark.implicits._

  test("vocabGrowth matches brute-force prefix vocabulary") {
    val docs = Seq(
      (1L, "a b c"), (2L, "a b"), (3L, "c d"), (5L, "d e f"), (9L, "a f g"))
      .toDF("doc_id", "text")
    val cutoffs = Seq(1L, 2L, 4L, 9L, 100L)
    val got = Profile.vocabGrowth(docs, cutoffs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val raw = Seq(
      1L -> "a b c", 2L -> "a b", 3L -> "c d", 5L -> "d e f", 9L -> "a f g")
    val want = cutoffs.map { c =>
      val in = raw.filter(_._1 <= c)
      (c, in.size.toLong, in.map(_._2.split(" ").length.toLong).sum,
        in.flatMap(_._2.split(" ")).distinct.size.toLong)
    }
    assert(got.toSeq === want)
  }

  test("vocabGrowth rejects unsorted cutoffs") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Profile.vocabGrowth(docs, Seq(5L, 1L))
    }
  }

  test("phraseMatches finds token-anchored, overlapping, repeated matches") {
    val docs = Seq(
      (1L, "the Bad-Word! appears"),        // normalization match at pos 1
      (2L, "bad bad bad"),                  // "bad bad" overlaps at 0 and 1
      (3L, "badword is one token"),         // must NOT match "bad word"
      (4L, "nothing here")).toDF("doc_id", "text")
    val m = Blocklist.phraseMatches(docs, Seq("bad word", "bad bad"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(m === Set((1L, 1L, 0), (2L, 0L, 1), (2L, 1L, 1)))
  }

  test("verdicts covers every doc and applies the hit threshold") {
    val docs = Seq(
      (1L, "x spam y spam z spam"), (2L, "spam once"), (3L, "clean"))
      .toDF("doc_id", "text")
    val v = Blocklist.verdicts(docs, Seq("spam"), maxHits = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(v === Set((1L, 3L, true), (2L, 1L, false), (3L, 0L, false)))
  }

  test("single-token and multi-token phrases count independently") {
    val docs = Seq((1L, "alpha beta gamma alpha beta")).toDF("doc_id", "text")
    val v = Blocklist.verdicts(docs, Seq("alpha beta", "gamma"), maxHits = 0L)
      .collect().head
    assert(v.getLong(1) === 3L && v.getBoolean(2))
  }
}
