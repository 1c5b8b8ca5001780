package graft

import org.apache.spark.sql.functions._

import graft.operators.SuffixArray

/** Brute-force verification of the prefix-doubling suffix array: ranks
  * and longest-duplicated-substring lengths are recomputed in plain
  * Scala by sorting/scanning materialized token suffixes, and banding is
  * checked to be execution-only (bands=1 vs default are identical). */
class SuffixArraySpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    // doc 1 and 3 share "the quick brown fox" (4 tokens); doc 2 repeats
    // "ha" internally; doc 4 is an exact duplicate of doc 1; doc 5 is
    // disjoint vocabulary; doc 6 empty after tokenization
    (1L, "The quick brown fox jumps over the lazy dog"),
    (2L, "ha ha ha ha stop"),
    (3L, "I saw the quick brown fox yesterday"),
    (4L, "The quick brown fox jumps over the lazy dog"),
    (5L, "zzz completely unrelated words here"),
    (6L, "!!!")
  ).toDF("doc_id", "text")

  private def tokens(s: String): Vector[String] =
    s.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
      .split(" ").toVector.filter(_.nonEmpty)

  private val docs: Map[Long, Vector[String]] = Seq(
    1L -> "The quick brown fox jumps over the lazy dog",
    2L -> "ha ha ha ha stop",
    3L -> "I saw the quick brown fox yesterday",
    4L -> "The quick brown fox jumps over the lazy dog",
    5L -> "zzz completely unrelated words here",
    6L -> "!!!").map { case (id, t) => id -> tokens(t) }.toMap

  private val suffixes: Seq[(Long, Int, Vector[String])] = (for {
    (id, tk) <- docs.toSeq
    pos <- tk.indices
  } yield (id, pos, tk.drop(pos))).sortBy { case (id, pos, _) => (id, pos) }

  import scala.math.Ordering.Implicits.seqOrdering
  private val expectedRanks: Map[(Long, Int), Long] = {
    val ordered = suffixes.map(_._3).distinct.sorted
    val rankOf = ordered.zipWithIndex.map { case (s, i) => s -> (i + 1L) }.toMap
    suffixes.map { case (id, pos, s) => (id, pos) -> rankOf(s) }.toMap
  }

  test("suffixRanks matches brute-force lexicographic dense ranks") {
    val got = SuffixArray.suffixRanks(corpus)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == expectedRanks)
  }

  test("banding is execution-only: bands=1 equals default") {
    val a = SuffixArray.suffixRanks(corpus, bands = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = SuffixArray.suffixRanks(corpus)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a == b)
  }

  test("longestDuplicatedSubstring matches brute-force LCP scan") {
    def lcp(a: Vector[String], b: Vector[String]): Int =
      a.zip(b).takeWhile { case (x, y) => x == y }.size
    // brute force: for every suffix, max LCP against every OTHER suffix
    val expected: Map[Long, Long] = docs.map { case (id, tk) =>
      val dups = for {
        pos <- tk.indices
        s = tk.drop(pos)
        (oid, opos, os) <- suffixes if (oid, opos) != (id, pos)
      } yield if (s == os) s.size else lcp(s, os)
      id -> (if (dups.isEmpty) 0L else dups.max.toLong)
    }
    val got = SuffixArray.longestDuplicatedSubstring(corpus)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expected)
    // doc 4 duplicates doc 1 entirely (9 tokens); doc 2's "ha ha ha"
    // self-repeat is 3; doc 5 shares nothing
    assert(got(1L) == 9L && got(4L) == 9L)
    assert(got(2L) == 3L)
    assert(got(5L) == 0L)
    assert(got(6L) == 0L)
  }

  test("n_suffixes counts token positions, empty docs report zero") {
    val got = SuffixArray.longestDuplicatedSubstring(corpus)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == docs.map { case (id, tk) => id -> tk.size.toLong })
  }
}
