package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference BPE: word-frequency table, nMerges rounds of (argmax
    * adjacent pair by (count DESC, a, b), greedy left-to-right apply). */
  private def refBpe(words: Seq[String], nMerges: Int): Seq[(Int, String, String, Long)] = {
    var seg: Map[Vector[String], Long] = words.groupBy(identity)
      .map { case (w, ws) => (w.split("").toVector, ws.size.toLong) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (r <- 0 until nMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- seg; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (counts.nonEmpty) {
        val ((a, b), n) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
        if (n >= 2) {
          out += ((r, a, b, n))
          seg = seg.groupMapReduce { case (syms, _) =>
            val acc = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                acc += (a + b); i += 2
              } else { acc += syms(i); i += 1 }
            }
            acc.result()
          }(_._2)(_ + _)
        }
      }
    }
    out.toSeq
  }

  test("train matches the reference algorithm on the classic corpus") {
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = Seq(Tuple1(words.mkString(" "))).toDF("text")
    val got = Bpe.train(docs, split(col("text"), " "), nMerges = 6)
      .orderBy("rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
      .toSeq
    assert(got == refBpe(words, 6))
    // and the merged column really is the concatenation
    val merged = Bpe.train(docs, split(col("text"), " "), nMerges = 2)
      .orderBy("rank").collect()
    assert(merged.forall(r => r.getString(3) == r.getString(1) + r.getString(2)))
  }

  test("greedy apply handles overlapping runs (aaa + merge(a,a) -> [aa, a])") {
    val docs = Seq(Tuple1("aaa aaa aaa")).toDF("text")
    val m = Bpe.train(docs, split(col("text"), " "), nMerges = 1)
    val seg = Bpe.segment(docs, split(col("text"), " "), m)
      .collect().map(r => (r.getString(0), r.getSeq[String](2)))
    assert(seg.toSeq == Seq(("aaa", Seq("aa", "a"))))
  }

  test("early stop when no pair reaches minPairFreq") {
    // every word distinct, so every adjacent pair has count 1 < 2
    val docs = Seq(Tuple1("ab cd ef")).toDF("text")
    val m = Bpe.train(docs, split(col("text"), " "), nMerges = 5)
    assert(m.count() == 0L)
  }

  test("segment under the trained merges reproduces the loop's final state") {
    val words = Seq.fill(4)("banana") ++ Seq.fill(3)("bandana")
    val docs = Seq(Tuple1(words.mkString(" "))).toDF("text")
    val m = Bpe.train(docs, split(col("text"), " "), nMerges = 4)
    val seg = Bpe.segment(docs, split(col("text"), " "), m)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2).toVector).toMap
    // reference: replay refBpe merges over the same words
    var ref: Map[Vector[String], Vector[String]] =
      words.distinct.map(w => (w.split("").toVector, w.split("").toVector)).toMap
    for ((_, a, b, _) <- refBpe(words, 4)) {
      ref = ref.map { case (k, syms) =>
        val acc = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            acc += (a + b); i += 2
          } else { acc += syms(i); i += 1 }
        }
        (k, acc.result())
      }
    }
    val refByWord = ref.map { case (k, v) => (k.mkString, v) }
    assert(seg == refByWord)
  }
}
