package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.datax.{Dedup, TextStats}

/** Property-based invariants for the text-fingerprinting family
  * (SURVEY.md §5.3 pattern): seeded random corpora checked against
  * independent Scala models that recompute the md5/window/majority
  * machinery from scratch — not a replay of the operators' plans. The
  * fixed-example DataxSpec rows pin behavior on hand-picked shapes;
  * these pin it on arbitrary doc lengths, gram collisions, and passage
  * offsets. */
class TextStatsPropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  import PropGen.{int, md5hex}

  /** Random word-soup docs over a tiny vocabulary — small enough that
    * duplicate n-grams and winnow-hash collisions actually occur. */
  private def genDocs(n: Int, seed: Long, minLen: Int, maxLen: Int,
                      vocab: Seq[String]): Seq[(Long, String)] =
    (0 until n).map { i =>
      val len = int(seed + i, minLen, maxLen)
      val ws = (0 until len).map(j => vocab(int(seed + 1000L * i + j, 0, vocab.length - 1)))
      (i.toLong, ws.mkString(" "))
    }

  test("repetition == the brute-force duplicate-n-gram model") {
    val s = spark
    import s.implicits._
    val vocab = Seq("alpha", "beta", "gamma", "delta")
    val n = 3
    // lengths 1..12 straddle the gram width: zero-gram docs (len < n)
    // hit the coalesce path, longer docs hit real duplicate fractions
    val docs = genDocs(40, 11001L, minLen = 1, maxLen = 12, vocab)
    val got = TextStats.repetition(docs.toDF("doc_id", "text"),
        "doc_id", "text", n = n)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    val want = docs.map { case (id, text) =>
      val toks = text.split(" ")
      val grams = toks.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq
      val cnt = grams.length.toLong
      val dis = grams.distinct.length.toLong
      (id, cnt, dis, if (cnt == 0) 0.0 else (cnt - dis).toDouble / cnt)
    }
    assert(got == want, "n-gram count, distinct count, and dup fraction " +
      "must match the sliding-window model exactly")
    // non-vacuity: the vocabulary is small enough that real duplication
    // occurred, and short docs exercised the zero-gram path
    assert(want.exists(_._4 > 0.0), "no doc with duplicate n-grams")
    assert(want.exists(_._2 == 0L), "no zero-gram doc")
  }

  test("winnowFingerprints == the md5 window-minimum model") {
    val s = spark
    import s.implicits._
    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps")
    val (k, w) = (4, 4)
    // lengths straddle k and k+w-1: no-gram docs, docs with grams but no
    // full window, and real winnowed docs all occur
    val docs = genDocs(36, 12001L, minLen = 2, maxLen = 18, vocab)
    val got = Dedup.winnowFingerprints(docs.toDF("doc_id", "text"),
        "doc_id", "text", k = k, w = w)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val want = docs.flatMap { case (id, text) =>
      val toks = text.split(" ")
      // hash every full k-gram in position order
      val hs = toks.sliding(k).filter(_.length == k)
        .map(g => java.lang.Long.parseLong(md5hex(g.mkString(" ")).take(8), 16))
        .toIndexedSeq
      // keep each FULL w-window's minimum, dedup per doc
      hs.sliding(w).filter(_.length == w).map(win => (id, win.min)).toSet
    }.toSet
    assert(got == want, "fingerprint sets must match the recomputed " +
      "k-gram-hash window minima exactly")
    // non-vacuity: some doc yields no fingerprints (too short), some
    // yields fewer fingerprints than windows (adjacent windows sharing
    // their minimum — the winnowing compression actually engaged)
    val docsWithFp = want.map(_._1)
    assert(docs.exists(d => !docsWithFp.contains(d._1)), "no too-short doc")
    val fullWindows = docs.map { case (id, t) =>
      id -> math.max(0, t.split(" ").length - k - w + 2)
    }.toMap
    assert(want.groupBy(_._1).exists { case (id, fps) => fps.size < fullWindows(id) },
      "no doc compressed below its window count")
  }

  test("winnowing guarantee on random offsets: docs sharing a >= w+k-1 " +
       "token passage share a fingerprint") {
    val s = spark
    import s.implicits._
    val (k, w) = (4, 4)
    val guarantee = w + k - 1 // any shared run this long spans a full window
    // 12 pairs: each plants ONE shared passage (unique vocabulary per
    // pair) at an independent random offset inside per-doc unique filler
    // — no token is shared between docs except the passage itself
    val docs = (0 until 12).flatMap { p =>
      val passage = (0 until guarantee + int(13050L + p, 0, 3))
        .map(j => s"p${p}x$j")
      Seq(0, 1).map { side =>
        val id = (2 * p + side).toLong
        val pre = (0 until int(13100L + 10 * p + side, 0, 8))
          .map(j => s"u${id}a$j")
        val post = (0 until int(13200L + 10 * p + side, 0, 8))
          .map(j => s"u${id}b$j")
        (id, (pre ++ passage ++ post).mkString(" "))
      }
    }
    val fps = Dedup.winnowFingerprints(docs.toDF("doc_id", "text"),
        "doc_id", "text", k = k, w = w)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).toSet }
    (0 until 12).foreach { p =>
      val shared = fps(2L * p) intersect fps(2L * p + 1)
      assert(shared.nonEmpty,
        s"pair $p: a $guarantee+-token shared passage must yield a " +
          "shared fingerprint at ANY offset (the MOSS guarantee)")
    }
    // non-vacuity: the offsets really differ within pairs somewhere
    // (guaranteed by the seeded pre-filler lengths; assert it anyway)
    val preLens = docs.map { case (id, t) =>
      id -> t.split(" ").indexWhere(_.startsWith("p")) }.toMap
    assert((0 until 12).exists(p =>
      preLens((2 * p).toLong) != preLens((2 * p + 1).toLong)),
      "every pair aligned at the same offset — offsets never varied")
  }

  test("simhashTablePortable == the Scala bit-majority model over md5 nibbles") {
    val s = spark
    import s.implicits._
    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val docs = genDocs(30, 14001L, minLen = 1, maxLen = 15, vocab)
    val got = Dedup.simhashTablePortable(docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    def model(text: String): Long = {
      val sums = Array.fill(64)(0)
      text.split(" ").foreach { t =>
        val hex = md5hex(t)
        val chunks = Array(
          java.lang.Long.parseLong(hex.substring(0, 8), 16),
          java.lang.Long.parseLong(hex.substring(8, 16), 16))
        (0 until 64).foreach { j =>
          val i = j / 4 // hex-char position of the nibble within 16
          val shift = (7 - i % 8) * 4 + (j % 4)
          val bit = (chunks(i / 8) >> shift) & 1L
          sums(j) += (if (bit == 1L) 1 else -1)
        }
      }
      (0 until 64).map(j => if (sums(j) > 0) 1L << j else 0L)
        .foldLeft(0L)(_ | _)
    }
    val want = docs.map { case (id, text) => (id, model(text)) }
    assert(got == want, "every 64-bit fingerprint must match the " +
      "independently decoded md5 nibble majority")
    // non-vacuity: fingerprints vary across docs (the decode is not
    // collapsing to a constant)
    assert(got.map(_._2).distinct.size > 1, "all fingerprints identical")
  }
}
