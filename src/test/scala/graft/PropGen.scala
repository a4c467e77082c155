package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Shared seeded-generation helpers for the property suites — one
  * definition of the seeding discipline (ScalaCheck Gen evaluated at a
  * pinned Seed, so every run sees identical inputs) and of the md5-hex
  * reference used by the digest-arithmetic models. */
object PropGen {

  /** Deterministic int in [lo, hi] drawn from the pinned seed. */
  def int(seed: Long, lo: Int, hi: Int): Int = {
    val g: Gen[Int] = Gen.choose(lo, hi)
    g(Gen.Parameters.default, Seed(seed)).get
  }

  /** Lowercase md5 hex of raw bytes — the models' independent digest. */
  def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(b).map(x => f"$x%02x").mkString

  /** Lowercase md5 hex of a UTF-8 string. */
  def md5hex(s: String): String = md5hex(s.getBytes("UTF-8"))
}
