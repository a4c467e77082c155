package graft

import java.util.concurrent.atomic.AtomicBoolean

import org.scalatest.funsuite.AnyFunSuite

import graft.util.Forked

/** Pins for the fork-join contract behind the round-12 concurrency
  * (DedupStream's index writes, dedupIncrement's materializations). */
class ForkedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("awaitAll returns results in thunk order") {
    assert(Forked.awaitAll[Int](spark)(Seq(() => 1, () => 2, () => 3)) ==
      Seq(1, 2, 3))
  }

  test("awaitAll JOINS every sibling before surfacing the first failure " +
       "(no zombie thunks outlive the call)") {
    // thunk 0 fails instantly; thunk 1 is slow. A fail-fast await would
    // return while thunk 1 is still running (the zombie-writer hazard:
    // a streaming replay racing a still-committing writer). Pin that
    // by the time awaitAll throws, the slow sibling has COMPLETED.
    val slowDone = new AtomicBoolean(false)
    val e = intercept[RuntimeException] {
      Forked.awaitAll[Unit](spark)(Seq(
        () => throw new RuntimeException("fast failure"),
        () => { Thread.sleep(500); slowDone.set(true) }))
    }
    assert(e.getMessage == "fast failure", "the FIRST failure surfaces")
    assert(slowDone.get(),
      "awaitAll returned while a sibling thunk was still running")
  }

  test("awaitAll thunks run under the caller's Spark job group (pool " +
       "threads don't inherit it on their own)") {
    val sc = spark.sparkContext
    sc.setJobGroup("forked-spec-group", "forked spec", interruptOnCancel = false)
    try {
      val groups = Forked.awaitAll[String](spark)(Seq(
        () => String.valueOf(sc.getLocalProperty("spark.jobGroup.id")),
        () => String.valueOf(sc.getLocalProperty("spark.jobGroup.id"))))
      assert(groups == Seq("forked-spec-group", "forked-spec-group"),
        s"forked thunks escaped the caller's job group: $groups")
      // and the pool threads were CLEANED: a later bare future on the
      // same pool must not inherit a stale group from thread reuse
      val stale = Forked.awaitAll[String](spark)(Seq(
        () => String.valueOf(sc.getLocalProperty("spark.jobGroup.id"))))
      assert(stale == Seq("forked-spec-group"),
        "still inside the caller's group: inherited again, not stale reuse")
    } finally sc.clearJobGroup()
    val cleared = Forked.awaitAll[String](spark)(Seq(
      () => String.valueOf(sc.getLocalProperty("spark.jobGroup.id"))))
    assert(cleared == Seq("null"),
      s"caller cleared its group but the pool thread still carries one: $cleared")
  }
}
