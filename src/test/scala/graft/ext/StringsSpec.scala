package graft.ext

import graft.SparkSpec

/** Deletion-neighborhood near-join semantics on hand-computed cases. */
class StringsSpec extends SparkSpec {

  test("nearJoin finds substitution, insertion and deletion pairs — nothing else") {
    import spark.implicits._
    val df = Seq(
      (1L, "spark"),  // base
      (2L, "spork"),  // substitution at pos 3 → dist 1
      (3L, "sparks"), // insertion at end → dist 1
      (4L, "spak"),   // deletion of 'r' → dist 1
      (5L, "flink"),  // unrelated
      (6L, "spark"))  // exact duplicate → dist 0
      .toDF("id", "name")
    val out = Strings.nearJoin(df, "id", "name").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(4))).toMap
    assert(out((1L, 2L)) == 1L) // substitution
    assert(out((1L, 3L)) == 1L) // insertion
    assert(out((1L, 4L)) == 1L) // deletion
    assert(out((1L, 6L)) == 0L) // exact dup
    assert(!out.keySet.exists { case (a, b) => a == 5L || b == 5L },
      "unrelated string must produce no pair")
    // spork→sparks is dist 2: candidates may collide on a key only if
    // within dist 1 — the verify filter must keep recall exact
    assert(!out.contains((2L, 3L)))
  }

  test("nearJoin emits each qualifying pair exactly once despite multi-key hits") {
    import spark.implicits._
    // "aa" vs "ab": deletion keys of "aa" = {aa, a}; of "ab" = {ab, a, b}
    // — they share key "a" via TWO deletion positions of "aa"; the
    // distinct() must collapse that to one output row
    val df = Seq((1L, "aa"), (2L, "ab")).toDF("id", "name")
    val out = Strings.nearJoin(df, "id", "name").collect()
    assert(out.length == 1)
    assert(out(0).getLong(4) == 1L)
  }
}
