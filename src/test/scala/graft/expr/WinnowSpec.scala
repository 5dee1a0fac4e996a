package graft.expr

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the native [[WinnowStats]] expression against the composable
  * transform/aggregate-fold formulation it replaced (the r13 rewrite
  * of `doc_winnowing`): same k-gram md5-prefix hashes, same
  * rightmost-min window rule, same distinct-fingerprint census — on
  * the real documents fixture AND the edge shapes (consecutive
  * spaces, exactly-w grams, all-identical grams ⇒ max tie pressure,
  * short docs ⇒ NULL).
  */
class WinnowSpec extends SparkSpec {

  private val k = 5
  private val w = 4

  /** The pre-r13 composable plan, verbatim. */
  private def composable(df: DataFrame): DataFrame = {
    val grams = transform(
      sequence(lit(1), greatest(size(split(col("text"), " ")) -
        lit(k - 1), lit(1))),
      i => substring(md5(array_join(
        slice(split(col("text"), " "), i, lit(k)), " ")), 1, 8))
    df.select(col("doc_id"), grams.as("g"))
      .filter(size(col("g")) >= w)
      .select(col("doc_id"), size(col("g")).cast("long").as("n_grams"),
        size(array_distinct(transform(
          transform(sequence(lit(1), size(col("g")) - lit(w - 1)),
            st => aggregate(sequence(st, st + lit(w - 1)),
              struct(lit("~").as("h"), lit(0).as("p")),
              (acc, j) => when(
                element_at(col("g"), j) <= acc.getField("h"),
                struct(element_at(col("g"), j).as("h"), j.as("p")))
                .otherwise(acc))),
          f => concat(f.getField("h"), lit(":"),
            f.getField("p").cast("string")))))
          .cast("long").as("n_fingerprints"))
  }

  private def native(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
        Winnow.winnow_stats(col("text"), k, w).as("ws"))
      .filter(col("ws").isNotNull)
      .select(col("doc_id"), col("ws.n_grams").as("n_grams"),
        col("ws.n_fingerprints").as("n_fingerprints"))

  private def check(df: DataFrame): Unit = {
    val a = composable(df).orderBy("doc_id").collect().map(_.toString)
    val b = native(df).orderBy("doc_id").collect().map(_.toString)
    assert(a.length == b.length,
      s"row counts diverge: composable=${a.length} native=${b.length}")
    assert(a.sameElements(b),
      s"winnow stats diverge:\n" +
        a.zip(b).filter { case (x, y) => x != y }.take(5).mkString("\n"))
  }

  test("native winnow ≡ composable fold on the sf0.001 documents") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001",
      "documents").select("doc_id", "text")
    check(docs)
    assert(native(docs).count() > 0, "fixture must exercise the path")
  }

  test("RANDOMIZED native ≡ composable: 300 scalacheck texts — tiny " +
    "vocab (max tie pressure), repeats, empty tokens, lengths across " +
    "the w-gram boundary") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val word = Gen.oneOf("a", "b", "ab", "ba", "", "x", "same", "q1")
    val text = for {
      n <- Gen.chooseNum(0, 40)
      ws <- Gen.listOfN(n, word)
    } yield ws.mkString(" ")
    val texts = Gen.listOfN(300, text)
      .apply(Gen.Parameters.default, Seed(1313L)).get
    val df = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    check(df)
  }

  test("native winnow ≡ composable fold on edge shapes: consecutive " +
    "spaces, exactly-w grams, identical grams (tie pressure), short " +
    "docs filtered on both sides") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a  b c   d e f g h i j"), // empty tokens from double spaces
      (2L, ("x " * (k + w - 1)).trim), // exactly w grams
      (3L, Seq.fill(30)("same").mkString(" ")), // identical grams: ties
      (4L, "too short"), // < w grams → filtered
      (5L, ""), // single empty token
      (6L, (1 to 60).map(i => s"t${i % 7}").mkString(" ")))
      .toDF("doc_id", "text")
    check(docs)
    // the short docs must be ABSENT, not zero-row'd differently
    assert(native(docs).filter(col("doc_id").isin(4L, 5L)).count() == 0)
  }
}
