package graft

import graft.sources.Validate
import graft.sources.Validate._
import org.apache.spark.sql.functions._

/** Declarative constraint checking: exact violation counts per rule. */
class ValidateSpec extends SparkSpecBase {

  test("every rule counts its hand-built violations exactly") {
    val s = spark
    import s.implicits._
    // 6 rows: one null name, duplicated id 2, v=99 out of range,
    // code "X1" fails the regex, cat "zz" outside the set
    val df = Seq(
      (1L, Option("a"), 10L, "ab", "s1"),
      (2L, Option("b"), 20L, "cd", "s2"),
      (2L, Option("c"), 30L, "ef", "s1"),
      (3L, None,        40L, "gh", "s2"),
      (4L, Option("d"), 99L, "X1", "s1"),
      (5L, Option("e"), 50L, "ij", "zz"))
      .toDF("id", "name", "v", "code", "cat")
    for (rep <- Seq(1, 7)) {
      val out = Validate.check(df.repartition(rep), Seq(
          NotNull("name"),
          Unique(Seq("id")),
          InRange("v", 1L, 50L),
          Matches("code", "^[a-z][a-z0-9]$"),
          InSet("cat", Seq("s1", "s2"))))
        .collect().map(r => r.getString(1) ->
          ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
      assert(out("not_null") == ((6L, 1L, 0L)))
      assert(out("unique") == ((6L, 1L, 0L)))
      assert(out("in_range[1,50]") == ((6L, 1L, 0L)))
      // "X1" fails; null name row's code "gh" passes
      assert(out("matches[^[a-z][a-z0-9]$]") == ((6L, 1L, 0L)))
      assert(out("in_set[2]") == ((6L, 1L, 0L)))
    }
    // a clean frame certifies ok=1 on every rule
    val clean = Validate.check(df.filter(col("id") === 1L),
        Seq(NotNull("name"), Unique(Seq("id")), InRange("v", 1L, 50L)))
      .collect()
    assert(clean.forall(_.getLong(5) == 1L))
  }

  test("referencedIn counts orphan ROWS, ignores null keys, one pass") {
    val s = spark
    import s.implicits._
    // key 7 is an orphan appearing twice; null key is not a violation
    val fact = Seq(Option(1L), Option(1L), Option(7L), Option(7L), None)
      .toDF("k")
    val dim = Seq(1L, 2L, 3L).toDF("dk")
    for (rep <- Seq(1, 5)) {
      val r = Validate.referencedIn(fact.repartition(rep), "k", dim, "dk")
        .head()
      assert(r.getString(1) == "referenced_in[dk]")
      assert((r.getLong(3), r.getLong(4), r.getLong(5)) == ((5L, 2L, 0L)))
    }
    // fully-referenced fact certifies ok
    val ok = Validate.referencedIn(
      Seq(1L, 2L).toDF("k"), "k", dim, "dk").head()
    assert((ok.getLong(4), ok.getLong(5)) == ((0L, 1L)))
  }

  test("null-only and empty-ish edge cases stay exact") {
    val s = spark
    import s.implicits._
    val df = Seq((null.asInstanceOf[String], null.asInstanceOf[String]))
      .toDF("a", "b")
    val out = Validate.check(df, Seq(
        NotNull("a"), Matches("b", "^x$"), InSet("b", Seq("x"))))
      .collect().map(r => r.getString(1) -> r.getLong(4)).toMap
    // null rows violate not_null but never matches/in_set
    assert(out("not_null") == 1L)
    assert(out("matches[^x$]") == 0L)
    assert(out("in_set[1]") == 0L)
  }
}
