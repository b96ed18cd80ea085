package graft

import graft.functions.TokenCount
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** TokenCountRewrite: the HOF token-count idiom rewrites to the native
  * expression with identical results, and every guard holds its line.
  */
class PlanRewriteSpec extends SparkSpec {

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private val idiomSeps = Seq(" ", "\\s+", "[^a-zA-Z0-9]+")

  test("countTokens equals split-filter-size on edge cases and random strings") {
    val edge = Seq("", " ", "   ", "a", " a", "a ", " a ", "a b", "a  b ",
      "\t a\nb ", "..a!!b..", "ab12 cd", "..", "aé b中 c")
    val rnd = new scala.util.Random(42)
    val alphabet = "ab .\t\n!2é中"
    val random = Seq.fill(300)(
      Seq.fill(rnd.nextInt(30))(alphabet(rnd.nextInt(alphabet.length))).mkString)
    for (s <- edge ++ random; sep <- idiomSeps) {
      val expected = s.split(sep, -1).count(_.nonEmpty)
      val actual = TokenCount.countTokens(UTF8String.fromString(s), sep)
      assert(actual === expected, s"string=${s.replace("\n", "\\n")} sep=$sep")
    }
  }

  test("the idiom rewrites to token_count and keeps its values") {
    import spark.implicits._
    // parquet-backed: a LocalRelation is whole-plan constant-folded into
    // a LocalTableScan before any plan inspection could see the rewrite
    val dir = tempSfDir()
    Seq((0L, " a  b "), (1L, ""), (2L, "one two\tthree"), (3L, null))
      .toDF("id", "t").write.parquet(s"$dir/toks.parquet")
    val df = spark.read.parquet(s"$dir/toks.parquet").orderBy("id")
      .select(col("t"),
        size(filter(split(col("t"), "\\s+"), x => length(x) > 0)).as("n"))
    assert(planOf(df).contains("token_count"),
      s"rewrite did not fire:\n${planOf(df)}")
    val got = df.collect().map(r => if (r.isNullAt(1)) null else r.getInt(1))
    assert(got.toSeq === Seq(2, 0, 3, null))
  }

  test("tokenStats runs through the native expression, oracle values intact") {
    import spark.implicits._
    val dir = tempSfDir()
    writeTable(dir, "documents", Seq(
      (1L, "a b  c", "en", "src0", 6L),
      (2L, "", "en", "src0", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val stats = ops.TextAnalysis.tokenStats(spark, dir)
    assert(planOf(stats).contains("token_count"))
    val rows = stats.collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(rows.toSeq === Seq((1L, 3L), (2L, 0L)))
  }

  test("the pure-SQL surface (sql_tokencount) rewrites to token_count too") {
    import spark.implicits._
    val dir = tempSfDir()
    writeTable(dir, "documents", Seq(
      (1L, "a b  c", "en", "src0", 6L),
      (2L, "", "en", "src0", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val df = SparkEntry.queries("sql_tokencount")(spark, dir)
    assert(planOf(df).contains("token_count"),
      s"SQL-surface rewrite did not fire:\n${planOf(df)}")
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(rows.toSeq === Seq((1L, 3L), (2L, 0L)))
  }

  test("non-idiom lambdas and zero-width separators are left alone") {
    import spark.implicits._
    val df = Seq("a b").toDF("t")
    // different lambda (isin): not the idiom
    val other = df.select(
      size(filter(split(col("t"), " "), x => x.isin(lit("a")))).as("n"))
    assert(!planOf(other).contains("token_count"))
    assert(other.collect()(0).getInt(0) === 1)
    // separator that can match empty: guard refuses
    val zw = df.select(
      size(filter(split(col("t"), "x*"), x => length(x) > 0)).as("n"))
    assert(!planOf(zw).contains("token_count"))
    // split limit other than -1: not the idiom
    val lim = df.select(
      size(filter(split(col("t"), " ", 2), x => length(x) > 0)).as("n"))
    assert(!planOf(lim).contains("token_count"))
    assert(lim.collect()(0).getInt(0) === 2)
  }
}
