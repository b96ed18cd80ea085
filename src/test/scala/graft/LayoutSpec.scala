package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Z-order interleave bit math pinned on known values, and the audit's
  * clustering claim verified on a dense synthetic grid where the exact
  * per-bucket spans are computable by hand.
  */
class LayoutSpec extends SparkSpec {

  test("zExprSpark: Morton interleave of known coordinates") {
    import spark.implicits._
    val df = Seq((3L, 5L), (1L, 0L), (0L, 1L), (0L, 0L))
      .toDF("ckn", "dayn")
      .withColumn("z", expr(Layout.zExprSpark("ckn", "dayn", 16)))
    val got = df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // a=3 -> bits 0,2 (=5); b=5 -> bits 1,5 (=34)
    assert(got === Map((3L, 5L) -> 39L, (1L, 0L) -> 1L, (0L, 1L) -> 2L, (0L, 0L) -> 0L))
  }

  test("zExprSpark: an offset beyond `bits` raises instead of truncating") {
    import spark.implicits._
    // 70000 > 2^16-1: silently dropping the high bits would alias
    // distant customers to one z value (ADVICE r6) — the guard raises
    val df = Seq((70000L, 3L)).toDF("ckn", "dayn")
      .select(expr(Layout.zExprSpark("ckn", "dayn", 16)).as("z"))
    val e = intercept[Exception](df.collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("z-order key offset exceeds 16 bits")),
      s"unexpected failure: $e")
  }

  test("zorderAudit: z buckets are square tiles, natural buckets span full custkey range") {
    import spark.implicits._
    // 64 x 64 dense grid in insertion order: custkey cycles 0..63 fast,
    // day advances every 64 rows. 4096 rows, 16 buckets of 256.
    val dir = tempSfDir()
    val base = 788918400000L // 1995-01-01T00:00:00Z millis
    val rows = (0 until 4096).map { i =>
      (i.toLong, (i % 64).toLong, base + (i / 64).toLong * 86400000L)
    }
    writeTable(dir, "orders", rows.toDF("o_orderkey", "o_custkey", "ms")
      .withColumn("o_orderdate", expr("timestamp_millis(ms)"))
      .drop("ms"))
    val audit = Layout.zorderAudit(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val (nat, zo) = audit.partition(_._1 == "natural")
    assert(nat.length === 16 && zo.length === 16)
    // natural: 256 consecutive orderkeys = 4 full days of 64 custkeys
    assert(nat.forall { case (_, _, n, ckSpan, daySpan) =>
      n == 256L && ckSpan == 63L && daySpan == 3L })
    // zorder: each 256-wide z range is a 16x16 (custkey, day) tile —
    // BOTH dimensions' min-max windows shrink 4x vs their full range
    assert(zo.forall { case (_, _, n, ckSpan, daySpan) =>
      n == 256L && ckSpan == 15L && daySpan == 15L })
  }
}
