package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftSession.table

/** Data-layout planning: multi-dimensional clustering audit.
  *
  * At 100 TB the cheapest scan is the one that never happens: columnar
  * files carry per-file/rowgroup min-max stats, and a reader skips a
  * file when the predicate range misses its stats window. Single-column
  * sort layouts make that work for ONE key and destroy it for every
  * other; interleaving the bits of two keys (a Z-order / Morton curve —
  * the standard multi-dimensional clustering technique in lakehouse
  * table formats and spatial indexes) gives every interleaved column a
  * bounded min-max window per file.
  *
  * `zorderAudit` measures exactly that tradeoff on the orders table: it
  * buckets rows into `nBuckets` "files" under (a) the natural insertion
  * layout (orderkey ranges) and (b) a Z-order layout over
  * (custkey, order day), and reports each bucket's min-max WIDTH for
  * both predicate columns. Natural layout: day spans stay tight (orders
  * arrive roughly by date) but custkey spans cover the whole key range —
  * a custkey predicate prunes nothing. Z-order: both spans drop to
  * ~range/sqrt(nBuckets) — both predicates prune.
  *
  * Everything is exact integer math (bit interleave, fixed-width bucket
  * assignment from min/max), so the audit hash-matches the oracle;
  * the plan is two scans' worth of agg (the min/max constants broadcast
  * back) and one |rows| -> |2*nBuckets| aggregation — no sort, no
  * window, nothing global. The audit scales to any row count WHOSE KEY
  * OFFSETS FIT `bits` bits — and fails loudly (both dialects) rather
  * than silently folding distant keys together when they don't.
  */
object Layout {

  /** SQL for the Morton/Z interleave of the low `bits` bits of `a`
    * (even positions) and `b` (odd positions), in the given dialect.
    * Spark spells shifts as functions, DuckDB as operators; `&` and the
    * bit-sum are common. Both inputs must be non-negative BIGINTs that
    * fit in `bits` bits (callers normalize to offsets-from-min first) —
    * an input OUTSIDE that range RAISES at execution instead of silently
    * aliasing distant keys to the same z value (ADVICE r6: sf1 custkey
    * offsets overflow 16 bits, and the oracle shares the truncation so a
    * hash-match could never catch it). Both dialects generate the guard
    * from this one helper pair, so they cannot drift.
    */
  def zExprSpark(a: String, b: String, bits: Int): String = {
    val z = ((0 until bits).map(i => s"shiftleft(shiftright($a, $i) & 1, ${2 * i})") ++
      (0 until bits).map(i => s"shiftleft(shiftright($b, $i) & 1, ${2 * i + 1})"))
      .mkString(" + ")
    s"CASE WHEN $a BETWEEN 0 AND ${(1L << bits) - 1} AND $b BETWEEN 0 AND ${(1L << bits) - 1} " +
      s"THEN ($z) ELSE CAST(raise_error('z-order key offset exceeds $bits bits') AS BIGINT) END"
  }

  /** DuckDB spelling of the same guarded interleave (see zExprSpark). */
  def zExprDuckDb(a: String, b: String, bits: Int): String = {
    val z = ((0 until bits).map(i => s"((($a >> $i) & 1) << ${2 * i})") ++
      (0 until bits).map(i => s"((($b >> $i) & 1) << ${2 * i + 1})"))
      .mkString(" + ")
    s"CASE WHEN $a BETWEEN 0 AND ${(1L << bits) - 1} AND $b BETWEEN 0 AND ${(1L << bits) - 1} " +
      s"THEN ($z) ELSE CAST(error('z-order key offset exceeds $bits bits') AS BIGINT) END"
  }

  /** Per-bucket min-max span report for the natural (orderkey-range)
    * layout vs the Z-order (custkey x order-day) layout of orders.
    * Output: (layout, bucket, n_rows, ck_span, day_span), both layouts'
    * buckets fixed-width over the respective clustering key's range.
    */
  def zorderAudit(spark: SparkSession, sfDir: String,
                  nBuckets: Int = 16, bits: Int = 16): DataFrame = {
    val rows = table(spark, sfDir, "orders").select(
      col("o_orderkey").as("ok"),
      col("o_custkey").as("ck"),
      datediff(col("o_orderdate").cast("timestamp"),
        lit("1995-01-01").cast("timestamp")).cast("long").as("day"))
    val consts = rows.agg(
      min(col("ck")).as("ck_min"), min(col("day")).as("day_min"),
      min(col("ok")).as("ok_min"), max(col("ok")).as("ok_max"))
    val normed = rows.crossJoin(broadcast(consts))
      .withColumn("ckn", col("ck") - col("ck_min"))
      .withColumn("dayn", col("day") - col("day_min"))
      .withColumn("z", expr(zExprSpark("ckn", "dayn", bits)))
    // fixed-width bucket over each layout's clustering key range: the
    // file-assignment a range-partitioned sorted write would produce,
    // without needing a global sort to audit it
    val zc = normed.agg(min(col("z")).as("z_min"), max(col("z")).as("z_max"))
    val both = normed.crossJoin(broadcast(zc))
      .withColumn("bucket_nat",
        expr(s"(($nBuckets * (ok - ok_min)) div (ok_max - ok_min + 1))"))
      .withColumn("bucket_z",
        expr(s"(($nBuckets * (z - z_min)) div (z_max - z_min + 1))"))
    def spans(bucket: String, layout: String): DataFrame =
      both.groupBy(col(bucket).as("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          (max(col("ck")) - min(col("ck"))).as("ck_span"),
          (max(col("day")) - min(col("day"))).as("day_span"))
        .select(lit(layout).as("layout"), col("bucket"), col("n_rows"),
          col("ck_span"), col("day_span"))
    spans("bucket_nat", "natural")
      .unionByName(spans("bucket_z", "zorder"))
      .orderBy("layout", "bucket")
  }
}
