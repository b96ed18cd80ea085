package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.OracleHash

/** Cross-engine determinism contract, fuzzed (VERDICT r12 #7).
  *
  * The contract rules every registered query leans on (SparkEntry's
  * header: floor division for time bucketing, pmod remainders, DECIMAL
  * money accumulation, floor() double→integer narrowing, md5-derived
  * h60/h32 hashes) are enforced per query by convention — and the
  * corpus only ever exercises them on benign values (non-negative
  * timestamps and moneys), so a latent divergence on adversarial values
  * would never trip the gate. One such divergence is REAL and documented
  * here: DuckDB's integer `//` TRUNCATES toward zero exactly like
  * Spark's `div` (measured: `-7 // 2 = -3`), so the plain `epoch_us(ts)
  * // 1000000` oracle twins agree with the pmod-snapped Spark floorDiv
  * only because corpus timestamps are non-negative — on a pre-1970
  * timestamp they would differ by one bucket.
  *
  * These two registered queries generate adversarial values IN-PLAN from
  * a derivation both engines reproduce bit-identically (h60/h32 of
  * 'row:i' for i in 1..512 — md5 is the shared deterministic primitive),
  * then apply each contract rule in isolation:
  *
  *  - negative nanosecond timestamps (±1e18 ns ≈ ±31.7 years around the
  *    epoch, dense sub-ms components) through the floor-division and
  *    pmod-remainder rules — the oracle twin spells floor division
  *    explicitly (`(x - pmod-twin) // d`, exact because the numerator is
  *    snapped to a multiple) instead of relying on `//`'s truncation;
  *  - negative moneys through the DOUBLE materialization and the
  *    floor() narrowing rule (floor ≠ truncate below zero — the rule's
  *    whole point);
  *  - near-BIGINT-edge products (±2^62) through plain integer math;
  *  - near-overflow DECIMAL(38,0) accumulation (per-term ~4e27, group
  *    sums ~1e29) surfaced as strings so representation, not just value,
  *    must agree;
  *  - DECIMAL(18,6)-routed money sums over mixed-sign values surfaced
  *    as DOUBLE (the dsum6 discipline).
  *
  * The standing DuckDB gate (graft.Verify + tools/compare.py, the
  * driver's CORRECTNESS artifact) hash-compares both queries every
  * round, making the contract's adversarial envelope part of the
  * permanent green surface. RandomizedEquivalenceSpec adds the
  * spec-level half: the same Spark-side helpers vs a pure-JVM reference
  * (Math.floorDiv/floorMod, MessageDigest md5, BigDecimal) on random
  * adversarial longs.
  */
object Contract {

  /** The shared per-row derivation: everything is a pure function of
    * `i` through md5, so Spark and DuckDB construct identical rows with
    * no data movement. Kept in one place so both fuzz queries (and
    * the spec) agree on the recipe.
    */
  private def derived(spark: SparkSession, n: Int): DataFrame =
    spark.range(1, n + 1L).toDF("i")
      .withColumn("h", OracleHash.h60(concat(lit("row:"), col("i"))))
      .withColumn("h2", OracleHash.h32(concat(lit("row:"), col("i"))))
      // ±1e18 ns: pre-1970 timestamps with dense sub-ms components
      .withColumn("ts_ns",
        pmod(col("h"), lit(2000000000000000000L)) - lit(1000000000000000000L))
      // adversarial divisor 3..99 for the remainder rule
      .withColumn("m", pmod(col("h2"), lit(97L)) + lit(3L))
      // ±2,000.000 money in exact millis, then the DOUBLE surface form
      .withColumn("money_milli", pmod(col("h"), lit(4000001L)) - lit(2000000L))
      .withColumn("money", col("money_milli") / lit(1000.0d))

  /** contract_fuzz_rows: one row per i with every scalar rule applied —
    * floor-division time bucketing (s and ms) on negative nanos, pmod
    * remainders, floor() narrowing of negative doubles, near-edge
    * BIGINT products, and the h60/h32 hashes that seed it all.
    */
  def fuzzRows(spark: SparkSession, n: Int = 512): DataFrame =
    derived(spark, n)
      .select(
        col("i"),
        col("h").as("h60"),
        col("h2").as("h32"),
        col("ts_ns"),
        expr("(ts_ns - pmod(ts_ns, 1000000000L)) div 1000000000L").as("unix_sec"),
        expr("(ts_ns - pmod(ts_ns, 1000000L)) div 1000000L").as("unix_ms"),
        pmod(col("ts_ns"), col("m")).as("r_pmod"),
        col("money"),
        floor(col("money") * lit(997)).cast("long").as("floor_narrow"),
        ((col("h") - lit(576460752303423488L)) * lit(8L)).as("big62"))
      .orderBy("i")

  /** contract_fuzz_sums: the accumulation rules over the same rows —
    * DECIMAL(18,6)-routed mixed-sign money sums surfaced as DOUBLE, and
    * near-overflow DECIMAL(38,0) accumulation surfaced as a string.
    */
  def fuzzSums(spark: SparkSession, n: Int = 512): DataFrame =
    derived(spark, n)
      .groupBy(pmod(col("h2"), lit(10L)).as("grp"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("money").cast("decimal(18,6)")).cast("double").as("money_sum"),
        sum(col("ts_ns").cast("decimal(38,0)") * lit(4000000000L))
          .cast("decimal(38,0)").cast("string").as("big_dec_sum"))
      .orderBy("grp")
}
