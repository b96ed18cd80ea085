package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, cross-engine hash functions.
  *
  * The harness hash-compares our results against DuckDB, so every hash
  * that influences OUTPUT VALUES must be computable identically in both
  * engines. md5 is the one cryptographic primitive with bit-identical
  * output everywhere, so these derive integer hashes from md5 hex
  * prefixes:
  *
  *   h60(s) = int(md5(s)[0:15], 16)   -- 60 bits, fits a signed 64-bit
  *   h32(s) = int(md5(s)[0:8], 16)    -- 32 bits, safe for products
  *
  * DuckDB twin: `('0x' || substr(md5(s), 1, 15))::BIGINT` etc.
  *
  * At 100 TB you would swap these for `xxhash64` (Spark-native,
  * codegen'd, ~10x faster than md5) — the sketch math is identical, only
  * the oracle can't follow. `fastHash64` is that production path.
  */
object OracleHash {

  /** 60-bit integer hash, identical to DuckDB `('0x'||substr(md5(s),1,15))::BIGINT`. */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 32-bit integer hash (0 .. 2^32-1), identical to DuckDB `('0x'||substr(md5(s),1,8))::BIGINT`. */
  def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** The i-th independent hash family member: h60 of "i:s". */
  def h60i(i: Column, c: Column): Column =
    h60(concat(i.cast("string"), lit(":"), c))

  /** Production-path hash: Spark-native xxhash64 (codegen'd, no md5 cost).
    * Not oracle-comparable. The sketch aggregates carry their own xxh64
    * family (MinHashSketchAgg family="xxh64", the dedup_minhash_fast
    * query); this Column form is for expression-level uses.
    */
  def fastHash64(c: Column, seed: Int = 42): Column = xxhash64(lit(seed), c)
}
