package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared column helpers for oracle-parity output shapes. */
object ColumnFunctions {

  /** Epoch seconds (BIGINT) of a timestamp column. Driver parquet
    * timestamps load as TIMESTAMP_NTZ; with a UTC session, NTZ→LTZ is
    * identity on the wall clock, and LTZ→long is epoch seconds —
    * matching DuckDB's CAST(epoch(ts) AS BIGINT). */
  def epochSeconds(c: Column): Column = c.cast("timestamp_ltz").cast("long")

  /** Epoch microseconds (BIGINT) — exact event-time arithmetic for the
    * stateful operators; matches DuckDB's epoch_us(ts). */
  def epochMicros(c: Column): Column = unix_micros(c.cast("timestamp_ltz"))

  /** Exact money sum: per-row double expression (bit-exact in any
    * engine) cast to decimal before the order-insensitive exact sum,
    * result surfaced as double. */
  def moneySum(perRow: Column): Column =
    sum(perRow.cast("decimal(28,10)")).cast("double")

  /** Largest prime below 2^63 — modulus of the portable hash family. */
  val HashPrime: Long = 9223372036854775783L

  /** Lower 64 bits of md5(c) read little-endian, as DECIMAL(20,0) —
    * bit-identical to DuckDB's md5_number_lower(). Engine-portable
    * hashing is the foundation of the dedup/fingerprint operators: the
    * oracle can recompute every minhash/simhash exactly. */
  def md5Lower64(c: Column): Column = {
    val hex = md5(c.cast("string"))
    val rev = concat((0 until 8).map(i => substring(hex, 31 - 2 * i, 2)): _*)
    conv(rev, 16, 10).cast("decimal(20,0)")
  }

  /** Seeded portable 64-bit hash: md5Lower64("<seed>:" + c) mod HashPrime,
    * as a non-negative BIGINT. DuckDB equivalent:
    * (md5_number_lower(seed || ':' || c) % 9223372036854775783::UBIGINT)::BIGINT
    *
    * Delegates to the NATIVE `graft_hash_lo` kernel (graft.plans
    * .GraftHash) exactly as [[hash64Pair]] has since r12 — r17 closes
    * the migration for the single-seed form too (guide §1.2 step 2 /
    * §4.1: the interpreted md5/conv/substring column chain was still
    * the per-row cost of the winnowing, CDC-chunking, feature-hash and
    * deterministic-sampling operators; the kernel is one JVM md5 per
    * row and bit-identical — SurfaceSpec pins the equality against the
    * original chain on real text). Like hash64Pair, the kernel form is
    * null-STRICT, matching the DuckDB twin `seed || ':' || c` (the old
    * concat_ws chain silently hashed just the seed on NULL input — no
    * registered caller feeds nulls, and every hash-gated query
    * re-proves parity against DuckDB at two SFs). */
  def hash64(c: Column, seed: Int): Column =
    org.apache.spark.sql.functions.call_function(
      "graft_hash_lo", lit(seed.toString), c.cast("string"))

  /** TWO independent portable hashes from ONE md5: the (lower, upper)
    * 64-bit little-endian halves of md5("<tag>:" + c), each mod
    * HashPrime as non-negative BIGINT. A k-seed hash family then costs
    * one digest: g_s = (lo + s·hi) mod p (Kirsch–Mitzenmacher double
    * hashing; Bloom/minhash-standard). DuckDB twins:
    * md5_number_lower / md5_number_upper — byte order verified.
    *
    * Delegates to the NATIVE `graft_hash_lo/hi` kernel
    * (graft.plans.GraftHash — one JVM md5 + a thread-local pair memo,
    * so the (lo, hi) pair costs ONE digest) rather than the historical
    * md5/conv/substring column chain: same bits (SurfaceSpec pins the
    * equality on real text; every hash-gated query re-proves it
    * against DuckDB), ~2× faster, and one implementation instead of
    * two. This also unifies NULL semantics (ADVICE r11): both forms
    * are now null-strict, like DuckDB's `'tag:' || c` (the old
    * concat_ws chain silently hashed just the tag on NULL input). */
  def hash64Pair(c: Column, tag: String): (Column, Column) = {
    val s = c.cast("string")
    (org.apache.spark.sql.functions.call_function("graft_hash_lo", lit(tag), s),
     org.apache.spark.sql.functions.call_function("graft_hash_hi", lit(tag), s))
  }

  /** Deterministic UUID-shaped id from arbitrary content — the
    * replayable replacement for the reference generator's
    * `UUID.randomUUID` (SimulateMarketEvenSource.scala:29): same input
    * ⇒ same id, so tests can golden-check generated streams. */
  def deterministicUuid(c: Column): Column = {
    val h = md5(c.cast("string"))
    concat_ws("-",
      substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
      substring(h, 17, 4), substring(h, 21, 12))
  }
}
