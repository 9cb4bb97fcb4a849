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
}
