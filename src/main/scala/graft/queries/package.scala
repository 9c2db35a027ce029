package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

package object queries {

  /** The engine's internal clock domain is an epoch-NANOSECOND long
    * (`ts div 1000` → µs everywhere; the DuckDB oracles mirror it with
    * `epoch_ns(ts)`). Test data has shipped `ts` both as INT64
    * TIMESTAMP(NANOS) (read as long via nanosAsLong) and as plain
    * TIMESTAMP/TIMESTAMP_NTZ; normalize any timestamp-typed `ts` back
    * to epoch nanos so every query and every oracle sees one domain.
    * A plain NTZ→TIMESTAMP cast would interpret the naive wall time in
    * the SESSION timezone, so this builds the Cast with an explicit
    * `timeZoneId = UTC` instead — the same interpretation DuckDB's
    * `epoch_ns(TIMESTAMP)` uses for naive timestamps — making the
    * conversion self-contained: correct on any session regardless of
    * its timezone, with no session-state mutation. (Sessions built by
    * GraftSession/Verify/Bench/SparkSpec still pin UTC at construction
    * as the documented invariant for user-written time logic.) The
    * analyzer's ResolveTimeZone only fills EMPTY timeZoneIds, so the
    * explicit UTC survives analysis. Works on batch and streaming
    * DataFrames alike (pure projection). */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampNTZType) | Some(TimestampType) =>
        val utcInstant = GraftBridge.column(
          Cast(GraftBridge.expression(col("ts")), TimestampType, Some("UTC")))
        df.withColumn(
          "ts", (unix_micros(utcInstant) * 1000L).cast(LongType))
      case _ => df
    }

  /** Root of the reference fixture tree (ROOT files used by the
    * s10/s11/l14/l15/n12 connector queries). Resolved from
    * `GRAFT_REFERENCE_DATA` (or the `graft.reference.data` system
    * property) with the documented default `/root/reference/data`, so
    * the suite is portable to machines with the checkout elsewhere. */
  def referenceDataRoot: String =
    sys.env.getOrElse("GRAFT_REFERENCE_DATA",
      sys.props.getOrElse("graft.reference.data", "/root/reference/data"))

  /** Resolve a fixture path under [[referenceDataRoot]], failing with a
    * clear message (instead of a deep-in-the-plan FileNotFound) when
    * the fixture tree is absent. */
  def refData(rel: String): String = {
    val p = s"$referenceDataRoot/$rel"
    if (!new java.io.File(p).exists())
      throw new IllegalStateException(
        s"reference fixture missing: $p — set GRAFT_REFERENCE_DATA to " +
          "the reference data root (default /root/reference/data)")
    p
  }

  /** A query family contributes driver-checkable queries + DuckDB oracles. */
  trait QueryFamily {
    def queries: Map[String, (SparkSession, String) => DataFrame]
    def oracle: Map[String, String]
    protected def t(dir: String, name: String): String = s"$dir/$name.parquet"

    /** Read a test table. `events.parquet` has carried an INT64
      * TIMESTAMP(NANOS) column that Spark 4 refuses by default
      * (PARQUET_TYPE_ILLEGAL); nanosAsLong is a runtime SQLConf with no
      * per-read option form, so set it here to stay robust however the
      * session was built. Timestamp columns named `ts` are normalized
      * to the epoch-nanos long domain (see [[normalizeEventTs]], which
      * carries its own UTC cast — no session mutation). */
    protected def rd(s: SparkSession, dir: String, name: String): DataFrame = {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeEventTs(s.read.parquet(t(dir, name)))
    }
  }
}
