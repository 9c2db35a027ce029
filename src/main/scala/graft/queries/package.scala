package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** A query family contributes driver-checkable queries + DuckDB oracles. */
  trait QueryFamily {
    def queries: Map[String, (SparkSession, String) => DataFrame]
    def oracle: Map[String, String]
    protected def t(dir: String, name: String): String = s"$dir/$name.parquet"

    /** Read a test table. `events.parquet` carries an INT64
      * TIMESTAMP(NANOS) column that Spark 4 refuses by default
      * (PARQUET_TYPE_ILLEGAL); nanosAsLong is a runtime SQLConf, so set
      * it here to stay robust however the session was built. */
    protected def rd(s: SparkSession, dir: String, name: String): DataFrame = {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.read.parquet(t(dir, name))
    }
  }
}
