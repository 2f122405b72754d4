package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite run (forked JVM).
  * Built via Sessions.local so tests see exactly the engine's conf —
  * including the parquet-nanos setting Tables.events requires. */
object TestSpark {
  lazy val spark: SparkSession = Sessions.local("4", "graft-test")
  val Sf0001 = "/root/testdata/sf0.001"
  val Sf001 = "/root/testdata/sf0.01"
}
