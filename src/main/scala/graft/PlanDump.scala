package graft

import org.apache.spark.sql.execution.ExplainMode

/** Scratch: dump formatted plans for named queries (not driver contract). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("4", "graft-plandump")
    val byName = SparkEntry.registry.map(q => q.name -> q).toMap
    val (exec, names) = args.partition(_ == "--exec")
    names.foreach { n =>
      println(s"===== $n")
      val df = byName(n).fn(spark, "/root/testdata/sf0.01")
      if (exec.nonEmpty) df.collect()  // materialize so AQE finalizes (ReusedExchange visible)
      println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
