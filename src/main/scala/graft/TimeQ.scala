package graft

/** Ad-hoc single-query timer: `runMain graft.TimeQ <name>... [--sf=<dir>]`.
  *
  * Times `count()` per named query (best of 3 after one warm-up, the same
  * protocol as [[Bench]]) so a perf change can be measured in isolation
  * without a full bench pass. Not part of the driver contract.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val (flags, names) = args.partition(_.startsWith("--"))
    flags.filterNot(_.startsWith("--sf=")).foreach(f =>
      sys.error(s"unknown flag $f (only --sf=<dir> is supported)"))
    val sfDir = flags.collectFirst { case f if f.startsWith("--sf=") => f.stripPrefix("--sf=") }
      .getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-timeq")
    val byName = SparkEntry.registry.map(q => q.name -> q).toMap
    names.foreach { n =>
      val q = byName.getOrElse(n, sys.error(s"unknown query $n"))
      def once(): Double = {
        val t0 = System.nanoTime()
        q.fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up
      val ts = Seq.fill(3)(once())
      println(f"TIMEQ $n best=${ts.min}%.3f max=${ts.max}%.3f")
    }
    spark.stop()
  }
}
