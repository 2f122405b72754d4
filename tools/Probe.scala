package graft

/** Bench-methodology diagnostic main (not registered anywhere; the
  * graft.TimeQ sibling of plans/R10_PLAN_AUDIT.md Finding 3): cycles a
  * fixed heavy-query basket bench-style, with and without a suspect
  * query mixed in, printing per-pass basket times. Produced the data
  * that refuted session-poisoning (basket unchanged right after 3
  * consecutive suspect executions, persistent RDDs bounded, GC trivial)
  * and confirmed the JVM/JIT-ramp mechanism (basket 14.8s → 9.2s over
  * ~10 passes with no code change) behind the interleaved schedule's
  * suite-composition sensitivity — the reason Bench now times
  * per-query bursts. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8", "graft-probe")
    val dir = "/root/testdata/sf0.1"
    val basket = Seq("q75_curated_corpus", "q142_lang_overlap", "q187_phash_groups",
      "q176_winnow", "q175_pagerank", "q158_best_survivors")
    def time(name: String): Double = {
      val q = SparkEntry.registry.find(_.name == name).get
      val t0 = System.nanoTime(); q.fn(spark, dir).count(); (System.nanoTime() - t0) / 1e9
    }
    def pass(extra: Seq[String]): Map[String, Double] =
      (basket ++ extra).map(n => n -> time(n)).toMap
    def report(tag: String, m: Map[String, Double]): Unit =
      println(f"[probe] $tag basket=${basket.map(m).sum}%.2f  " +
        basket.map(n => f"${n.take(4)}=${m(n)}%.2f").mkString(" "))
    pass(Nil) // warm-up
    for (i <- 1 to 2) report(s"clean$i", pass(Nil))
    for (i <- 1 to 2) report(s"with207_$i", pass(Seq("q207_band_index_refresh")))
    for (i <- 1 to 2) report(s"with208_$i", pass(Seq("q208_component_refresh")))
    for (i <- 1 to 2) report(s"with_both$i", pass(Seq("q207_band_index_refresh", "q208_component_refresh")))
    for (i <- 1 to 2) report(s"clean_again$i", pass(Nil))
  }
}
