package graft

import java.lang.management.ManagementFactory
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

/** Residual-burst mechanism probe (R14 demand 2, the spread_max half):
  * the r14 driver-protocol bench still shows multi-second bursts with
  * gc_ms ≈ 0 on TRIVIAL queries (q06_anti_join, 0.4s cost, runs
  * [0.4s, 4.3s, 7.1s]) at the capped 8 GiB heap — so the r13
  * first-touch-fault mechanism is ruled out and the burst is not
  * query-specific. This probe loops one fixed anti-join-shaped query
  * and brackets every iteration with HOST telemetry the JVM cannot
  * fake:
  *
  *   - `/proc/stat` steal jiffies (field 8): time this VM's vCPUs were
  *     runnable but the HYPERVISOR ran someone else. The host shows
  *     ~60,000 accumulated steal-seconds at boot+33h, so steal is live
  *     here.
  *   - `/proc/pressure/cpu` some-total µs (PSI): time runnable tasks
  *     waited for a CPU *inside* the guest (over-subscription by other
  *     guest processes would show here; pure hypervisor steal shows in
  *     steal but barely in PSI).
  *   - process CPU time (OperatingSystemMXBean): how much CPU the JVM
  *     actually received during the iteration.
  *   - GC time delta: rules GC back in/out per burst.
  *
  * A burst iteration (wall ≫ median) then reads as one of: steal spike
  * (hypervisor contention — not fixable from userspace, the mechanism
  * note documents it), PSI spike without steal (guest-local
  * contention — find the process), gc spike (heap, contradicting the
  * 8g fix), or none of the above (the mystery deepens; next stop
  * jstack). Prints one JSON line per iteration plus a burst summary.
  * Run: `sbt "runMain graft.BurstProbe"`; lives in tools/ once its
  * data is captured. */
object BurstProbe {
  private def readFile(p: String): String =
    try new String(Files.readAllBytes(Paths.get(p))) catch { case _: Throwable => "" }

  /** (user, system, idle, iowait, steal) jiffies from the aggregate cpu line. */
  private def cpuStat(): (Long, Long, Long, Long, Long) = {
    val f = readFile("/proc/stat").linesIterator.next().trim.split("\\s+")
    (f(1).toLong, f(3).toLong, f(4).toLong, f(5).toLong, f(8).toLong)
  }

  /** PSI some-total microseconds for a resource ("cpu", "io", "memory"). */
  private def psiTotal(res: String): Long =
    readFile(s"/proc/pressure/$res").linesIterator
      .find(_.startsWith("some"))
      .flatMap(l => "total=(\\d+)".r.findFirstMatchIn(l).map(_.group(1).toLong))
      .getOrElse(-1L)

  private def gcMs(): Long = ManagementFactory.getGarbageCollectorMXBeans
    .asScala.map(_.getCollectionTime).sum

  private def procCpuNs(): Long = ManagementFactory.getOperatingSystemMXBean match {
    case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
    case _ => -1L
  }

  def main(args: Array[String]): Unit = {
    val iters = sys.env.getOrElse("SPARK_GRAFT_BURST_ITERS", "400").toInt
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "graft-burst-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val orders = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
    // q06's shape: shuffle anti join, ~0.2-0.4s at sf0.1 — cheap enough
    // to loop hundreds of times, real enough to cross the scheduler,
    // shuffle, and codegen paths a registered query crosses.
    def body(): Long =
      customer.join(orders, customer("c_custkey") === orders("o_custkey"), "left_anti").count()
    body(); body() // warm codegen + scan cache

    val rows = (0 until iters).map { i =>
      val (u0, s0, _, w0, st0) = cpuStat()
      val psi0 = psiTotal("cpu"); val io0 = psiTotal("io")
      val gc0 = gcMs(); val pc0 = procCpuNs()
      val t0 = System.nanoTime()
      body()
      val wallMs = (System.nanoTime() - t0) / 1000000
      val (u1, s1, _, w1, st1) = cpuStat()
      val r = Map(
        "i" -> i, "wall_ms" -> wallMs,
        "gc_ms" -> (gcMs() - gc0),
        "proc_cpu_ms" -> (procCpuNs() - pc0) / 1000000,
        "steal_ms" -> (st1 - st0) * 10, // jiffies @100Hz
        "user_ms" -> (u1 - u0) * 10,
        "sys_ms" -> (s1 - s0) * 10,
        "iowait_ms" -> (w1 - w0) * 10,
        "psi_cpu_ms" -> (psiTotal("cpu") - psi0) / 1000,
        "psi_io_ms" -> (psiTotal("io") - io0) / 1000)
      println(r.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}"))
      r
    }

    val walls = rows.map(_("wall_ms").toString.toLong).sorted
    val median = walls(walls.size / 2)
    val bursts = rows.filter(_("wall_ms").toString.toLong > math.max(3 * median, median + 1000))
    println(s"""{"summary":{"iters":$iters,"median_ms":$median,"p99_ms":${walls(walls.size * 99 / 100)},"max_ms":${walls.last},"n_bursts":${bursts.size}}}""")
    bursts.foreach { b =>
      println("BURST " + b.map { case (k, v) => s"$k=$v" }.mkString(" "))
    }
    spark.stop()
  }
}
