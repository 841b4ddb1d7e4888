package graft.tools

/** Shared /proc readers + env-flag convention for the measurement tools
  * (Bench, Debug, ScaleBench) — one parser instead of three verbatim
  * copies (r11 ADVICE).
  */
object Proc {
  /** minflt from a /proc/<pid>/stat line. Fields are indexed AFTER the
    * last ')' (the comm field is parenthesized and may itself contain
    * spaces — man proc(5) — so a plain whitespace split misindexes every
    * later field for such a comm; fine for 'java' but fragile). After
    * ')' the tokens start at field 3 ("state"); minflt is field 10 →
    * token index 7.
    */
  private[tools] def parseMinorFaults(statLine: String): Long = {
    val rest = statLine.substring(statLine.lastIndexOf(')') + 1).trim
    rest.split("\\s+")(7).toLong
  }

  /** Cumulative minor faults of this process (/proc/self/stat minflt).
    * First-touch page faults cost ~45 µs of task CPU each on the microVM
    * bench host (FM_INFLATION_ANALYSIS.md r11 addendum): with the heap
    * pre-touched, tens of thousands per run is clean; millions means the
    * run's seconds are fault-storm contamination, not the engine's.
    * -1 when unreadable (non-Linux).
    */
  def minorFaults(): Long = try {
    val src = scala.io.Source.fromFile("/proc/self/stat")
    try parseMinorFaults(src.getLines().next()) finally src.close()
  } catch { case _: Throwable => -1L }

  /** Hypervisor steal jiffies summed over all vCPUs (/proc/stat first
    * line, field 8) — the direct attribution for slow windows on a
    * shared host. 0 when unreadable.
    */
  def stealJiffies(): Long = try {
    val src = scala.io.Source.fromFile("/proc/stat")
    try {
      val f = src.getLines().next().trim.split("\\s+").drop(1)
      if (f.length > 7) f(7).toLong else 0L
    } finally src.close()
  } catch { case _: Throwable => 0L }

  /** Cumulative CPU nanoseconds of this process (HotSpot
    * OperatingSystemMXBean). The discriminator for the zero-steal stall
    * mode this box exhibits: a query whose wall time balloons while its
    * CPU delta matches its steady-state siblings did the same work and
    * simply wasn't scheduled — cpu_delta/(wall·nCores) collapsing
    * against siblings is mechanical host-stall attribution even when
    * steal, faults, JIT, and every calib sample read clean. -1 when the
    * bean isn't a HotSpot one (non-OpenJDK JVMs).
    */
  def processCpuNanos(): Long = try {
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
      case _ => -1L
    }
  } catch { case _: Throwable => -1L }

  /** Opt-out/opt-in env flag: set-and-truthy (anything but "", "0",
    * "false"). `sys.env.contains` alone made `FLAG=0` behave as ON —
    * the r11 ADVICE footgun on SPARK_GRAFT_NO_PRETOUCH; build.sbt
    * applies the same rule to that variable.
    */
  def envFlag(name: String): Boolean =
    sys.env.get(name).exists(v => v.nonEmpty && v != "0" && v != "false")
}
