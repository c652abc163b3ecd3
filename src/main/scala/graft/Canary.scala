package graft

/** Fixed-work host-speed probes shared by the measurement mains
  * ([[Bench]] emits them in its JSON line; [[Scaling]] logs one per
  * target). Round 15's 1.78× host shift took a 20-minute old-binary
  * A/B to prove, and round 16's full scaling sweep inflated its tail
  * targets ~40-90% relative to fresh-JVM probes of the same binary —
  * both are the class of drift a fixed-work probe timed NEXT TO the
  * measurement makes self-evident from the artifact.
  *
  * Two probes because the observed drifts split by band: a
  * single-thread CPU loop (compute-bound queries track it) and a
  * file create/rename/delete loop (the state-store/rename band — the
  * r15 slow epoch inflated rename-heavy queries 2-3× while compute
  * stayed flat). min over reps: the probe wants the host's ceiling,
  * not a GC blip.
  */
object Canary {

  /** Seconds for a fixed 2e8-step xorshift loop, single thread. */
  def cpuSec(): Double = {
    val t0 = System.nanoTime()
    var x = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < 200000000) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
    if (x == 42L) System.err.println("canary") // keep the loop live
    (System.nanoTime() - t0) / 1e9
  }

  /** Seconds for 200 create/rename/delete cycles under `dir`. */
  def fsSec(dir: java.io.File): Double = {
    dir.mkdirs()
    val t0 = System.nanoTime()
    var i = 0
    while (i < 200) {
      val f = new java.io.File(dir, s"c$i")
      val g = new java.io.File(dir, s"c${i}r")
      val w = new java.io.FileWriter(f)
      w.write("x"); w.close()
      f.renameTo(g); g.delete()
      i += 1
    }
    (System.nanoTime() - t0) / 1e9
  }

  /** (cpu, fs) as min over `reps`; (-1, -1) if probing itself fails —
    * a canary failure must never abort the measurement run it guards.
    */
  def probe(scratch: java.io.File, reps: Int = 3): (Double, Double) =
    try ((1 to reps).map(_ => cpuSec()).min,
      (1 to reps).map(_ => fsSec(scratch)).min)
    catch { case e: Throwable =>
      System.err.println(s"[canary] probe failed: $e"); (-1.0, -1.0)
    }
}
