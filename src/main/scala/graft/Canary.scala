package graft

/** Fixed-work host-speed probes shared by the measurement mains
  * ([[Bench]] emits them in its JSON line; [[Scaling]] logs one per
  * target). Round 15's 1.78× host shift took a 20-minute old-binary
  * A/B to prove, and round 16's full scaling sweep inflated its tail
  * targets ~40-90% relative to fresh-JVM probes of the same binary —
  * both are the class of drift a fixed-work probe timed NEXT TO the
  * measurement makes self-evident from the artifact.
  *
  * Three probes because the observed drifts split by band: a
  * single-thread CPU loop (compute-bound queries track it), a file
  * create/rename/delete loop (the rename band — the r15 slow epoch
  * inflated rename-heavy queries 2-3× while compute stayed flat), and
  * a 256 MiB sequential write+sync+read-back (the spill band — r16's
  * drift hit the state-store/spill cluster while cpu AND fs read
  * fast-epoch). min over reps: the probe wants the host's ceiling,
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

  /** Seconds to stream a fixed 256 MiB file to disk (1 MiB chunks of
    * incompressible-ish bytes), force it to the device once, read it
    * back, and delete it — the SPILL-BANDWIDTH band. Round 16's host
    * drift inflated the state-store/spill cluster (stream_cc 2.7×,
    * stream_count 2.5×, …) while BOTH existing probes read fast-epoch:
    * a sort spill or state-store checkpoint is a few hundred MB of
    * sequential write+read-back, a band neither a CPU loop nor a
    * 200-cycle rename loop touches. Fixed work (~0.5-1 s on a healthy
    * disk), so epoch comparison is a straight ratio like the others.
    */
  def spillSec(dir: java.io.File): Double = {
    dir.mkdirs()
    val f = new java.io.File(dir, "spill.probe")
    val MiB = 1 << 20
    val buf = java.nio.ByteBuffer.allocateDirect(MiB)
    var j = 0
    var x = 0x243F6A8885A308D3L // fill once: compressing FS can't cheat
    while (j < MiB - 7) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      buf.putLong(j, x); j += 8
    }
    val t0 = System.nanoTime()
    val ch = java.nio.channels.FileChannel.open(f.toPath,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE,
      java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
    var i = 0
    while (i < 256) {
      buf.putLong(0, i.toLong) // vary chunks so dedup can't cheat either
      buf.rewind()
      while (buf.hasRemaining) ch.write(buf)
      i += 1
    }
    ch.force(false) // one device sync: the write must leave page cache
    ch.close()
    val rch = java.nio.channels.FileChannel.open(f.toPath,
      java.nio.file.StandardOpenOption.READ)
    buf.clear()
    while (rch.read(buf) > 0) buf.clear()
    rch.close()
    f.delete()
    (System.nanoTime() - t0) / 1e9
  }

  /** (cpu, fs, spill) as min over `reps`; (-1, -1, -1) if probing itself
    * fails — a canary failure must never abort the measurement run it
    * guards.
    */
  def probe(scratch: java.io.File, reps: Int = 3): (Double, Double, Double) =
    try ((1 to reps).map(_ => cpuSec()).min,
      (1 to reps).map(_ => fsSec(scratch)).min,
      (1 to reps).map(_ => spillSec(scratch)).min)
    catch { case e: Throwable =>
      System.err.println(s"[canary] probe failed: $e"); (-1.0, -1.0, -1.0)
    }
}
