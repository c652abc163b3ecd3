package graft

/** Fixed-work host-speed probes shared by the measurement mains
  * ([[Bench]] emits them in its JSON line; [[Scaling]] logs one per
  * target). Round 15's 1.78× host shift took a 20-minute old-binary
  * A/B to prove, and round 16's full scaling sweep inflated its tail
  * targets ~40-90% relative to fresh-JVM probes of the same binary —
  * both are the class of drift a fixed-work probe timed NEXT TO the
  * measurement makes self-evident from the artifact.
  *
  * Four probes because the observed drifts split by band: a
  * single-thread CPU loop (compute-bound queries track it), a file
  * create/rename/delete loop (the rename band — the r15 slow epoch
  * inflated rename-heavy queries 2-3× while compute stayed flat), a
  * 256 MiB sequential write+sync+read-back (the spill band — r16's
  * drift hit the state-store/spill cluster while cpu AND fs read
  * fast-epoch), and a concurrent small-file fsync storm (the STATE
  * band — r17's episodic sub-hour windows hit the stream/state
  * cluster 3-5× while all three earlier probes read fast). min over
  * reps: the probe wants the host's ceiling, not a GC blip.
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
    *
    * What the two timed halves actually measure (r17 ADVICE): the
    * write half is write+sync bandwidth to the device; the READ-BACK
    * half is served from the page cache — force(false) syncs pages to
    * the device but does not evict them — so it prices memory-copy
    * bandwidth plus any cache-pressure eviction, NOT device read. A
    * true device-read probe would need O_DIRECT or a drop_caches both
    * unavailable to an unprivileged JVM; the page-cache read is kept
    * because a host epoch that squeezes the cache (the thing a noisy
    * neighbor does) shows up in exactly that half.
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
      // perturb one long per 4 KiB block with a fresh xorshift value so
      // EVERY filesystem block across the whole file is distinct — the
      // pre-r18 single putLong(0, i) varied only each chunk's first
      // block, letting block-aligned dedup collapse the other 255/256
      var b = 0
      while (b < MiB) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        buf.putLong(b, x); b += 4096
      }
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

  /** Seconds for a state-store-shaped COMMIT STORM: `threads` writers
    * concurrently cycling `files` small delta files each — write ~64 KiB,
    * `force(true)` (data+metadata to the device), rename tmp→delta — the
    * I/O shape of one Structured Streaming micro-batch commit
    * (HDFSBackedStateStore writes one fsync'd delta file per partition
    * per stateful operator, 32+ in flight on local[32]).
    *
    * WHY A FOURTH BAND (r17 verdict top item): three rounds running, the
    * host's episodic sub-hour slow windows inflated the stream/state
    * query cluster 3-5× while cpu, fs AND spill all read fast-epoch —
    * bench_out/r17_ab_* hold the binary-uncorrelated proof. None of the
    * three probes issues what that cluster issues: fsSec never syncs
    * (page-cache renames), spillSec syncs ONE big sequential file once.
    * Concurrent small-file fsync latency is the untested band — on a
    * shared host it is the first thing a noisy neighbor's journal/flush
    * pressure degrades, and it is invisible to sequential-bandwidth and
    * CPU probes by construction. Fixed work, so epoch comparison is a
    * straight ratio like the others.
    */
  def stateSec(dir: java.io.File, threads: Int = 8, files: Int = 24): Double = {
    dir.mkdirs()
    val payload = new Array[Byte](64 * 1024)
    var x = 0x9E3779B97F4A7C15L
    var j = 0
    while (j < payload.length - 7) { // incompressible, blocks distinct
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      var k = 0
      while (k < 8) { payload(j + k) = (x >>> (8 * k)).toByte; k += 1 }
      j += 8
    }
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { t =>
      new Thread(() => {
        var i = 0
        while (i < files) {
          val tmp = new java.io.File(dir, s"s$t-$i.tmp")
          val fin = new java.io.File(dir, s"s$t-$i.delta")
          val ch = java.nio.channels.FileChannel.open(tmp.toPath,
            java.nio.file.StandardOpenOption.CREATE,
            java.nio.file.StandardOpenOption.WRITE,
            java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
          ch.write(java.nio.ByteBuffer.wrap(payload))
          ch.force(true) // the band under test: small-file fsync
          ch.close()
          tmp.renameTo(fin)
          i += 1
        }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    val sec = (System.nanoTime() - t0) / 1e9
    // cleanup outside the timing: deletes are not part of the commit shape
    (0 until threads).foreach { t =>
      (0 until files).foreach { i =>
        new java.io.File(dir, s"s$t-$i.delta").delete()
        new java.io.File(dir, s"s$t-$i.tmp").delete()
      }
    }
    sec
  }

  /** A LIGHT state-band pulse (4 writers × 4 files = 16 fsyncs,
    * ~30 ms healthy) — cheap enough to run between every benchmark
    * query, which is the whole point: the r17 band is EPISODIC
    * (sub-hour), so a start-of-run probe brackets nothing; a pulse
    * timed next to each query attributes an inflated reading inline.
    * A slow-window fsync (10-50 ms each vs ~1 ms healthy) still
    * inflates 16 of them 5-20× — the signal is a ratio, not an
    * absolute. Swallows its own failures for the same reason [[probe]]
    * does.
    */
  def statePulse(scratch: java.io.File): Double =
    try stateSec(scratch, threads = 4, files = 4)
    catch { case e: Throwable =>
      System.err.println(s"[canary] state pulse failed: $e"); -1.0
    }

  /** Cumulative I/O counters summed over PHYSICAL block devices (whole
    * sd/vd/nvme devices, not partitions or loops), read from
    * /proc/diskstats. The r18 slow-window live probe showed why probes
    * alone can't attribute the episodic band: an fsync/spill probe
    * timed BEFORE a query (after the inter-query GC pause) reads fast
    * because write-back pressure has drained, while the same probe
    * immediately after a write-heavy phase reads 5-6× slow — the band
    * is device write contention DURING the work, not a standing host
    * state a probe can sample on its own schedule. Deltas of these
    * counters around each measured query attribute the contention
    * inline: disk busy fraction, mean write await, mean flush (fsync)
    * await over exactly the query's wall window.
    */
  final case class DiskStat(ioMs: Long, writeMs: Long, writes: Long,
      flushMs: Long, flushes: Long) {
    def -(o: DiskStat): DiskStat = DiskStat(ioMs - o.ioMs,
      writeMs - o.writeMs, writes - o.writes,
      flushMs - o.flushMs, flushes - o.flushes)
  }

  /** None when /proc/diskstats is unavailable (non-Linux) or holds no
    * recognizable physical device — callers skip disk attribution.
    */
  def diskSnapshot(): Option[DiskStat] =
    try {
      val dev = "^(sd[a-z]+|vd[a-z]+|nvme\\d+n\\d+)$".r
      val rows = scala.io.Source.fromFile("/proc/diskstats").getLines()
        .map(_.trim.split("\\s+"))
        .filter(f => f.length >= 20 && dev.matches(f(2)))
        .map { f =>
          // kernel >= 5.5 layout: f(7) writes, f(10) write-ms,
          // f(12) io-busy-ms, f(18) flushes, f(19) flush-ms
          DiskStat(ioMs = f(12).toLong, writeMs = f(10).toLong,
            writes = f(7).toLong, flushMs = f(19).toLong,
            flushes = f(18).toLong)
        }.toSeq
      if (rows.isEmpty) None
      else Some(rows.reduce((a, b) => DiskStat(a.ioMs + b.ioMs,
        a.writeMs + b.writeMs, a.writes + b.writes,
        a.flushMs + b.flushMs, a.flushes + b.flushes)))
    } catch { case _: Throwable => None }

  /** (cpu, fs, spill, state) as min over `reps`; all -1 if probing
    * itself fails — a canary failure must never abort the measurement
    * run it guards.
    */
  def probe(scratch: java.io.File,
      reps: Int = 3): (Double, Double, Double, Double) =
    try ((1 to reps).map(_ => cpuSec()).min,
      (1 to reps).map(_ => fsSec(scratch)).min,
      (1 to reps).map(_ => spillSec(scratch)).min,
      (1 to reps).map(_ => stateSec(scratch)).min)
    catch { case e: Throwable =>
      System.err.println(s"[canary] probe failed: $e")
      (-1.0, -1.0, -1.0, -1.0)
    }
}
