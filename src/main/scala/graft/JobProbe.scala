package graft
import org.apache.spark.scheduler._
object JobProbe {
  def main(args: Array[String]): Unit = {
    val q = args.headOption.getOrElse("index_rebuild_catchup")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.base(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.env.get("GRAFT_CONF").foreach(_.split(",").filter(_.contains("=")).foreach { kv =>
      val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
    })
    val fn = SparkEntry.queries(q)
    fn(spark, sfDir).count() // warm rep
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = j.stageInfos.lastOption.map(_.name).getOrElse("?")
        val dets = j.stageInfos.lastOption.map(_.details.linesIterator.filter(_.contains("graft")).take(2).mkString(" | ")).getOrElse("")
        jobs.add(f"${j.stageInfos.map(_.numTasks).sum}%4d tasks  $site%-40s $dets")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    var wall = 0.0
    (1 to sys.env.get("GRAFT_PROBE_REPS").map(_.toInt).getOrElse(1)).foreach { r =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      wall = (System.nanoTime() - t0) / 1e9
      println(f"[probe] rep $r wall=$wall%.2f s")
    }
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(500)
    println(f"[probe] $q warm wall=$wall%.2f s jobs=${jobs.size}")
    val it = jobs.iterator(); var i = 0
    while (it.hasNext) { println(f"[probe] job $i%3d ${it.next()}"); i += 1 }
    spark.stop()
  }
}
