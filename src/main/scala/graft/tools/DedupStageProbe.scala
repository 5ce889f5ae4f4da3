package graft.tools

import graft.ops.NearDup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage breakdown for q62 (verified pairs → CC → keeper): times the pair
  * chain, connected components over a pre-built pair table, and the full
  * resolve, so optimization effort lands where the seconds are.
  * Usage: runMain graft.tools.DedupStageProbe [sfDir] [repeats]
  */
object DedupStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val repeats = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(sc.stageInfo.numTasks)
        taskMs.addAndGet(sc.stageInfo.taskMetrics.executorRunTime)
      }
    })
    def time(name: String)(f: => Long): Unit = {
      f // warm
      val ts = (1 to repeats).map { _ =>
        stages.set(0); tasks.set(0); taskMs.set(0)
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n, stages.get, tasks.get, taskMs.get)
      }
      val best = ts.minBy(_._1)
      println(f"$name%-24s min=${best._1}%7.3f s  rows=${best._2}  stages=${best._3} tasks=${best._4} taskMs=${best._5}  all=${ts.map(t => f"${t._1}%.3f").mkString(",")}")
    }

    time("shingleRows_ckpt") {
      docs.select(col("doc_id"), graft.ops.TextOps.tokens(col("text")).as("toks"))
        .select(col("doc_id"), explode(array_distinct(NearDup.shingleArr(col("toks")))).as("shingle"))
        .localCheckpoint().count()
    }
    val ds = docs.select(col("doc_id"), graft.ops.TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(array_distinct(NearDup.shingleArr(col("toks")))).as("shingle"))
      .localCheckpoint()
    time("wideMinhash_agg") {
      val aggs = count(lit(1)).as("n") +:
        (0 until 8).map(s => min(md5(concat(col("shingle"), lit(s":$s")))).as(s"m$s"))
      ds.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*).count()
    }
    time("wideMinhash_forced") {
      val aggs = count(lit(1)).as("n") +:
        (0 until 8).map(s => min(md5(concat(col("shingle"), lit(s":$s")))).as(s"m$s"))
      ds.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
        .agg(max(col("m0")), max(col("m1")), max(col("m2")), max(col("m3")),
          max(col("m4")), max(col("m5")), max(col("m6")), max(col("m7")), max(col("n"))).count()
    }
    time("twostep_forced") {
      val sigs = ds
        .select(col("doc_id"), col("shingle"), explode(sequence(lit(0L), lit(7L))).as("seed"))
        .groupBy(col("doc_id"), col("seed"))
        .agg(min(md5(concat(col("shingle"), lit(":"), col("seed").cast("string")))).as("minhash"),
          count(lit(1)).as("n"))
      val waggs = max(col("n")).as("n") +:
        (0 until 8).map(s => min(when(col("seed") === s, col("minhash"))).as(s"m$s"))
      val wide = sigs.groupBy(col("doc_id")).agg(waggs.head, waggs.tail: _*)
      wide.agg(max(col("m0")), max(col("m1")), max(col("m2")), max(col("m3")),
        max(col("m4")), max(col("m5")), max(col("m6")), max(col("m7")), max(col("n"))).count()
    }
    locally {
      def wideOf(d: org.apache.spark.sql.DataFrame) = {
        val aggs = count(lit(1)).as("n") +:
          (0 until 8).map(s => min(md5(concat(col("shingle"), lit(s":$s")))).as(s"m$s"))
        d.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      }
      def bandsOf(w: org.apache.spark.sql.DataFrame) = {
        val bandStructs = (0 until 2).map { b =>
          val ms = (b * 4 until (b + 1) * 4).map(s => col(s"m$s"))
          struct(lit(b.toLong).as("band"), md5(concat_ws(",", ms: _*)).as("band_sig"))
        }
        w.select(col("doc_id"), col("n"), explode(array(bandStructs: _*)).as("bk"))
          .select(col("doc_id"), col("n"), col("bk.band").as("band"), col("bk.band_sig").as("band_sig"))
      }
      time("A_bands_terminal") { bandsOf(wideOf(ds)).agg(max(col("band_sig"))).count() }
      time("C_ckpt_selfjoin") {
        val bands = bandsOf(wideOf(ds)).localCheckpoint()
        bands.select(col("doc_id").as("d1"), col("n").as("n1"), col("band"), col("band_sig"))
          .join(bands.select(col("doc_id").as("d2"), col("n").as("n2"), col("band"), col("band_sig")),
            Seq("band", "band_sig"))
          .where(col("d1") < col("d2"))
          .select("d1", "d2", "n1", "n2").distinct().count()
      }
      time("B_bucketcollect") {
        bandsOf(wideOf(ds)).groupBy(col("band"), col("band_sig"))
          .agg(sort_array(collect_list(struct(col("doc_id"), col("n")))).as("ms"))
          .where(size(col("ms")) > 1).agg(count(lit(1))).count()
      }
    }
    time("candidates") { NearDup.lshCandidatePairs(docs, 8, 4).count() }
    time("lshVerifiedPairs") { NearDup.lshVerifiedPairs(docs, 0.8).count() }
    val pairs = NearDup.lshVerifiedPairs(docs, 0.8).localCheckpoint()
    time("cc(pairs)") {
      graft.canon.Canonicalize.connectedComponents(spark,
        pairs.select(col("d1").cast("string").as("src"), col("d2").cast("string").as("dst"))).count()
    }
    time("resolve(pairs)") { NearDup.resolveClusters(spark, docs, pairs).count() }
    time("q62_full") {
      NearDup.resolveClusters(spark, docs, NearDup.lshVerifiedPairs(docs, 0.8)).count()
    }
    spark.stop()
  }
}
