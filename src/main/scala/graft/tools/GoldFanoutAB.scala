package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Dev-only A/B for the gold fan-out's persist storage level at the
  * p07b 100x decade (VERDICT r16 optional #8; NOT part of the engine):
  * stage the composed pipeline's silver layer ONCE at 100x, then run
  * the 7-table gold fan-out under MEMORY_AND_DISK (current) /
  * DISK_ONLY / no-persist (the reference's re-scan-7x trade),
  * interleaved round-robin per rep, reporting wall, GC, and used-heap
  * delta per run. */
object GoldFanoutAB {
  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
  }
  private def heapUsed(): Long =
    java.lang.management.ManagementFactory.getMemoryMXBean.getHeapMemoryUsage.getUsed

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft_sf10x_r17")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = graft.GraftSession.local(32)
    val loadDate = "2024-01-15"
    val root = java.nio.file.Files.createTempDirectory("graft_goldab_").toString
    // stage bronze+silver once (the gold stage of this run is the warmup)
    graft.Pipeline.run(spark, root, loadDate,
      bronzeSource = Some(graft.model.CorpusAdapter.bronzeShipments(spark, dir)))
    val silverDir = s"$root/silver/shipments"

    def goldOnce(level: Option[StorageLevel], outRoot: String): Unit = {
      val base = spark.read.parquet(silverDir).where(s"load_date = '$loadDate'")
      val silverBack = level match {
        case Some(l) => base.persist(l)
        case None => base
      }
      try {
        val tables: Seq[(String, DataFrame)] = Seq(
          "dim_courier" -> graft.gold.StarSchema.dimCourier(silverBack),
          "dim_location" -> graft.gold.StarSchema.dimLocation(silverBack),
          "dim_date" -> graft.gold.StarSchema.dimDate(silverBack),
          "dim_shipment_status" -> graft.gold.StarSchema.dimStatus(silverBack),
          "fact_shipment" -> graft.gold.StarSchema.factShipment(silverBack),
          "fact_tracking_event" -> graft.gold.StarSchema.factTrackingEvent(silverBack),
          "fact_courier_metrics" -> graft.gold.StarSchema.courierMetrics(silverBack))
        tables.foreach { case (name, df) =>
          graft.io.VersionedTable.write(spark, s"$outRoot/$name", df)
        }
      } finally if (level.nonEmpty) { silverBack.unpersist(); () }
    }

    val variants = Seq(
      "MEMORY_AND_DISK" -> Some(StorageLevel.MEMORY_AND_DISK),
      "DISK_ONLY" -> Some(StorageLevel.DISK_ONLY),
      "NO_PERSIST_7x_RESCAN" -> None)
    for (rep <- 1 to reps; (label, level) <- variants) {
      val out = java.nio.file.Files.createTempDirectory("graft_goldab_out_").toString
      val gc0 = gcMillis(); val h0 = heapUsed(); val t0 = System.nanoTime()
      goldOnce(level, out)
      println(f"[goldab] $label rep$rep: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"gc=${(gcMillis() - gc0) / 1e3}%.2f s heapDelta=${(heapUsed() - h0) / (1 << 20)}%d MB")
    }
    spark.stop()
  }
}
