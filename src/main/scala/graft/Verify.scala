package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Per-table fixture canary first: a broken loader names its table in
    // the artifact instead of zeroing the round (r8 postmortem).
    graft.model.Fixtures.canary(spark, sfDir, "verify")
    // Measurement hermeticity: a prior JVM killed between publishing a
    // segment root and retiring it leaves a live persisted registration
    // (durability working as designed for a SERVING tier) — but a
    // measurement JVM must reflect only its own round's work, or the
    // dead run's segments contaminate every ANN plan and gauge here.
    // Start from the base view; restart durability stays spec-locked.
    graft.operators.SimilarityOps.dropIndexSegments(sfDir)
    graft.operators.DedupOps.dropClusterDeltas(sfDir)
    // Same hermeticity for the DURABLE staged indexes (r15): appends a
    // dead prior JVM admitted survive in the shared dirs by design — a
    // measurement JVM must serve the corpus-only base, so any index
    // carrying appends re-stages (threshold 0.0 trips exactly when the
    // persisted append counter is non-zero; a clean index is a no-op).
    try {
      graft.operators.DedupOps.maybeRestageTextIndexes(spark, sfDir, 0.0)
      graft.operators.DedupOps.MediaModalities.foreach(m =>
        graft.operators.DedupOps.maybeRestageMediaIndex(spark, sfDir, 0.0, m))
      graft.operators.SimilarityOps.maybeRetrainStagedIndex(spark, sfDir, 0.0)
      ()
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[verify] staged-index hermetic reset failed: ${e.getMessage}")
    }
    // The stream-STATE keys carry batch-equivalent oracles that are exact
    // ONLY while the staged input is a single file (one AvailableNow
    // micro-batch). A broken premise (or a loader failure inside the
    // check, as in r8) must fail exactly those keys loudly — never any
    // other key's signal (stream_dlq_split/stream_enrich/stream_ann's
    // oracles hold under any batch split), and never subtly at the hash
    // compare: on check failure the premise-dependent dumps are withheld
    // so the driver records them red by absence.
    val premiseKeys = graft.streaming.StreamOps.oneBatchPremiseKeys
    val streamPremiseOk =
      if (!SparkEntry.queries.keys.exists(premiseKeys)) true
      else try { graft.streaming.StreamOps.assertOneBatchPremise(spark, sfDir); true }
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println("[verify] stream one-batch premise check failed " +
          s"(${premiseKeys.toSeq.sorted.mkString(", ")} withheld): ${e.getMessage}")
        false
      }
    // Per-key PREMISE checks beyond the one-batch staging premise: keys
    // whose oracle equality holds only under an assertable data property
    // fail LOUD here (withheld → driver records them red) instead of
    // subtly at the hash compare. stream_lsh/stream_img: the staged
    // probe index caps base bucket members ALONE while the shared batch
    // oracle ranks new+base interleaved — equal only when no bucket
    // overflows (ADVICE r13).
    val capPremise: Map[String, () => Unit] = Map(
      "stream_lsh" ->
        (() => graft.operators.DedupOps.assertTextProbeCapPremise(spark, sfDir)),
      "stream_img" ->
        (() => graft.operators.DedupOps.assertMediaProbeCapPremise(spark, sfDir)),
      "stream_wav" ->
        (() => graft.operators.DedupOps.assertMediaProbeCapPremise(spark, sfDir,
          graft.operators.DedupOps.AudioModality)),
      "stream_gif" ->
        (() => graft.operators.DedupOps.assertMediaProbeCapPremise(spark, sfDir,
          graft.operators.DedupOps.VideoModality)))
    // (stream_xm needs NO cap premise: its edge topic ranks interleaved
    // exactly as its oracle does — see stagedIncrementCrossEdges)
    SparkEntry.queries.foreach { case (name, fn) =>
      if (premiseKeys(name) && !streamPremiseOk)
        System.err.println(s"[verify] $name withheld: one-batch premise check failed")
      else {
        val premiseErr = capPremise.get(name).flatMap { chk =>
          try { chk(); None }
          catch { case scala.util.control.NonFatal(e) => Some(e) }
        }
        premiseErr match {
          case Some(e) =>
            System.err.println(s"[verify] $name withheld: ${e.getMessage}")
          case None =>
            try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            catch { case e: Throwable =>
              System.err.println(s"[verify] $name failed: ${e.getMessage}")
            }
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // ANN serving-quality gauges (recall@10 of the iterated-Lloyd IVF
    // probe / IVF+PQ ADC vs the exact top-k, plus the 1-step-seed
    // baseline): bounded driver-artifact comparisons, recorded so index
    // QUALITY is a round artifact alongside hash correctness.
    try graft.operators.SimilarityOps.recordIvfRecall(spark, sfDir)
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[verify] recall gauges failed: ${e.getMessage}")
    }
    // Text-index staleness: 0.0 under pure serving (no appends ran in
    // this JVM) — recorded so the maintenance gauge is a round artifact
    // and a future append leaking into the serving path is visible.
    try graft.ObservedMetrics.recordGauge("text.index_stale_fraction",
      graft.operators.DedupOps.textIndexStaleFraction(spark, sfDir))
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[verify] text stale gauge failed: ${e.getMessage}")
    }
    // Media-fingerprint staleness: the same maintenance gauge for the
    // dedup gate's media side (0.0 under pure serving), one per
    // modality — an append leaking into ANY modality's serving path
    // must be visible, not just the image one's.
    try graft.operators.DedupOps.MediaModalities.foreach { m =>
      graft.ObservedMetrics.recordGauge(
        graft.operators.DedupOps.mediaStaleGauge(m),
        graft.operators.DedupOps.mediaIndexStaleFraction(spark, sfDir, m))
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[verify] media stale gauge failed: ${e.getMessage}")
    }
    // Cluster-layer staleness: the merged-in fraction of the served
    // cross-modal assignment (deltas ÷ base + deltas, manifest
    // arithmetic) — 0.0 under pure serving, non-zero only if a delta
    // overlay registration leaked into the serving path.
    try graft.ObservedMetrics.recordGauge("xm.merged_fraction",
      graft.operators.DedupOps.xmMergedFraction(spark, sfDir))
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[verify] xm merged gauge failed: ${e.getMessage}")
    }
    // Retry observability (r13 verdict #6): a round whose ledger
    // publishes silently limped through on transient-failure retries is
    // visible in the artifact — backoffs > 0 means some operation
    // actually failed and was re-run under MsgLogRetry.
    graft.ObservedMetrics.recordGauge("msglog.retry_attempts",
      graft.sources.MsgLogRetry.attempts.get().toDouble)
    graft.ObservedMetrics.recordGauge("msglog.retry_backoffs",
      graft.sources.MsgLogRetry.backoffs.get().toDouble)
    // Bucket-cap overflow observations from the dedup/ANN generators:
    // 0 on the fixtures; a non-zero value here means a capped bucket
    // TRUNCATED candidates on this input — visible in round artifacts
    // instead of only inside CapSpec.
    val observed = ObservedMetrics.awaitQuiescent()
    val metricLines =
      observed.toSeq.sortBy(_._1).map { case (k, v) => s"${q(k)}: $v" } ++
      ObservedMetrics.gaugeSnapshot.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${q(k)}: $v" }
    Files.writeString(Paths.get(s"$outDir/observed_metrics.json"),
      metricLines.mkString("{", ",", "}"))
    spark.stop()
  }
}
