package graft.cc

import graft.SparkSpec

/** Pins the giant-run preset to the probe-measured values (VERDICT r11
  * #1). `CCScaleProbe` consumes [[Tuning.recommended]] verbatim via
  * `ConnectedComponents.configureForScale`, so this spec is what keeps
  * "what the probes measured" and "what a library user gets" from
  * drifting apart — an edit to either side fails here until the
  * measurement story is updated with it.
  */
class TuningSpec extends SparkSpec {

  test("the preset carries exactly the probe-measured giant-run settings") {
    assert(Tuning.recommended === Map(
      "spark.rdd.compress" -> "true",
      "spark.io.compression.codec" -> "zstd",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16777216",
      "spark.cleaner.periodicGC.interval" -> "60s"))
  }

  test("the advisory size is the raw per-task target over the observed " +
       "compression ratio (the AQE-coalescing x codec interplay)") {
    // 160 MB raw rows per coalesced task / 10x converged-round zstd
    // ratio = 16m compressed advisory — the value that stopped the
    // 1 GB/core sort OOM on the giant contracted label join
    assert(Tuning.advisoryPartitionBytes() === 16L << 20)
    assert(Tuning.advisoryPartitionBytes() ===
      Tuning.TargetRawBytesPerTask / Tuning.ConvergedRoundCompressionRatio)
    // ratio 1 (no compression) degenerates to the raw target itself
    assert(Tuning.advisoryPartitionBytes(1L) === Tuning.TargetRawBytesPerTask)
    intercept[IllegalArgumentException](Tuning.advisoryPartitionBytes(0L))
  }

  test("missingScaleConfs names exactly the preset keys the session " +
       "lacks (the runAuto giant-input hint's decision logic)") {
    // the shared test session carries none of the preset
    assert(ConnectedComponents.missingScaleConfs(spark) ===
      Tuning.recommended.keys.toSeq.sorted)
    // a session-settable entry, once set to the preset value, drops off
    val k = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    spark.conf.set(k, Tuning.recommended(k))
    try assert(!ConnectedComponents.missingScaleConfs(spark).contains(k))
    finally spark.conf.unset(k)
    // ...and a DIFFERENT value still counts as missing
    spark.conf.set(k, "123456")
    try assert(ConnectedComponents.missingScaleConfs(spark).contains(k))
    finally spark.conf.unset(k)
  }
}
