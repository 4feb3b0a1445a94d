package graft

/** CLI entry-point smoke tests (the `main` itself is exercised manually via
  * `runMain graft.Main --dry-run`; these cover the arg grammar and the
  * dry-run validation surface without booting a second session). */
class MainSpec extends SparkSpec {

  test("arg parsing mirrors run_pipeline.py's grammar") {
    val cfg = Main.parseArgs(Seq("--network", "polygon", "--chain-id", "137",
      "--start-block", "50000000", "--messages", "64", "--dry-run"))
    assert(cfg.network == "polygon")
    assert(cfg.chainId == 137)
    assert(cfg.startBlock.contains(50000000L))
    assert(cfg.messages == 64)
    assert(cfg.dryRun)
    intercept[IllegalArgumentException](Main.parseArgs(Seq("--bogus")))
  }

  test("dry-run validation passes on the canonical components") {
    assert(Main.dryRunChecks(spark) == Nil)
  }

  test("dry-run catches broken SQL") {
    import graft.sql.CanonicalQueries
    assert(CanonicalQueries.validateSql(spark, "SELEC broken FROM").nonEmpty)
  }
}
