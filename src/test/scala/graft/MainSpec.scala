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

  test("--config loads the reference's YAML layout; flags override it") {
    val f = java.nio.file.Files.createTempFile("graft_cfg", ".yaml")
    java.nio.file.Files.writeString(f,
      """network:
        |  name: polygon
        |  chain_id: 137
        |kafka:
        |  bootstrap_servers: "broker:9092"
        |pipeline:
        |  messages: 32
        |  dry_run: true
        |""".stripMargin)
    val cfg = Main.parseArgs(Seq("--config", f.toString))
    assert(cfg.network == "polygon" && cfg.chainId == 137)
    assert(cfg.kafka == "broker:9092")
    assert(cfg.messages == 32 && cfg.dryRun)
    assert(cfg.startBlock.isEmpty) // absent key keeps its default
    // an explicit flag beats the file, wherever --config sits in the args
    val over = Main.parseArgs(
      Seq("--messages", "64", "--config", f.toString, "--network", "base"))
    assert(over.messages == 64 && over.network == "base" && over.chainId == 137)
    intercept[IllegalArgumentException](Main.parseArgs(Seq("--config")))
  }

  test("mistyped YAML values fail loudly, naming the key") {
    // Jackson's asInt/asBoolean would silently coerce these to 0 / false;
    // the loader must reject them like the CLI flag path rejects bad input
    def cfgWith(body: String): String = {
      val f = java.nio.file.Files.createTempFile("graft_badcfg", ".yaml")
      java.nio.file.Files.writeString(f, body)
      f.toString
    }
    val badInt = intercept[IllegalArgumentException](Main.parseArgs(Seq(
      "--config", cfgWith("network:\n  chain_id: \"abc\"\n"))))
    assert(badInt.getMessage.contains("network.chain_id"))
    val badBool = intercept[IllegalArgumentException](Main.parseArgs(Seq(
      "--config", cfgWith("pipeline:\n  dry_run: \"yes\"\n"))))
    assert(badBool.getMessage.contains("pipeline.dry_run"))
    val badStr = intercept[IllegalArgumentException](Main.parseArgs(Seq(
      "--config", cfgWith("network:\n  name: 42\n"))))
    assert(badStr.getMessage.contains("network.name"))
    // a float where an integer is expected is also a type error
    val badFloat = intercept[IllegalArgumentException](Main.parseArgs(Seq(
      "--config", cfgWith("pipeline:\n  messages: 3.5\n"))))
    assert(badFloat.getMessage.contains("pipeline.messages"))
  }

  test("dry-run validation passes on the canonical components") {
    assert(Main.dryRunChecks(spark) == Nil)
  }

  test("dry-run catches broken SQL") {
    import graft.sql.CanonicalQueries
    assert(CanonicalQueries.validateSql(spark, "SELEC broken FROM").nonEmpty)
  }
}
