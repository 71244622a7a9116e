package graft.cli

import graft.model.{ChronoUnitSlice, Gzip, PeriodFromFirst}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.time.temporal.ChronoUnit

/** HOCON config-file surface of the CLI: the parser over the
  * reference's reference.conf idioms, env-var layering, and the
  * flag > env > file precedence in the resolution helpers.
  */
class CliConfigSpec extends AnyFunSuite {

  // the reference's own key shapes (core-backup reference.conf:37-49,
  // core-restore reference.conf:11-14, core reference.conf), with the
  // env-override lines PureConfig users rely on
  private val conf =
    """backup {
      |    kafka-group-id = graft-group      # trailing comment
      |    time-configuration = {
      |       type = chrono-unit-slice
      |       type = ${?BACKUP_TIME_CONFIGURATION_TYPE}
      |       chrono-unit = minutes
      |       chrono-unit = ${?BACKUP_TIME_CONFIGURATION_CHRONO_UNIT}
      |       duration = 1 hour
      |       duration = ${?BACKUP_TIME_CONFIGURATION_DURATION}
      |    }
      |    compression {
      |       type = gzip
      |       level = 6
      |    }
      |}
      |kafka-cluster = {
      |    topics = ["events", "orders"]
      |    topics = ${?KAFKA_CLUSTER_TOPICS}
      |}
      |restore {
      |    from-when = "2024-01-01T00:00:00Z"
      |    override-topics {
      |       events = events-replayed
      |    }
      |}
      |""".stripMargin

  test("parses reference.conf shapes to flat dotted keys") {
    val cfg = HoconConfig.parse(conf, env = Map.empty)
    assert(cfg("backup.kafka-group-id") == "graft-group")
    assert(cfg("backup.time-configuration.type") == "chrono-unit-slice")
    assert(cfg("backup.time-configuration.chrono-unit") == "minutes")
    assert(cfg("backup.time-configuration.duration") == "1 hour")
    assert(cfg("backup.compression.type") == "gzip")
    assert(cfg("kafka-cluster.topics") == "events,orders")
    assert(cfg("restore.from-when") == "2024-01-01T00:00:00Z")
    assert(HoconConfig.subKeys(cfg, "restore.override-topics") ==
      Map("events" -> "events-replayed"))
  }

  test("inline single-line objects parse like the multi-line form") {
    // caught live: `compression { type = gzip }` on one line was
    // silently misparsed before brace normalization
    val cfg = HoconConfig.parse(
      "backup { compression { type = gzip, level = 9 } }", env = Map.empty)
    assert(cfg("backup.compression.type") == "gzip")
    assert(cfg("backup.compression.level") == "9")
    assert(HoconConfig.parse("a { b = [1, 2], c = ${?NOPE} }", env = Map.empty) ==
      Map("a.b" -> "1,2"))
  }

  test("`${?ENV}` lines override file defaults only when the var is set") {
    val cfg = HoconConfig.parse(conf,
      env = Map(
        "BACKUP_TIME_CONFIGURATION_CHRONO_UNIT" -> "seconds",
        "KAFKA_CLUSTER_TOPICS" -> "only-this"))
    assert(cfg("backup.time-configuration.chrono-unit") == "seconds")
    assert(cfg("kafka-cluster.topics") == "only-this")
    // unset vars keep the preceding default
    assert(cfg("backup.time-configuration.type") == "chrono-unit-slice")
  }

  test("config file drives time configuration and compression end-to-end") {
    val f = Files.createTempFile("graft-cli", ".conf")
    Files.write(f, conf.getBytes(StandardCharsets.UTF_8))
    try {
      val cfg = HoconConfig.parseFile(f.toString, env = Map.empty)
      assert(Main.timeConfiguration(Map.empty, cfg, env = Map.empty) == ChronoUnitSlice(ChronoUnit.MINUTES))
      assert(Main.compressionOf(Map.empty, cfg) == (Some(Gzip), Some(6)))
      assert(Main.overrideTopics(Map.empty, cfg, env = Map.empty) == Map("events" -> "events-replayed"))
    } finally Files.delete(f)
  }

  test("explicit flags outrank the config file") {
    val cfg = HoconConfig.parse(conf, env = Map.empty)
    assert(Main.timeConfiguration(Map("slice" -> "days"), cfg, env = Map.empty) ==
      ChronoUnitSlice(ChronoUnit.DAYS))
    // a period flag flips the discriminator even though the file says
    // chrono-unit-slice (flag implies type, the reference CLI contract)
    assert(Main.timeConfiguration(Map("period-from-first" -> "60000"), cfg, env = Map.empty) ==
      PeriodFromFirst(60000L))
    assert(Main.overrideTopics(Map("override-topics" -> "a:b"), cfg, env = Map.empty) == Map("a" -> "b"))
  }

  test("S3 headers/connection config maps to s3a options with reference validation") {
    val cfg = HoconConfig.parse(
      """s3-headers = {
        |    canned-acl = bucket-owner-full-control
        |    storage-class = STANDARD_IA
        |    server-side-encryption = { type = kms, key-id = "arn:aws:kms:k1" }
        |    meta-headers { pipeline = graft }
        |    custom-headers { Cache-Control = no-store }
        |}
        |pekko.connectors.s3 {
        |    endpoint-url = "https://minio.local:9000"
        |    path-style-access = true
        |    aws { credentials { access-key-id = AK, secret-access-key = SK }
        |          region { default-region = eu-north-1 } }
        |    retry-settings { max-retries = 7, min-backoff = 200 millis }
        |}
        |s3-config = {
        |    data-bucket = my-backups
        |    data-bucket-prefix = prod/kafka
        |}
        |""".stripMargin, env = Map.empty)
    val s3a = S3Settings.hadoopConf(cfg)
    assert(s3a("fs.s3a.acl.default") == "BucketOwnerFullControl")
    assert(s3a("fs.s3a.create.storage.class") == "standard_ia")
    assert(s3a("fs.s3a.encryption.algorithm") == "SSE-KMS")
    assert(s3a("fs.s3a.encryption.key") == "arn:aws:kms:k1")
    assert(s3a("fs.s3a.create.header.x-amz-meta-pipeline") == "graft")
    assert(s3a("fs.s3a.create.header.Cache-Control") == "no-store")
    assert(s3a("fs.s3a.endpoint") == "https://minio.local:9000")
    assert(s3a("fs.s3a.path.style.access") == "true")
    assert(s3a("fs.s3a.access.key") == "AK" && s3a("fs.s3a.secret.key") == "SK")
    assert(s3a("fs.s3a.endpoint.region") == "eu-north-1")
    assert(s3a("fs.s3a.retry.limit") == "7")
    assert(s3a("fs.s3a.retry.interval") == "200ms")
    assert(S3Settings.dataUri(cfg).contains("s3a://my-backups/prod/kafka"))
    // cross-field and enum validation, mirroring the reference's rules
    def bad(extra: String): String =
      intercept[IllegalArgumentException] {
        S3Settings.hadoopConf(HoconConfig.parse(extra, env = Map.empty))
      }.getMessage
    assert(bad("s3-headers.canned-acl = sekrit").contains("authenticated-read"))
    assert(bad("s3-headers.server-side-encryption.type = kms").contains("key-id"))
    assert(bad("s3-headers.server-side-encryption = { type = rot13 }").contains("aes256"))
    assert(bad("s3-config.error-restart-settings.max-restarts = 3")
      .contains("max-restarts-within is missing"))
    assert(S3Settings.hadoopConf(Map.empty) == Map.empty)
  }

  test("env layering: type override wins; a lone env duration means period-from-first") {
    val cfg = HoconConfig.parse(conf, env = Map.empty)
    // env type flips the discriminator over the file's chrono-unit-slice
    assert(Main.timeConfiguration(Map.empty, cfg,
      env = Map("BACKUP_TIME_CONFIGURATION_TYPE" -> "period-from-first")) ==
      PeriodFromFirst(3600000L))
    // without any type key, an explicit env duration keeps the
    // pre-config CLI contract even though the file carries the
    // reference's always-present chrono-unit default
    val cfgNoType = HoconConfig.parse(conf.linesIterator
      .filterNot(_.trim.startsWith("type")).mkString("\n"), env = Map.empty)
    assert(Main.timeConfiguration(Map.empty, cfgNoType,
      env = Map("BACKUP_TIME_CONFIGURATION_DURATION" -> "10 seconds")) ==
      PeriodFromFirst(10000L))
  }

  test("a quoted list element containing a comma is rejected, not silently split") {
    // lists flatten to a comma-joined string that topicsOf re-splits on
    // ','; ["a,b"] would silently become two topics — fail at parse time
    val e = intercept[IllegalArgumentException] {
      HoconConfig.parse("""kafka-cluster { topics = ["a,b", "c"] }""", env = Map.empty)
    }
    assert(e.getMessage.contains("separate elements"))
    // plain multi-element lists still flatten
    assert(HoconConfig.parse("""t = ["a", "b"]""", env = Map.empty) == Map("t" -> "a,b"))
  }

  test("type discriminator selects duration; HOCON durations parse") {
    val cfg = HoconConfig.parse(conf.replace(
      "type = chrono-unit-slice", "type = period-from-first"), env = Map.empty)
    assert(Main.timeConfiguration(Map.empty, cfg, env = Map.empty) == PeriodFromFirst(3600000L))
    assert(HoconConfig.durationMs("500 millis").contains(500L))
    assert(HoconConfig.durationMs("10 seconds").contains(10000L))
    assert(HoconConfig.durationMs("2 days").contains(172800000L))
    assert(HoconConfig.durationMs("12345").contains(12345L))
    assert(HoconConfig.durationMs("one hour").isEmpty)
  }
}
