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
      assert(Main.timeConfiguration(Map.empty, cfg) == ChronoUnitSlice(ChronoUnit.MINUTES))
      assert(Main.compressionOf(Map.empty, cfg) == (Some(Gzip), Some(6)))
      assert(Main.overrideTopics(Map.empty, cfg) == Map("events" -> "events-replayed"))
    } finally Files.delete(f)
  }

  test("explicit flags outrank the config file") {
    val cfg = HoconConfig.parse(conf, env = Map.empty)
    assert(Main.timeConfiguration(Map("slice" -> "days"), cfg) ==
      ChronoUnitSlice(ChronoUnit.DAYS))
    // a period flag flips the discriminator even though the file says
    // chrono-unit-slice (flag implies type, the reference CLI contract)
    assert(Main.timeConfiguration(Map("period-from-first" -> "60000"), cfg) ==
      PeriodFromFirst(60000L))
    assert(Main.overrideTopics(Map("override-topics" -> "a:b"), cfg) == Map("a" -> "b"))
  }

  test("type discriminator selects duration; HOCON durations parse") {
    val cfg = HoconConfig.parse(conf.replace(
      "type = chrono-unit-slice", "type = period-from-first"), env = Map.empty)
    assert(Main.timeConfiguration(Map.empty, cfg) == PeriodFromFirst(3600000L))
    assert(HoconConfig.durationMs("500 millis").contains(500L))
    assert(HoconConfig.durationMs("10 seconds").contains(10000L))
    assert(HoconConfig.durationMs("2 days").contains(172800000L))
    assert(HoconConfig.durationMs("12345").contains(12345L))
    assert(HoconConfig.durationMs("one hour").isEmpty)
  }
}
