package graft.cli

/** The reference's S3 configuration surface, re-expressed as Hadoop
  * s3a settings — the way a Spark job actually talks to S3.
  *
  * The reference hand-rolls readers for S3Headers / CannedAcl /
  * ServerSideEncryption with cross-field validation
  * (`core-s3/src/main/scala/io/aiven/guardian/kafka/s3/Config.scala:23-140`)
  * and ships connection settings under `pekko.connectors.s3`
  * (`core-s3/src/main/resources/reference.conf`). Here the same HOCON
  * keys (parsed by [[HoconConfig]]) validate with the same rules and
  * translate to the equivalent `fs.s3a.*` options, which the CLI
  * applies as `spark.hadoop.fs.s3a.*` on the session — so a reference
  * deployment's locked-down-bucket config (ACLs, SSE, storage class,
  * object headers, endpoint, credentials) carries over to the Spark
  * engine unchanged. Pekko-stream-only knobs with no s3a analog
  * (buffer type, forward proxy) are intentionally not mapped; SSE-KMS
  * encryption *context* has no s3a equivalent and fails loudly rather
  * than being silently dropped.
  */
object S3Settings {

  /** AWS canned ACL wire values (reference Config.scala:29-39) to the
    * s3a `fs.s3a.acl.default` enum names. */
  private val cannedAcls = Map(
    "authenticated-read" -> "AuthenticatedRead",
    "aws-exec-read" -> "AwsExecRead",
    "bucket-owner-full-control" -> "BucketOwnerFullControl",
    "bucket-owner-read" -> "BucketOwnerRead",
    "private" -> "Private",
    "public-read" -> "PublicRead",
    "public-read-write" -> "PublicReadWrite")

  /** S3 storage-class wire values (reference Config.scala:43-51) to
    * `fs.s3a.create.storage.class` names. */
  private val storageClasses = Map(
    "STANDARD" -> "standard",
    "STANDARD_IA" -> "standard_ia",
    "GLACIER" -> "glacier",
    "REDUCED_REDUNDANCY" -> "reduced_redundancy")

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  private def pick[A](cfg: Map[String, String], key: String, valid: Map[String, A]): Option[A] =
    cfg.get(key).map { v =>
      valid.getOrElse(v,
        fail(s"$key: '$v' is not one of ${valid.keys.toSeq.sorted.mkString(", ")}"))
    }

  /** Hadoop configuration (key -> value, without the `spark.hadoop.`
    * prefix) derived from a parsed config file. Empty when the file
    * carries no S3 keys. Throws IllegalArgumentException on invalid
    * enum values or cross-field violations, mirroring the reference's
    * UserValidationFailed semantics.
    */
  def hadoopConf(cfg: Map[String, String]): Map[String, String] = {
    val out = Map.newBuilder[String, String]

    pick(cfg, "s3-headers.canned-acl", cannedAcls)
      .foreach(out += "fs.s3a.acl.default" -> _)
    pick(cfg, "s3-headers.storage-class", storageClasses)
      .foreach(out += "fs.s3a.create.storage.class" -> _)

    // server-side-encryption: type discriminator + per-type required
    // fields (reference Config.scala:54-72)
    cfg.get("s3-headers.server-side-encryption.type").foreach {
      case "aes256" =>
        out += "fs.s3a.encryption.algorithm" -> "AES256"
      case "kms" =>
        val keyId = cfg.getOrElse("s3-headers.server-side-encryption.key-id",
          fail("server-side-encryption type 'kms' requires key-id"))
        if (cfg.contains("s3-headers.server-side-encryption.context"))
          fail("server-side-encryption 'kms' context has no s3a equivalent; " +
            "refusing to silently drop it")
        out += "fs.s3a.encryption.algorithm" -> "SSE-KMS"
        out += "fs.s3a.encryption.key" -> keyId
      case "customer-keys" =>
        val key = cfg.getOrElse("s3-headers.server-side-encryption.key",
          fail("server-side-encryption type 'customer-keys' requires key"))
        // md5 is accepted and ignored: s3a derives the key hash itself
        out += "fs.s3a.encryption.algorithm" -> "SSE-C"
        out += "fs.s3a.encryption.key" -> key
      case other =>
        fail(s"server-side-encryption type '$other' is not one of aes256, kms, customer-keys")
    }

    // meta-headers ride as x-amz-meta-*; custom headers verbatim —
    // both via s3a's create-time header pass-through
    HoconConfig.subKeys(cfg, "s3-headers.meta-headers").foreach { case (k, v) =>
      out += s"fs.s3a.create.header.x-amz-meta-$k" -> v
    }
    HoconConfig.subKeys(cfg, "s3-headers.custom-headers").foreach { case (k, v) =>
      out += s"fs.s3a.create.header.$k" -> v
    }

    // connection surface (reference.conf `pekko.connectors.s3`)
    val conn = "pekko.connectors.s3"
    cfg.get(s"$conn.endpoint-url").foreach(out += "fs.s3a.endpoint" -> _)
    cfg.get(s"$conn.path-style-access").foreach(out += "fs.s3a.path.style.access" -> _)
    cfg.get(s"$conn.aws.credentials.access-key-id").foreach(out += "fs.s3a.access.key" -> _)
    cfg.get(s"$conn.aws.credentials.secret-access-key").foreach(out += "fs.s3a.secret.key" -> _)
    cfg.get(s"$conn.aws.credentials.token").foreach(out += "fs.s3a.session.token" -> _)
    cfg.get(s"$conn.aws.region.default-region").foreach(out += "fs.s3a.endpoint.region" -> _)
    cfg.get(s"$conn.retry-settings.max-retries").foreach(out += "fs.s3a.retry.limit" -> _)
    cfg.get(s"$conn.retry-settings.min-backoff").foreach { d =>
      val ms = HoconConfig.durationMs(d).getOrElse(
        fail(s"retry-settings.min-backoff: cannot parse duration '$d'"))
      out += "fs.s3a.retry.interval" -> s"${ms}ms"
    }

    // reference cross-field rule (Config.scala:117-131): max-restarts
    // and max-restarts-within must be given together. The values
    // themselves belong to the pekko supervisor (Spark's task-retry
    // machinery replaces them) but a half-specified pair is still a
    // config error worth failing on.
    val rs = "s3-config.error-restart-settings"
    (cfg.get(s"$rs.max-restarts"), cfg.get(s"$rs.max-restarts-within")) match {
      case (Some(_), None) =>
        fail("Both max-restarts and max-restarts-within need to exist if defining " +
          "a maximum restarts configuration, max-restarts-within is missing")
      case (None, Some(_)) =>
        fail("Both max-restarts and max-restarts-within need to exist if defining " +
          "a maximum restarts configuration, max-restarts is missing")
      case _ => ()
    }

    out.result()
  }

  /** `s3a://bucket[/prefix]` location from the reference's
    * `s3-config.{data-bucket,data-bucket-prefix}` keys — usable
    * anywhere the CLI takes a directory. */
  def dataUri(cfg: Map[String, String]): Option[String] =
    cfg.get("s3-config.data-bucket").map { bucket =>
      val prefix = cfg.get("s3-config.data-bucket-prefix")
        .map(p => "/" + p.stripPrefix("/").stripSuffix("/")).getOrElse("")
      s"s3a://$bucket$prefix"
    }
}
