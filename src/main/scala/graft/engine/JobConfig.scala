package graft.engine

/** Flat string-typed job configuration, the engine analog of the
  * reference's ~25 required environment variables (backup.sh:74-90,
  * psql-backups.sh:9-93). Parsed from an explicit map for testability;
  * `fromEnv` binds to the process environment.
  */
final case class JobConfig(
    engine: String,            // DB_ENGINE analog ("postgres"|"sqlserver-se")
    engineVersion: String,     // DB_ENGINE_VERSION
    serviceName: String,       // SERVICE_NAME
    snapshotDir: String,       // BACKUP_BUCKET analog (parquet prefix)
    attempts: Int,             // ATTEMPTS   (retry budget, default 9)
    timeoutMs: Long,           // TIMEOUT    (base backoff, default 2s)
    useBackupsAccount: Boolean // USE_BACKUPS_ACCOUNT
) {
  /** Major version, the `${DB_ENGINE_VERSION%%.*}` parse (backup.sh:172). */
  def majorVersion: Int = engineVersion.takeWhile(_ != '.').toInt

  /** DB identifiers cap at 63 chars; service names ≥30 chars trim to 29
    * (psql-backups.sh:56-62). */
  def trimmedServiceName: String =
    if (serviceName.length >= 30) serviceName.substring(0, 29) else serviceName

  /** `"${DB_ENGINE}-${SERVICE_NAME}-auto-restore"` (psql-backups.sh:64). */
  def restoreInstanceName: String = s"$engine-$trimmedServiceName-auto-restore"
}

object JobConfig {
  def apply(env: Map[String, String]): JobConfig = {
    def req(k: String): String =
      env.getOrElse(k, throw new IllegalArgumentException(s"missing required config $k"))
    JobConfig(
      engine = req("DB_ENGINE"),
      engineVersion = req("DB_ENGINE_VERSION"),
      serviceName = req("SERVICE_NAME"),
      snapshotDir = req("BACKUP_DIR"),
      attempts = env.getOrElse("ATTEMPTS", "9").toInt,
      timeoutMs = env.getOrElse("TIMEOUT", "2").toLong * 1000L,
      useBackupsAccount = env.getOrElse("USE_BACKUPS_ACCOUNT", "false").toBoolean)
  }

  def fromEnv(): JobConfig = apply(sys.env)
}
