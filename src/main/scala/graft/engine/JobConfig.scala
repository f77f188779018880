package graft.engine

/** Flat string-typed job configuration, the engine analog of the
  * reference's ~25 required environment variables (backup.sh:74-90,
  * psql-backups.sh:9-93). Parsed from an explicit map for testability;
  * `fromEnv` binds to the process environment.
  *
  * The credential / provisioning surface (A25/A26/A28) is config, not
  * data-plane logic, so it lives here as validated fields:
  *
  *   - A25 cross-account scoping: the reference writes an assume-role
  *     profile for the backups account (backup.sh:79-90); the Spark
  *     form is the S3A assumed-role credential provider ([[sinkConf]]).
  *   - A26 IAM token auth + CA pinning: `aws rds generate-db-auth-token`
  *     plus the pinned RDS root CA (psql-backups-iam-auth.sh:119-124);
  *     represented as the fields a JDBC extract needs, validated
  *     together.
  *   - A28 ephemeral restore-instance provisioning: instance class /
  *     subnet group / security group (psql-backups.sh:165-198), the
  *     knobs of the throwaway verification cluster.
  */
final case class JobConfig(
    engine: String,            // DB_ENGINE analog ("postgres"|"sqlserver-se")
    engineVersion: String,     // DB_ENGINE_VERSION
    serviceName: String,       // SERVICE_NAME
    snapshotDir: String,       // BACKUP_BUCKET analog (parquet prefix)
    attempts: Int,             // ATTEMPTS   (retry budget, default 9)
    timeoutMs: Long,           // TIMEOUT    (base backoff, default 2s)
    useBackupsAccount: Boolean,        // USE_BACKUPS_ACCOUNT (A25)
    checkInUrl: Option[String] = None, // CHECK_IN_URL / DMS_URL (A24)
    backupsRoleArn: Option[String] = None, // role_arn of the backup profile (A25)
    kmsKeyId: Option[String] = None,   // SSE-KMS key for the sink (A4)
    iamAuthEnabled: Boolean = false,   // IAM_AUTH_ENABLED (A26)
    iamAuthUsername: Option[String] = None, // RDS_IAM_AUTH_USERNAME (A26)
    region: Option[String] = None,     // AWS_REGION (A26 token scope)
    caBundle: Option[String] = None,   // pinned DB root CA path (A26)
    restoreInstanceClass: Option[String] = None, // RDS_INSTANCE_TYPE (A28)
    subnetGroup: Option[String] = None,    // SUBNET_GROUP_NAME (A28)
    securityGroup: Option[String] = None   // RDS_SECURITY_GROUP (A28)
) {
  // IAM token generation needs endpoint+username+region together
  // (psql-backups-iam-auth.sh:121); failing at parse beats failing
  // mid-extract.
  require(!iamAuthEnabled || (iamAuthUsername.isDefined && region.isDefined),
    "IAM_AUTH_ENABLED requires RDS_IAM_AUTH_USERNAME and AWS_REGION")
  // The cross-account profile is meaningless without the role to assume.
  require(!useBackupsAccount || backupsRoleArn.isDefined,
    "USE_BACKUPS_ACCOUNT requires BACKUPS_ROLE_ARN")

  /** Major version, the `${DB_ENGINE_VERSION%%.*}` parse (backup.sh:172). */
  def majorVersion: Int = engineVersion.takeWhile(_ != '.').toInt

  /** DB identifiers cap at 63 chars; service names ≥30 chars trim to 29
    * (psql-backups.sh:56-62). */
  def trimmedServiceName: String =
    if (serviceName.length >= 30) serviceName.substring(0, 29) else serviceName

  /** `"${DB_ENGINE}-${SERVICE_NAME}-auto-restore"` (psql-backups.sh:64). */
  def restoreInstanceName: String = s"$engine-$trimmedServiceName-auto-restore"

  /** Hadoop S3A conf for the snapshot sink: assumed-role cross-account
    * credentials (A25) + SSE-KMS at-rest encryption (A4). These are the
    * standard public S3A keys — the engine applies them to the session's
    * hadoopConfiguration; no credential material lives in code. */
  def sinkConf: Map[String, String] = {
    val role =
      if (useBackupsAccount)
        backupsRoleArn.map(arn => Map(
          "fs.s3a.aws.credentials.provider" ->
            "org.apache.hadoop.fs.s3a.auth.AssumedRoleCredentialProvider",
          "fs.s3a.assumed.role.arn" -> arn)).getOrElse(Map.empty)
      else Map.empty[String, String]
    val sse = kmsKeyId.map(k => Map(
      "fs.s3a.server-side-encryption-algorithm" -> "SSE-KMS",
      "fs.s3a.server-side-encryption.key" -> k)).getOrElse(Map.empty)
    role ++ sse
  }
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
      useBackupsAccount = env.getOrElse("USE_BACKUPS_ACCOUNT", "false").toBoolean,
      checkInUrl = env.get("CHECK_IN_URL").orElse(env.get("DMS_URL")),
      backupsRoleArn = env.get("BACKUPS_ROLE_ARN"),
      kmsKeyId = env.get("KMS_KEY_ID"),
      iamAuthEnabled = env.getOrElse("IAM_AUTH_ENABLED", "false").toBoolean,
      iamAuthUsername = env.get("RDS_IAM_AUTH_USERNAME"),
      region = env.get("AWS_REGION"),
      caBundle = env.get("CA_BUNDLE"),
      restoreInstanceClass = env.get("RDS_INSTANCE_TYPE"),
      subnetGroup = env.get("SUBNET_GROUP_NAME"),
      securityGroup = env.get("RDS_SECURITY_GROUP"))
  }

  def fromEnv(): JobConfig = apply(sys.env)
}
