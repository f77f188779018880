package graft

import java.io.File
import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Test double for an OBJECT STORE's filesystem semantics (the
  * reference's actual sink — backup.sh:218-220 uploads to S3), backed
  * by the local disk so specs run hermetically:
  *
  *  - `rename` is a client-side COPY + DELETE — it "works" (so
  *    ordinary rename-based machinery like the parquet output
  *    committer still runs, exactly as plain S3A does) but it is NOT
  *    atomic: mid-rename the destination exists and is partial, and
  *    two racing renames to the same destination interleave files
  *    (blind per-key PUTs). [[ObjectStoreFileSystem.renameGate]] lets
  *    a spec hold a rename open mid-copy to OBSERVE that window
  *    deterministically instead of winning a timing race.
  *  - `create(path, overwrite = false)` IS atomic (O_EXCL on the
  *    backing file) — modeling S3 conditional PUT (If-None-Match) /
  *    HDFS create-exclusive, the one primitive
  *    [[graft.engine.Snapshot.publishPointer]]'s commit requires.
  *
  * So on this store the rename-commit protocol
  * ([[graft.engine.Snapshot.publishAtomic]]) is demonstrably broken
  * and the pointer-commit protocol holds — PointerPublishSpec runs
  * both. Registered under scheme `objstore` via
  * [[ObjectStoreFileSystem.install]]; [[ObjectStoreAbstractFs]] is the
  * FileContext-side binding publishAtomic's commit path resolves.
  */
class ObjectStoreFileSystem extends RawLocalFileSystem {
  import ObjectStoreFileSystem._

  override def getScheme: String = Scheme
  override def getUri: URI = NameUri

  /** Copy + delete — what an object store's "rename" really is. The
    * copy is file-at-a-time in sorted order (deterministic for the
    * mid-copy observation hook); an existing destination is merged
    * into, not detected — per-key PUTs have no directory lock. */
  override def rename(src: Path, dst: Path): Boolean = {
    val s = pathToFile(src)
    if (!s.exists()) return false
    val gate = renameGate.filter(_.dstMatch(dst.toString))
    gate.foreach(_.beforeCopy())
    var copied = 0
    def copyTree(from: File, to: File): Unit =
      if (from.isDirectory) {
        if (!to.exists()) { to.mkdirs(); () }
        from.listFiles().sortBy(_.getName)
          .foreach(c => copyTree(c, new File(to, c.getName)))
      } else {
        Option(to.getParentFile).filter(!_.exists()).foreach(_.mkdirs())
        // a blind PUT: last-writer-wins, never fails because the key
        // exists. (Files.copy(REPLACE_EXISTING) is delete-then-O_EXCL
        // under the hood — two RACING copiers of the same key can
        // collide in that window and throw, which a real object-store
        // PUT cannot do.)
        java.nio.file.Files.write(to.toPath,
          java.nio.file.Files.readAllBytes(from.toPath),
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.TRUNCATE_EXISTING,
          java.nio.file.StandardOpenOption.WRITE)
        copied += 1
        gate.foreach(_.afterEachFile(copied))
      }
    copyTree(s, pathToFile(dst))
    delete(src, true)
    true
  }

  override def create(
      f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    if (overwrite)
      super.create(f, permission, overwrite, bufferSize, replication,
        blockSize, progress)
    else createExclusive0(f, bufferSize)

  override def create(
      f: Path, overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long, progress: Progressable): FSDataOutputStream =
    if (overwrite)
      super.create(f, overwrite, bufferSize, replication, blockSize,
        progress)
    else createExclusive0(f, bufferSize)

  /** Conditional PUT: atomic create-if-absent via O_EXCL — unlike
    * RawLocalFileSystem's check-then-act `create(f, overwrite=false)`,
    * two concurrent callers can never both succeed. */
  private def createExclusive0(f: Path, bufferSize: Int): FSDataOutputStream = {
    val file = pathToFile(f)
    Option(file.getParentFile).filter(!_.exists()).foreach(_.mkdirs())
    val out =
      try java.nio.file.Files.newOutputStream(file.toPath,
        java.nio.file.StandardOpenOption.CREATE_NEW,
        java.nio.file.StandardOpenOption.WRITE)
      catch {
        case e: java.nio.file.FileAlreadyExistsException =>
          throw new org.apache.hadoop.fs.FileAlreadyExistsException(
            s"$f exists: ${e.getMessage}")
      }
    new FSDataOutputStream(new java.io.BufferedOutputStream(out, bufferSize),
      statistics)
  }
}

object ObjectStoreFileSystem {
  val Scheme = "objstore"
  val NameUri: URI = URI.create(s"$Scheme:///")

  /** Mid-rename observation hook: when `dstMatch` accepts the rename's
    * destination, `beforeCopy` runs after the caller's existence
    * checks but before any file lands (barrier two racers here), and
    * `afterEachFile(n)` runs after the n-th file is copied (pause here
    * to observe a partially-visible destination). Per-JVM static —
    * disarm in a finally. */
  final case class RenameGate(
      dstMatch: String => Boolean,
      beforeCopy: () => Unit = () => (),
      afterEachFile: Int => Unit = _ => ())
  @volatile var renameGate: Option[RenameGate] = None

  /** Register the scheme on a Hadoop conf (FileSystem + FileContext
    * bindings). */
  def install(conf: Configuration): Unit = {
    conf.set(s"fs.$Scheme.impl", classOf[ObjectStoreFileSystem].getName)
    conf.set(s"fs.AbstractFileSystem.$Scheme.impl",
      classOf[ObjectStoreAbstractFs].getName)
  }
}

/** FileContext-side binding for `objstore://` — delegates every
  * operation (including the rename semantics under test) to
  * [[ObjectStoreFileSystem]]. */
class ObjectStoreAbstractFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(
    uri, new ObjectStoreFileSystem, conf, ObjectStoreFileSystem.Scheme, false)
