package graft.engine

import java.nio.file.attribute.PosixFilePermission
import java.util.EnumSet

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local Hadoop filesystem whose `setPermission` runs in-process.
  *
  * Stock `RawLocalFileSystem.setPermission` shells out to `/bin/chmod`
  * whenever libhadoop's NativeIO is absent (it is absent in this image),
  * and `mkdirsWithOptionalPermission`/`create` call it for EVERY
  * directory level and output file — so each parquet task-attempt dir,
  * checkpoint dir, GenState generation and commit marker forks one or
  * more processes inside the write path. Stack-sampling the engine
  * gates put 16/35 runnable executor samples in
  * `ProcessImpl.forkAndExec` under exactly this stack (r16; see
  * OPTIMIZATION_r16.md). The override sets the same nine rwx bits
  * through NIO (`Files.setPosixFilePermissions`) — a strict
  * re-implementation, not a no-op: the on-disk mode bits come out
  * identical to the chmod the shell would have run. Modes NIO cannot
  * express (sticky/setuid/setgid) fall back to the stock shell path, as
  * does any filesystem without POSIX attribute support.
  *
  * Production deployments (HDFS/S3/ABFS) never touch this class — it
  * binds to `file://` URIs only (`spark.hadoop.fs.file.impl`); a real
  * local-disk deployment benefits the same way the bench does.
  */
final class NoForkRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = {
    if (permission == null) return
    val mode = permission.toShort.toInt
    if ((mode & ~0x1ff) != 0) { // sticky/setuid/setgid: NIO can't — shell out
      super.setPermission(p, permission)
      return
    }
    try {
      val perms = EnumSet.noneOf(classOf[PosixFilePermission])
      import PosixFilePermission._
      if ((mode & 0x100) != 0) perms.add(OWNER_READ)
      if ((mode & 0x080) != 0) perms.add(OWNER_WRITE)
      if ((mode & 0x040) != 0) perms.add(OWNER_EXECUTE)
      if ((mode & 0x020) != 0) perms.add(GROUP_READ)
      if ((mode & 0x010) != 0) perms.add(GROUP_WRITE)
      if ((mode & 0x008) != 0) perms.add(GROUP_EXECUTE)
      if ((mode & 0x004) != 0) perms.add(OTHERS_READ)
      if ((mode & 0x002) != 0) perms.add(OTHERS_WRITE)
      if ((mode & 0x001) != 0) perms.add(OTHERS_EXECUTE)
      java.nio.file.Files.setPosixFilePermissions(
        pathToFile(p).toPath, perms): Unit
    } catch {
      case _: UnsupportedOperationException =>
        super.setPermission(p, permission) // non-POSIX volume
    }
  }

  /** Stock `getFileLinkStatus` forks `stat`/`readlink` per call (no
    * NativeIO). Non-symlinks — every path the engine ever touches — are
    * answered by `getFileStatus` (identical result: "don't follow the
    * link" is vacuous for a non-link); real symlinks keep the stock
    * path. */
  override def getFileLinkStatus(f: Path): org.apache.hadoop.fs.FileStatus = {
    val nio = pathToFile(f).toPath
    if (java.nio.file.Files.isSymbolicLink(nio)) super.getFileLinkStatus(f)
    else getFileStatus(f)
  }
}

/** `fs.file.impl` face: [[LocalFileSystem]] over the no-fork raw fs. */
final class NoForkLocalFileSystem
    extends LocalFileSystem(new NoForkRawLocalFileSystem)

/** FileContext ("AbstractFileSystem") face — Structured Streaming's
  * checkpoint manager goes through `FileContext`, whose local binding
  * (`LocalFs`) constructs its OWN stock RawLocalFileSystem and ignores
  * `fs.file.impl`; its rename path additionally forks `readlink`/`stat`
  * per call through `getFileLinkStatus` (observed: the one remaining
  * fork after the `fs.file.impl` override — AbstractFileSystem.rename →
  * DelegateToFileSystem → RawLocalFileSystem.getFileLinkStatus →
  * FileUtil.readLink → fork). Mirrors LocalFs' exact shape
  * (ChecksumFs over a DelegateToFileSystem over the raw local fs) with
  * the no-fork raw underneath. Bind with
  * `fs.AbstractFileSystem.file.impl`. */
final class NoForkRawLocalFs(uri: java.net.URI,
    conf: org.apache.hadoop.conf.Configuration)
  extends org.apache.hadoop.fs.DelegateToFileSystem(
    org.apache.hadoop.fs.FsConstants.LOCAL_FS_URI,
    new NoForkRawLocalFileSystem, conf, "file", false)

final class NoForkLocalFs(uri: java.net.URI,
    conf: org.apache.hadoop.conf.Configuration)
  extends org.apache.hadoop.fs.ChecksumFs(new NoForkRawLocalFs(uri, conf))
