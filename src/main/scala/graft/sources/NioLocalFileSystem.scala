package graft.sources

import java.net.URI
import java.nio.file.{Files, Paths}
import java.nio.file.attribute.PosixFilePermission
import java.util.{EnumSet => JEnumSet}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Fork-free raw local filesystem (see [[NioLocalFileSystem]]).
  *
  * Without libhadoop, Hadoop's RawLocalFileSystem shells out
  * (`fork`+`exec chmod`) on EVERY file create to set permissions
  * (`RawLocalFileSystem.setPermission` → `Shell.execCommand`). A partitioned
  * write creates hundreds of files, and forking a multi-GB JVM per file
  * dominates the write path (observed: 30-100s stalls with all executor
  * threads in `ProcessImpl.forkAndExec`). This subclass reroutes permission
  * ops through java.nio — no child processes.
  */
class NioRawLocalFileSystem extends RawLocalFileSystem {

  /** Statuses with the permission/owner/group EAGERLY populated via one
    * java.nio `readAttributes` call. RawLocalFileSystem's own statuses
    * (`DeprecatedRawLocalFileStatus`) load permissions LAZILY by forking
    * `ls -ld` per file on the first `getPermission()` — and that call is
    * NOT rare: `FileSystem.listFiles`/`listLocatedStatus` and Spark's
    * `HadoopFSUtils.listLeafFiles` (every uncached directory scan, with
    * locality on) each construct a `LocatedFileStatus`, whose constructor
    * reads the permission eagerly. One fork per listed file turned every
    * layout listing into 0.3-0.7 s of `ProcessImpl.forkAndExec` on the
    * driver (measured: branch_read spent ~2/3 of its time there). A
    * vanished-mid-list file degrades to the lazy status rather than
    * failing the whole listing. */
  private def enrich(s: org.apache.hadoop.fs.FileStatus):
      org.apache.hadoop.fs.FileStatus =
    try {
      val p = Paths.get(pathToFile(s.getPath).getAbsolutePath)
      val a = Files.readAttributes(p,
        classOf[java.nio.file.attribute.PosixFileAttributes])
      new org.apache.hadoop.fs.FileStatus(s.getLen, s.isDirectory,
        1, s.getBlockSize, s.getModificationTime, s.getAccessTime,
        fromPosix(a.permissions()), a.owner().getName, a.group().getName,
        s.getPath)
    } catch {
      // UnsupportedOperationException: a non-POSIX store (the same class
      // cloneTree's hardlink fallback anticipates) must degrade to the
      // lazy status per file, not fail every listing (r21 advice)
      case _: java.io.IOException | _: SecurityException
        | _: UnsupportedOperationException => s
    }

  private def fromPosix(ps: java.util.Set[PosixFilePermission]): FsPermission = {
    import PosixFilePermission._
    var m = 0
    if (ps.contains(OWNER_READ)) m |= 0x100
    if (ps.contains(OWNER_WRITE)) m |= 0x080
    if (ps.contains(OWNER_EXECUTE)) m |= 0x040
    if (ps.contains(GROUP_READ)) m |= 0x020
    if (ps.contains(GROUP_WRITE)) m |= 0x010
    if (ps.contains(GROUP_EXECUTE)) m |= 0x008
    if (ps.contains(OTHERS_READ)) m |= 0x004
    if (ps.contains(OTHERS_WRITE)) m |= 0x002
    if (ps.contains(OTHERS_EXECUTE)) m |= 0x001
    new FsPermission(m.toShort)
  }

  override def getFileStatus(f: Path): org.apache.hadoop.fs.FileStatus =
    enrich(super.getFileStatus(f))

  override def listStatus(f: Path): Array[org.apache.hadoop.fs.FileStatus] = {
    val ss = super.listStatus(f)
    if (ss == null) null else ss.map(enrich)
  }

  private def toPosix(perm: FsPermission): JEnumSet[PosixFilePermission] = {
    import PosixFilePermission._
    val s = JEnumSet.noneOf(classOf[PosixFilePermission])
    val m = perm.toShort
    if ((m & 0x100) != 0) s.add(OWNER_READ)
    if ((m & 0x080) != 0) s.add(OWNER_WRITE)
    if ((m & 0x040) != 0) s.add(OWNER_EXECUTE)
    if ((m & 0x020) != 0) s.add(GROUP_READ)
    if ((m & 0x010) != 0) s.add(GROUP_WRITE)
    if ((m & 0x008) != 0) s.add(GROUP_EXECUTE)
    if ((m & 0x004) != 0) s.add(OTHERS_READ)
    if ((m & 0x002) != 0) s.add(OTHERS_WRITE)
    if ((m & 0x001) != 0) s.add(OTHERS_EXECUTE)
    s
  }

  override def setPermission(p: Path, permission: FsPermission): Unit =
    Files.setPosixFilePermissions(
      Paths.get(pathToFile(p).getAbsolutePath), toPosix(permission))
}

/** Fork-free local filesystem for the `file:` scheme, installed by
  * `Tables.warmup` via `fs.file.impl`.
  *
  * The chmod-fork fix lives in [[NioRawLocalFileSystem]]; this class is
  * the `LocalFileSystem`-typed wrapper around it because Hadoop's own
  * `FileSystem.getLocal(conf)` CASTS the `file:` filesystem to
  * `LocalFileSystem` — a raw-extending impl crashes every caller of
  * that API (first hit: RocksDBFileManager's `copyFromLocalFile` on
  * state-store snapshot upload, which `transformWithState` requires).
  * Checksums are disabled in both directions, so no `.crc` twin is
  * written per create (the other half of the original fix) and reads
  * delegate straight to the raw stream.
  */
class NioLocalFileSystem extends LocalFileSystem(new NioRawLocalFileSystem) {
  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setWriteChecksum(false)
    setVerifyChecksum(false)
  }
}
