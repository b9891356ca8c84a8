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
