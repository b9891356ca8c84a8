package graft.sources

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.PosixFilePermission
import java.util.{EnumSet => JEnumSet}
import org.apache.hadoop.fs.{Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Fork-free local filesystem for the `file:` scheme.
  *
  * Without libhadoop, Hadoop's RawLocalFileSystem shells out
  * (`fork`+`exec chmod`) on EVERY file create to set permissions
  * (`RawLocalFileSystem.setPermission` → `Shell.execCommand`). A partitioned
  * write creates hundreds of files, and forking a multi-GB JVM per file
  * dominates the write path (observed: 30-100s stalls with all executor
  * threads in `ProcessImpl.forkAndExec`). This subclass reroutes permission
  * ops through java.nio — no child processes — and, being the *raw* FS,
  * also drops the `.crc` checksum twin written for every file, halving
  * creates. Installed by `Tables.warmup` via `fs.file.impl`.
  */
class NioLocalFileSystem extends RawLocalFileSystem {

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
