package graft

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{NoForkLocalFileSystem, NoForkRawLocalFileSystem}

/** The no-fork local filesystem must behave byte- and mode-identically
  * to the stock shell-exec path on everything the engine does: mkdirs
  * with permissions, create/write/read round-trip, rename, link-status
  * of plain files, and explicit setPermission. */
class NoForkLocalFsSpec extends AnyFunSuite {

  private def posixBits(p: java.nio.file.Path): Int =
    java.nio.file.Files.getPosixFilePermissions(p).toArray.map {
      case java.nio.file.attribute.PosixFilePermission.OWNER_READ => 0x100
      case java.nio.file.attribute.PosixFilePermission.OWNER_WRITE => 0x080
      case java.nio.file.attribute.PosixFilePermission.OWNER_EXECUTE => 0x040
      case java.nio.file.attribute.PosixFilePermission.GROUP_READ => 0x020
      case java.nio.file.attribute.PosixFilePermission.GROUP_WRITE => 0x010
      case java.nio.file.attribute.PosixFilePermission.GROUP_EXECUTE => 0x008
      case java.nio.file.attribute.PosixFilePermission.OTHERS_READ => 0x004
      case java.nio.file.attribute.PosixFilePermission.OTHERS_WRITE => 0x002
      case java.nio.file.attribute.PosixFilePermission.OTHERS_EXECUTE => 0x001
    }.sum

  test("setPermission lands the identical mode bits the shell chmod would") {
    val base = Files.createTempDirectory("graft_nofork").toFile
    val fs = new NoForkRawLocalFileSystem
    fs.initialize(java.net.URI.create("file:///"), new Configuration())
    val f = new java.io.File(base, "modes")
    assert(f.createNewFile())
    for (mode <- Seq(0x1ed /*755*/, 0x1a4 /*644*/, 0x180 /*600*/, 0x1ff /*777*/)) {
      fs.setPermission(new Path(f.toURI), new FsPermission(mode.toShort))
      assert(posixBits(f.toPath) == mode, f"mode $mode%o")
    }
  }

  test("mkdirs/create/rename/read round-trip through both faces, no symlink misread") {
    val base = Files.createTempDirectory("graft_nofork2").toString
    val conf = new Configuration()
    conf.set("fs.file.impl", classOf[NoForkLocalFileSystem].getName)
    conf.set("fs.AbstractFileSystem.file.impl",
      classOf[graft.engine.NoForkLocalFs].getName)
    conf.setBoolean("fs.file.impl.disable.cache", true)
    // FileSystem face (parquet writer path)
    val fs = new Path(base).getFileSystem(conf)
    assert(fs.isInstanceOf[NoForkLocalFileSystem])
    val dir = new Path(base, "a/b/c")
    assert(fs.mkdirs(dir, new FsPermission(0x1ed.toShort)))
    val file = new Path(dir, "data")
    val out = fs.create(file)
    out.write("payload-bytes".getBytes("UTF-8")); out.close()
    val moved = new Path(dir, "data2")
    assert(fs.rename(file, moved))
    val in = fs.open(moved)
    val buf = new Array[Byte](64)
    val n = in.read(buf); in.close()
    assert(new String(buf, 0, n, "UTF-8") == "payload-bytes")
    // FileContext face (streaming checkpoint path): create + atomic rename
    val fc = FileContext.getFileContext(new java.net.URI("file:///"), conf)
    val tmp = new Path(base, "ckpt.tmp")
    val dst = new Path(base, "ckpt")
    val os = fc.create(tmp,
      java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE,
        org.apache.hadoop.fs.CreateFlag.OVERWRITE))
    os.write("commit-log".getBytes("UTF-8")); os.close()
    fc.rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    val st = fc.getFileLinkStatus(dst)
    assert(!st.isSymlink && st.getLen == "commit-log".length)
    val is = fc.open(dst)
    val n2 = is.read(buf); is.close()
    assert(new String(buf, 0, n2, "UTF-8") == "commit-log")
  }
}
