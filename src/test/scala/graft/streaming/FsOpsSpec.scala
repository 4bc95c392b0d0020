package graft.streaming

import java.io.IOException
import org.apache.hadoop.fs.{Path => HPath, RawLocalFileSystem}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Commit-path filesystem mutations must fail loudly: on HDFS/S3A a failed
  * `rename`/`delete` returns `false` instead of throwing, and an unchecked
  * call would let a manifest/commit list files that were never promoted.
  */
class FsOpsSpec extends AnyFunSuite {

  /** A local FS whose mutations report failure the HDFS way (false). */
  private class RefusingFs extends RawLocalFileSystem {
    override def rename(src: HPath, dst: HPath): Boolean = false
    override def delete(p: HPath, recursive: Boolean): Boolean = false
  }

  private def refusingFs = {
    val fs = new RefusingFs
    fs.initialize(java.net.URI.create("file:///"), new org.apache.hadoop.conf.Configuration())
    fs
  }

  test("renameOrThrow throws when the store reports a failed rename") {
    val base = java.nio.file.Files.createTempDirectory("graft-fsops-")
    val src = base.resolve("a"); java.nio.file.Files.createFile(src)
    val e = intercept[IOException] {
      FsOps.renameOrThrow(refusingFs, new HPath(src.toString), new HPath(s"$base/b"))
    }
    assert(e.getMessage.contains("rename failed"))
  }

  test("deleteOrThrow throws for an existing path the store refuses to delete") {
    val base = java.nio.file.Files.createTempDirectory("graft-fsops-")
    val f = base.resolve("a"); java.nio.file.Files.createFile(f)
    val e = intercept[IOException] {
      FsOps.deleteOrThrow(refusingFs, new HPath(f.toString), recursive = false)
    }
    assert(e.getMessage.contains("delete failed"))
  }

  test("deleteOrThrow treats a missing path as success (idempotent cleanup)") {
    val base = java.nio.file.Files.createTempDirectory("graft-fsops-")
    FsOps.deleteOrThrow(refusingFs, new HPath(s"$base/nope"), recursive = true)
  }

  test("atomicWrite replaces an existing file with no missing-file window") {
    val spark = SparkSuite.spark // hadoop conf source
    val conf = spark.sessionState.newHadoopConf()
    val base = java.nio.file.Files.createTempDirectory("graft-fsops-")
    val dst = new HPath(s"$base/pointer.json")
    val fs = dst.getFileSystem(conf)
    FsOps.atomicWrite(conf, fs, dst, "v1".getBytes("UTF-8"))
    FsOps.atomicWrite(conf, fs, dst, "v2".getBytes("UTF-8"))
    val in = fs.open(dst)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    assert(body == "v2")
    // no stray temp siblings left behind
    assert(fs.listStatus(new HPath(base.toString)).map(_.getPath.getName).toSet == Set("pointer.json"))
  }
}
