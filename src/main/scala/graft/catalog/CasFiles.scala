package graft.catalog

import org.apache.hadoop.fs.{FileSystem, Path}

import java.io.OutputStream
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Exclusive-create primitive backing every CAS in the engine.
  *
  * Hadoop's local filesystems implement `create(path, overwrite=false)`
  * as exists()-then-create — NOT atomic, so two threads in one JVM can
  * both "win" and silently overwrite a manifest version. On `file://` we
  * therefore go through java.nio with CREATE_NEW (atomic O_EXCL at the
  * kernel). HDFS's create is namenode-atomic already; object stores use
  * their conditional-put semantics through the connector.
  */
object CasFiles {
  def createExclusive(fs: FileSystem, path: Path): OutputStream = {
    if (fs.getScheme == "file") {
      val p = Paths.get(path.toUri.getPath)
      if (p.getParent != null) Files.createDirectories(p.getParent)
      // throws java.nio.file.FileAlreadyExistsException on loss
      Files.newOutputStream(p, StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
    } else {
      fs.create(path, false)
    }
  }
}
