package sherlog;

import org.apache.hadoop.fs.Path;
import org.apache.hadoop.fs.RawLocalFileSystem;
import org.apache.hadoop.fs.permission.FsPermission;

/**
 * Local filesystem that skips POSIX permission enforcement.
 *
 * Without libhadoop (native IO), Hadoop's RawLocalFileSystem forks a
 * `chmod` subprocess for EVERY mkdir/create-with-permission -- ~2.5 ms
 * per fork of a large-heap JVM, globally serialized by the OS. A
 * partitioned fan-out write creating thousands of sink directories
 * spends ~95% of its wall time forking (verified with jstack: all
 * executor threads in ProcessImpl.forkAndExec under
 * RawLocalFileSystem.setPermission).
 *
 * Sandbox-only: real deployments write to HDFS/S3/Iceberg where this
 * path does not exist. Activate with:
 *   spark.hadoop.fs.file.impl=sherlog.BareLocalFileSystem
 */
public class BareLocalFileSystem extends RawLocalFileSystem {
  @Override
  public void setPermission(Path p, FsPermission permission) {
    // no-op: default umask semantics are fine for sink files
  }

  @Override
  protected boolean mkOneDirWithMode(Path p, java.io.File p2f, FsPermission permission) {
    return p2f.mkdir();
  }
}
