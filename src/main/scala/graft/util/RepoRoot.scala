package graft.util

import java.io.File

/** Locates the repository root for fixture files so Bench/Verify/tests
  * work from any working directory (not just the repo checkout root).
  * Resolution order: `-Dgraft.repo.root` system property,
  * `GRAFT_REPO_ROOT` env var, then the nearest ancestor of the CWD
  * that contains a `fixtures/` directory, falling back to the CWD.
  */
object RepoRoot {

  lazy val dir: File = {
    def candidate(p: String): Option[File] =
      Option(p).map(new File(_)).filter(_.isDirectory)

    def search(start: File): Option[File] = {
      var cur: File = start.getAbsoluteFile
      while (cur != null) {
        if (new File(cur, "fixtures").isDirectory) return Some(cur)
        cur = cur.getParentFile
      }
      None
    }

    sys.props.get("graft.repo.root").flatMap(candidate)
      .orElse(sys.env.get("GRAFT_REPO_ROOT").flatMap(candidate))
      .orElse(search(new File(".")))
      .getOrElse(new File(".").getAbsoluteFile)
  }

  /** Absolute path of a file under `fixtures/`. */
  def fixture(name: String): String =
    new File(new File(dir, "fixtures"), name).getAbsolutePath
}
