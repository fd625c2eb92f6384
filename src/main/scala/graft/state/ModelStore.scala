package graft.state

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned model/state persistence with blue/green publication.
  *
  * Reference: joblib pickles saved per run (`src/ml/model.py:18-46`,
  * `vector_engine.py:47-61`) and the training script's staging-dir →
  * atomic-rename swap (`scripts/run_training_batch.py:30-36, 243-257`).
  * Engine form: state is ordinary parquet tables (micro-clusters,
  * centroids, anomaly baselines) written to `<root>/_staging/<name>` and
  * atomically moved over `<root>/<name>`, with the previous production
  * copy kept as `<name>_backup`.
  */
object ModelStore {

  private def rm(p: Path): Unit = graft.util.Fs.deleteRecursively(p)

  /** Write `df` to the staging area of `root`. */
  def stage(df: DataFrame, root: String, name: String): Unit =
    df.write.mode("overwrite").parquet(s"$root/_staging/$name")

  /** Blue/green publish: prod → backup, staging → prod (atomic per state
    * table, mirroring run_training_batch.py:243-257). */
  def publish(root: String, name: String): Unit = {
    val prod = Paths.get(root, name)
    val backup = Paths.get(root, s"${name}_backup")
    val staging = Paths.get(root, "_staging", name)
    require(Files.exists(staging), s"no staged state at $staging")
    rm(backup)
    if (Files.exists(prod))
      Files.move(prod, backup, StandardCopyOption.ATOMIC_MOVE)
    Files.move(staging, prod, StandardCopyOption.ATOMIC_MOVE)
  }

  def save(df: DataFrame, root: String, name: String): Unit = {
    stage(df, root, name)
    publish(root, name)
  }

  /** [[publish]] with first-writer-wins semantics for IMMUTABLE
    * version names — optimistic concurrency detected at commit: if the
    * name was already published (prod or backup), the second of two
    * writers that raced to derive the same new version from the same
    * base gets an error instead of silently clobbering the first (the
    * classic lost update), and must REBASE onto the latest version and
    * retry — LayoutSpec pins the race and the rebase. The check is
    * belt; the suspenders are the filesystem's own atomicity: with no
    * prod to move aside, [[publish]] degenerates to the single
    * staging→prod rename, and `Files.move` without REPLACE_EXISTING
    * throws if the target appeared meanwhile — so even a cross-process
    * race resolves to exactly one winner. The copy-on-write mutation
    * arms ([[graft.llm.Layout]]) commit through this. */
  def publishExclusive(root: String, name: String): Unit = {
    require(!Files.exists(Paths.get(root, name)) &&
      !Files.exists(Paths.get(root, s"${name}_backup")),
      s"publishExclusive: version '$name' already exists at $root — " +
        "rebase onto the latest version and retry")
    publish(root, name)
  }

  /** Load production state; falls back to the backup copy if prod is
    * missing (covers a crash between publish()'s two renames — prod was
    * moved aside but staging never landed). */
  def load(spark: SparkSession, root: String, name: String): DataFrame =
    if (Files.exists(Paths.get(root, name)))
      spark.read.parquet(s"$root/$name")
    else if (Files.exists(Paths.get(root, s"${name}_backup")))
      spark.read.parquet(s"$root/${name}_backup")
    else
      spark.read.parquet(s"$root/$name") // surface the original error

  def exists(root: String, name: String): Boolean =
    Files.exists(Paths.get(root, name))

  /** Retention vacuum: retire every published version under `root`
    * whose name is not in `keep` — the lifecycle endpoint of the
    * multi-version store (q241 leaves v1/v2/v3 coexisting; a retention
    * policy eventually reclaims all but the serving set). A kept name
    * keeps its `_backup` twin too (the crash-window fallback must
    * survive a vacuum); a retired name loses prod, backup AND any
    * leftover staging. Returns the retired names, sorted. Deliberately
    * name-driven, not age-driven: age policies are a `keep`-set
    * computation for the caller, while the invariant this owns is
    * "never break a kept blue/green pair". */
  def vacuum(root: String, keep: Set[String]): Seq[String] = {
    def owner(dir: String): String =
      if (dir.endsWith("_backup")) dir.stripSuffix("_backup") else dir
    def children(p: Path): Seq[String] =
      if (!Files.isDirectory(p)) Seq.empty
      else scala.util.Using.resource(Files.list(p)) { s =>
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString).toSeq
      }
    val top = children(Paths.get(root)).filterNot(_ == "_staging")
    val retired = top.filterNot(d => keep.contains(owner(d)))
    retired.foreach(d => rm(Paths.get(root, d)))
    children(Paths.get(root, "_staging"))
      .filterNot(keep.contains)
      .foreach(d => rm(Paths.get(root, "_staging", d)))
    retired.map(owner).distinct.sorted
  }
}
