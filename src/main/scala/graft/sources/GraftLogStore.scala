package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The per-backend ATOMIC PUBLISH primitive the whole commit protocol
  * hangs on (Delta's LogStore abstraction, reduced to the one method
  * the protocol actually needs): claim `target` with the content of
  * `tmp` such that of N racing writers EXACTLY ONE returns true and
  * the rest false — never two winners, never zero. Everything above
  * this (optimistic retry, conflict detection, checkpointing, vacuum)
  * is backend-agnostic.
  *
  * Built-in behavior ([[GraftLogStore.Default]]):
  *  - `file://` — hard-link the tmp onto the target: link(2) fails
  *    EEXIST atomically in the kernel (a rename would REPLACE an
  *    existing target on POSIX — two racers could both "win");
  *  - everything else (HDFS and HDFS-semantics stores) — exists-check
  *    then rename, whose rename-onto-existing fails atomically there.
  *
  * An OBJECT STORE (S3-style: no atomic no-overwrite rename, list-
  * after-write consistency caveats) needs an EXTERNAL coordinator —
  * exactly the seam Delta documents for S3 (its S3DynamoDBLogStore).
  * Plug one in per session:
  * {{{ spark.conf.set("spark.graft.logstore.class", "com.example.MyStore") }}}
  * — the class needs a no-arg constructor; it is resolved once per
  * [[VersionedTable]] instance. The contract to uphold is ONLY the
  * single-winner property above; [[graft.LogStoreSpec]] carries a
  * reference external-coordinator implementation and the race test a
  * custom store must pass.
  */
trait GraftLogStore {

  /** Atomically claim `target` with the content of `tmp`. Returns true
    * for the single winner; false if another writer already claimed
    * the slot. On true, `tmp` must no longer exist; on false, `tmp`
    * is left for the caller to reclaim.
    */
  def atomicClaim(fs: FileSystem, tmp: Path, target: Path): Boolean
}

object GraftLogStore {

  /** Session conf key naming a custom [[GraftLogStore]] class. */
  val ConfKey = "spark.graft.logstore.class"

  /** The built-in backend dispatch (see trait doc). */
  object Default extends GraftLogStore {
    override def atomicClaim(fs: FileSystem, tmp: Path,
                             target: Path): Boolean =
      if (fs.getScheme == "file")
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(target.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          fs.delete(tmp, false)
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      else !fs.exists(target) && fs.rename(tmp, target)
  }

  /** Resolve the session's log store: the configured class, else the
    * built-in dispatch. Misconfiguration fails loudly at first use —
    * a silent fallback would run a different atomicity protocol than
    * the one the operator asked for.
    */
  def resolve(spark: SparkSession): GraftLogStore =
    spark.conf.getOption(ConfKey).filter(_.nonEmpty) match {
      case None => Default
      case Some(cn) =>
        try Class.forName(cn).getDeclaredConstructor().newInstance()
          .asInstanceOf[GraftLogStore]
        catch {
          case e: Exception => throw new IllegalArgumentException(
            s"$ConfKey = $cn could not be instantiated as a " +
              "graft.sources.GraftLogStore (no-arg constructor required)", e)
        }
    }
}
