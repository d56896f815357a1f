package graft.gen

import graft.model._
import graft.util.Rand
import org.apache.spark.sql.{Dataset, SparkSession}

/** Generator parameters. Everything is a pure function of (seed, seq), so the
  * produced changelog is byte-identical regardless of Spark parallelism.
  *
  * The shape mirrors what the reference replicates from MySQL — a stream of
  * keyed insert/update/delete row events plus sparse DDL
  * (/root/reference/event/event.go:18-24, event/functions.go:17-61) — recast
  * onto the north-rule key (repo, path) with a power-law ("Zipf-ish") hot-repo
  * skew so the skew-handling path is actually exercised.
  *
  * @param nEvents      total events (incl. DDL)
  * @param nRepos       distinct repos
  * @param pathsPerRepo distinct paths per repo
  * @param skew         power-law exponent for repo pick: repoIdx =
  *                     floor(nRepos * u^skew); skew=1 ⇒ uniform, 3-5 ⇒ hot head
  * @param nPartitions  log partitions (events of one repo always land in one
  *                     partition, like binlog-per-upstream ordering)
  * @param ddlEvery     emit one DDL event every `ddlEvery` events (0 = none)
  * @param contentLen   approximate content length in chars
  * @param pInsert/pUpdate  op mix; pDelete = 1 - pInsert - pUpdate
  */
case class GenConfig(
    seed: Long = 42L,
    nEvents: Long = 1000000L,
    nRepos: Int = 200,
    pathsPerRepo: Int = 50,
    skew: Double = 3.0,
    nPartitions: Int = 8,
    ddlEvery: Long = 0L,
    contentLen: Int = 160,
    pInsert: Double = 0.6,
    pUpdate: Double = 0.25) {
  def nKeys: Long = nRepos.toLong * pathsPerRepo
}

object ChangelogGen {
  private val langs = Array("scala", "go", "py", "rs", "java", "md", "c", "ts")
  private val words = Array(
    "def", "val", "match", "case", "class", "object", "import", "return",
    "stream", "merge", "commit", "offset", "schema", "table", "event",
    "partition", "replay", "binlog", "upsert", "lineage", "fence", "snapshot")

  def repoName(i: Int): String = f"org/project-$i%05d"
  def pathName(i: Int): String = f"src/dir${i % 16}%02d/file-$i%05d.txt"

  /** Deterministic pseudo-text content for (repo, path) at log position seq. */
  def content(cfg: GenConfig, repo: String, path: String, seq: Long): String = {
    val base = Rand.mix64(Rand.hash64(repo) ^ Rand.hash64(path) ^ Rand.mix(cfg.seed, 7, seq))
    val sb = new StringBuilder(cfg.contentLen + 16)
    sb.append("// ").append(repo).append('/').append(path).append(" @").append(seq).append('\n')
    var i = 0L
    while (sb.length < cfg.contentLen) {
      sb.append(words(Rand.nextInt(base, 8, i, words.length))).append(' ')
      i += 1
    }
    sb.result()
  }

  def isDdlSeq(cfg: GenConfig, seq: Long): Boolean =
    cfg.ddlEvery > 0 && seq % cfg.ddlEvery == cfg.ddlEvery - 1

  /** Scripted, cycling DDL program: add int column → widen it to long →
    * rename it (the three evolutions the north rule names). d = 0-based index
    * of this DDL event in the stream. */
  def ddlOp(d: Long): DdlOp = {
    val gen = d / 3
    (d % 3) match {
      case 0 => DdlOp("add_column", s"x$gen", null, null, "int")
      case 1 => DdlOp("widen_type", s"x$gen", null, "int", "long")
      case _ => DdlOp("rename_column", s"x$gen", s"y$gen", null, null)
    }
  }

  /** The event at global log position seq — a pure function of (cfg, seq). */
  def eventAt(cfg: GenConfig, seq: Long): ChangeEvent = {
    val ts = new java.sql.Timestamp(1704067200000L + seq * 1000L) // 2024-01-01 + seq sec
    if (isDdlSeq(cfg, seq)) {
      val d = seq / cfg.ddlEvery // DDL index (0-based)
      ChangeEvent(0, seq, seq, ts, Ops.Ddl, null, null, None, None, Some(ddlOp(d)))
    } else {
      val u = Rand.uniform(cfg.seed, 1, seq)
      val repoIdx = math.min(cfg.nRepos - 1, (cfg.nRepos * math.pow(u, cfg.skew)).toInt)
      val pathIdx = Rand.nextInt(cfg.seed, 2, seq, cfg.pathsPerRepo)
      val repo = repoName(repoIdx)
      val path = pathName(pathIdx)
      val opU = Rand.uniform(cfg.seed, 3, seq)
      val op =
        if (opU < cfg.pInsert) Ops.Insert
        else if (opU < cfg.pInsert + cfg.pUpdate) Ops.Update
        else Ops.Delete
      val lang = langs((Rand.hash64(repo + path) & 0x7fffffffL).toInt % langs.length)
      val commitId = Rand.hex(Rand.mix(cfg.seed, 4, seq))
      val after = RepoRow(repo, path, commitId, lang, content(cfg, repo, path, seq))
      // Before-image: a deterministic stand-in for the pre-change row (the
      // engine keys on (repo, path); the before image matters for the no-PK
      // fallback and diff semantics, not for keyed MERGE).
      val before = RepoRow(repo, path, Rand.hex(Rand.mix(cfg.seed, 5, seq)), lang,
        content(cfg, repo, path, seq - 1))
      val partition = (java.lang.Long.remainderUnsigned(Rand.hash64(repo), cfg.nPartitions.toLong)).toInt
      op match {
        case Ops.Insert => ChangeEvent(partition, seq, seq, ts, op, repo, path, None, Some(after), None)
        case Ops.Update => ChangeEvent(partition, seq, seq, ts, op, repo, path, Some(before), Some(after), None)
        case _          => ChangeEvent(partition, seq, seq, ts, op, repo, path, Some(before), None, None)
      }
    }
  }

  /** Distributed generation as a typed Dataset. */
  def events(spark: SparkSession, cfg: GenConfig): Dataset[ChangeEvent] = {
    import spark.implicits._
    spark.range(0L, cfg.nEvents).map(seq => eventAt(cfg, seq))
  }

  /** Driver-side generation for small-scale tests / the oracle. */
  def eventsLocal(cfg: GenConfig): Seq[ChangeEvent] =
    (0L until cfg.nEvents).map(seq => eventAt(cfg, seq))
}
