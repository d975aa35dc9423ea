package graft.mr

/**
 * The user-defined-function surface of the engine: a MapReduce "app".
 *
 * Mirrors the reference's `App` trait (`common/src/lib.rs:5-8`):
 * {{{
 *   fn map(&self, k1: String, v1: String) -> Vec<(String, String)>;
 *   fn reduce(&self, k2: String, v2s: Vec<String>) -> String;
 * }}}
 *
 * Semantics contract (see SURVEY.md §1):
 *  - `map` is a UDTF: one input record (in the reference, one whole file:
 *    key = path, value = contents) produces zero or more KV pairs.
 *  - `reduce` is a *holistic* UDAF: it receives the complete value list for
 *    a key, **sorted lexicographically** (the reference sorts the full
 *    `(k, v)` pair list before grouping — `sequential/src/main.rs:30`,
 *    `worker.rs:174` — so value order within a key is a load-bearing,
 *    observable guarantee; the bundled indexer app depends on it).
 *  - Keys must not contain whitespace if the line-text sink is used
 *    (the reference's intermediate format is `"{k} {v}\n"` re-parsed by
 *    `split_whitespace` — `worker.rs:43-47,156-162`).
 */
trait MrApp extends Serializable {
  /** Registry name, mirroring the reference's dylib name (`-a app_wc`). */
  def name: String

  /** UDTF: one input record to N intermediate KV pairs. */
  def map(key: String, value: String): Seq[(String, String)]

  /** Holistic UDAF: complete, lexicographically sorted value list. */
  def reduce(key: String, values: Seq[String]): String
}

/**
 * App registry — the Spark-native stand-in for the reference's runtime
 * dylib loader (`common/src/lib.rs:22-39`, `declare_app!` macro `:12-20`).
 * On Spark, user code ships in the application jar, so dynamic symbol
 * resolution degenerates to a name -> instance map (SURVEY.md §2.1 E11).
 */
object MrApps {
  private val builtin: Map[String, MrApp] = Seq(
    graft.mr.apps.WordCountApp,
    graft.mr.apps.InvertedIndexApp,
    graft.mr.apps.SortedConcatApp
  ).map(a => a.name -> a).toMap

  @volatile private var extra: Map[String, MrApp] = Map.empty

  /** Register an app at runtime (tests, user extensions). */
  def register(app: MrApp): Unit = synchronized { extra += app.name -> app }

  def load(name: String): MrApp =
    extra.getOrElse(
      name,
      builtin.getOrElse(
        name,
        throw new NoSuchElementException(
          s"unknown MR app '$name'; known: ${(builtin.keySet ++ extra.keySet).toSeq.sorted.mkString(", ")}")))

  def names: Seq[String] = (builtin.keySet ++ extra.keySet).toSeq.sorted
}
