package graft.mr

/**
 * A test-classpath-only app published through the ServiceLoader channel
 * (`src/test/resources/META-INF/services/graft.mr.MrApp`) and NOT in the
 * compiled-in registry — the stand-in for a user's `--jars` app jar, as
 * the reference's test apps are separate cdylibs the worker dlopens by
 * name (`common/src/lib.rs:22-39`). Computes per-key maximum value
 * length, something no builtin app does.
 */
class ServiceLoadedApp extends MrApp {
  override def name: String = "svc_maxlen"
  override def map(key: String, value: String): Seq[(String, String)] =
    value.split("\\s+").filter(_.nonEmpty).map(w => (w.take(1), w)).toSeq
  override def reduce(key: String, values: Seq[String]): String =
    values.map(_.length).max.toString
}
