package graft.kv

import org.apache.hadoop.conf.Configuration

/** ONE shared Hadoop Configuration for driver-side FS metadata work.
  *
  * r20 optimization (guide §1.2: find where the time goes): every commit
  * protocol call site used to build `new Configuration()`, which re-parses
  * the default XML resources per instance — measured 8.2 ms/call vs
  * 0.12 ms with a shared instance on this box. The store-lifecycle
  * queries (kv12/kv13/kv18/kv21, u22, u55/u60/u62/u63, streaming sinks)
  * run tens of such calls per query — sequential commit protocol, so the
  * parse cost was pure serial driver latency (~0.3-0.5 s/query).
  *
  * The instance is only ever used for `Path.getFileSystem` resolution of
  * the stores' own paths (local/posix in the bench contract; at scale,
  * whatever fs.defaultFS the deployment ships in its classpath XML —
  * exactly what `new Configuration()` loaded). Treated as read-only:
  * nothing mutates it after construction. Call sites that HAVE a
  * SparkSession in hand should keep using
  * `sparkContext.hadoopConfiguration` (session-scoped overrides win);
  * this singleton is the static-context replacement for the fresh
  * default-resource instances only.
  */
object HadoopConf {
  lazy val get: Configuration = new Configuration()
}
