package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Cluster-wide engine integration via the public
  * `SparkSessionExtensions` API — the deployment path that needs no
  * user code at all:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * // or programmatically:
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * }}}
  *
  * Every session created with the config gets the engine's SQL
  * function surface (is_utf8, format_kind, extract_strings,
  * minhash_signature, simhash64, fingerprint, explode_archive)
  * injected at build time — unlike
  * [[graft.functions.GraftFunctions.register]], which is session-scoped
  * and must be called per session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.sqlBuilders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
}
