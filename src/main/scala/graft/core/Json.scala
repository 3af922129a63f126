package graft.core

import org.json4s.{Formats, NoTypeHints}
import org.json4s.jackson.Serialization

/** JSON (de)serialization for table metadata. Uses json4s-jackson, which
  * ships on the Spark classpath — no extra dependency.
  *
  * Metadata stays human-readable JSON (like the reference's commit files,
  * cf. reference hudi-common/.../HoodieCommitMetadata.java) so tables are
  * debuggable with `cat`.
  */
object Json {
  implicit val formats: Formats = Serialization.formats(NoTypeHints)

  def write[A <: AnyRef](a: A): String = Serialization.write(a)
  def writePretty[A <: AnyRef](a: A): String = Serialization.writePretty(a)
  def read[A](s: String)(implicit mf: Manifest[A]): A = Serialization.read[A](s)
}
