package graft.schema

import org.apache.spark.sql.types._

/** Parser for the reference's `useColumns` spec (`columnMethod=explicit`):
  * a comma-separated list of `name[:type]` entries that simultaneously
  * positionally renames the file's columns, selects (blank entries drop
  * that file position), and casts (csvplayback.py:601-649;
  * docs/index.rst:82-114).
  *
  * Closed type map (csvplayback.py:607-613):
  * str→String, int→Long, float→Double, bool→Boolean,
  * timestamp→Timestamp.
  */
object UseColumns {

  val typeMap: Map[String, DataType] = Map(
    "str" -> StringType,
    "int" -> LongType,
    "float" -> DoubleType,
    "bool" -> BooleanType,
    "timestamp" -> TimestampType)

  /** @param names      positional labels for the file's columns; "" = drop
    *                   that file position
    * @param dtypes     explicit casts for a subset of the kept names
    */
  final case class Spec(names: Seq[String], dtypes: Map[String, DataType]) {
    /** Kept column names, in file-position order (usecols semantics,
      * csvplayback.py:642). */
    def selected: Seq[String] = names.filter(_.nonEmpty)
    def isEmpty: Boolean = names.isEmpty
  }

  /** Parses the spec. Mirrors reference failure modes: an unknown type
    * name raises (TypeError, csvplayback.py:626-628), a `a:b:c` entry
    * raises (ValueError, csvplayback.py:631-633). Blank entries are
    * legal and mark dropped positions (csvplayback.py:619-620). */
  def parse(spec: String): Spec = {
    if (spec.isEmpty) return Spec(Nil, Map.empty)
    val entries = spec.split(",", -1).toSeq
    val hasType = spec.contains(':')
    if (!hasType) Spec(entries, Map.empty)
    else {
      val dtypes = Map.newBuilder[String, DataType]
      val names = entries.map {
        case "" => ""
        case e =>
          e.split(":", -1) match {
            case Array(n) => n
            case Array(n, t) =>
              typeMap.get(t) match {
                case Some(dt) => dtypes += n -> dt; n
                case None =>
                  throw new IllegalArgumentException(
                    s"$t must be in [str, int, float, timestamp, bool]")
              }
            case parts =>
              throw new IllegalArgumentException(
                s"${parts.mkString(":")} must be of the form <name>:<type>")
          }
      }
      Spec(names, dtypes.result())
    }
  }
}
