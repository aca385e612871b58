package graft.ingest

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.types.StructType

/** Typed input record for the scholarly-works ingestion dataflow
  * (reference ingestion/schema.py:20-29): every field optional, unknown
  * upstream fields dropped. The Spark analog of pydantic's
  * `extra="ignore"` is simply a `from_json` against this closed schema —
  * fields not in the schema are never materialized, missing ones are NULL.
  */
final case class VenueRef(display_name: Option[String])
final case class AuthorRef(display_name: Option[String])
final case class AuthorshipRef(author: Option[AuthorRef])

final case class OpenAlexWork(
    id: Option[String],
    doi: Option[String],
    title: Option[String],
    publication_year: Option[Int],
    host_venue: Option[VenueRef],
    authorships: Option[Seq[AuthorshipRef]],
    email: Option[String])

object OpenAlexWork {
  /** Closed parse schema — the boundary contract (PERMISSIVE mode: bad
    * rows produce NULL structs rather than failing the job).
    */
  val schema: StructType = Encoders.product[OpenAlexWork].schema
}
