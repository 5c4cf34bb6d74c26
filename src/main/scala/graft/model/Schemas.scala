package graft.model

/** Typed request model (SURVEY.md §1.1; shape captured from the reference's
  * golden request, `queue/doc_test.py:12-96`). Encoders derive from these
  * case classes; `filters` maps to Spark `MapType(String, Array(String))`.
  */
final case class Boundary(
    name: String,
    title: String = "",
    group: String = "")

/** One release (aid-data) selection: filtered project-location extract via
  * the msr path. `hash` is written back after descriptor hashing (Q4). */
final case class ReleaseSelection(
    dataset: String,
    custom_name: String = "",
    filters: Map[String, Seq[String]] = Map.empty,
    hash: Option[String] = None)

final case class RasterFile(name: String, path: String = "")

/** One raster selection: `files × extract_types` extracts (F18). */
final case class RasterSelection(
    name: String,
    extract_types: Seq[String],
    files: Seq[RasterFile],
    temporal_type: String = "year")

final case class StageTime(name: String, time: Long)

/** A DET request document. Status codes: -2 error, -1 new, 0 waiting,
  * 1 complete, 2 processing (`queue/request_tools.py:153-159`). */
final case class Request(
    id: String,
    boundary: Boundary,
    release_data: Seq[ReleaseSelection] = Seq.empty,
    raster_data: Seq[RasterSelection] = Seq.empty,
    email: String = "",
    custom_name: String = "",
    status: Int = -1,
    priority: Int = 0,
    stage: Seq[StageTime] = Seq.empty)

/** Dataset catalog entry (`asdf.data` analog, consumed for doc_meta). */
final case class DatasetMeta(
    name: String,
    title: String = "",
    version: String = "",
    dtype: String = "raster",
    file_format: String = "",
    temporal_start: Option[Int] = None,
    temporal_end: Option[Int] = None)

/** A unit of cacheable work derived from a request selection. The cache
  * `key` is boundary-qualified (zonal output is per-boundary — the
  * reference keys extracts by boundary name separately from the
  * boundary-free msr surface hash, `queue/request_tools.py:436-441`);
  * `filters` carry the normalized filter algebra to apply at compute time. */
final case class WorkItem(
    requestId: String,
    dataset: String,
    kind: String,              // "release" (msr) | "raster"
    temporal: String,          // year, "none", or hash7 for msr
    method: String,            // extract method
    key: String,               // canonical-JSON SHA-1 cache key (incl. boundary)
    filters: Map[String, Seq[String]] = Map.empty)
