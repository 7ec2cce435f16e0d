package graft.jobs

/** Constants the reference bakes into code, lifted into job configuration
  * (SURVEY.md §2.12 "Constants baked into semantics").
  *
  * @param electoralEventId  reference/SANEF_Uploader.py:25 (`'1091'`, also
  *                          hard-coded as an int inside SQL at :393)
  * @param delimitationId    reference/SANEF_Uploader.py:398 (`pkfklDelimID = 78`)
  * @param councillorProvinces provinces fetched for ward_councillor_elected
  *                          (reference/SANEF_Uploader.py:520 — `[1]`)
  */
final case class JobConfig(
    electoralEventId: Int = 1091,
    delimitationId: Int = 78,
    councillorProvinces: Seq[Int] = Seq(1))

object JobConfig {

  /** Province ID → code decode (reference/SANEF_Uploader.py:226, repeated
    * verbatim at :281,:348). Keys are strings because the reference decodes
    * AFTER `astype(str)` — the map is data, not code, so jobs join against
    * the broadcast 9-row frame built from this.
    */
  val provinceCodes: Map[String, String] = Map(
    "1" -> "EC", "2" -> "FS", "3" -> "GT", "4" -> "KZN", "5" -> "MP",
    "6" -> "NC", "7" -> "LIM", "8" -> "NW", "9" -> "WC")
}
