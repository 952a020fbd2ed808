package graft.meta

/** Catalog metadata push — the reference's CKAN / dados.gov.br clients
  * (hooks/ckan_hook.py:37-81, hooks/dadosgovbr_hook.py:106-237) as trait
  * interfaces (SURVEY §7.2 step 7): dataset patch + create-or-update of a
  * resource matched by URL. The HTTP transport lives behind the trait;
  * the engine supplies dataset/resource descriptions (e.g. from
  * `DataDictionary`/`CommentSync`).
  */
object CatalogPush {

  final case class Resource(url: String, name: String, format: String,
      description: String = "")
  final case class DatasetPatch(datasetId: String,
      fields: Map[String, String])

  trait CatalogClient {
    /** Partial-update dataset metadata (CKAN package_patch semantics). */
    def patchDataset(patch: DatasetPatch): Unit
    /** Create the resource, or update the existing one with the same URL
      * (ckan_hook.py:56-78 match-by-url). */
    def upsertResource(datasetId: String, resource: Resource): Unit
    def resources(datasetId: String): Seq[Resource]
  }

  /** In-memory fake for tests/offline development. */
  final class InMemoryCatalog extends CatalogClient {
    private val data = scala.collection.mutable.Map[String, Map[String, String]]()
    private val res = scala.collection.mutable.Map[String, Vector[Resource]]()

    def patchDataset(patch: DatasetPatch): Unit =
      data(patch.datasetId) =
        data.getOrElse(patch.datasetId, Map.empty) ++ patch.fields

    def upsertResource(datasetId: String, resource: Resource): Unit = {
      val existing = res.getOrElse(datasetId, Vector.empty)
      val (same, others) = existing.partition(_.url == resource.url)
      res(datasetId) = others :+ (if (same.nonEmpty) resource else resource)
    }

    def resources(datasetId: String): Seq[Resource] =
      res.getOrElse(datasetId, Vector.empty)

    def dataset(datasetId: String): Map[String, String] =
      data.getOrElse(datasetId, Map.empty)
  }
}
