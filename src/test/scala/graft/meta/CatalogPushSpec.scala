package graft.meta

import java.sql.Timestamp

import graft.SparkSpec
import graft.sources.FileDrop

class CatalogPushSpec extends SparkSpec {

  test("catalog upsert matches resources by URL (create-or-update)") {
    val cat = new CatalogPush.InMemoryCatalog
    cat.patchDataset(CatalogPush.DatasetPatch("ds1", Map("title" -> "T")))
    cat.patchDataset(CatalogPush.DatasetPatch("ds1", Map("notes" -> "N")))
    assert(cat.dataset("ds1") == Map("title" -> "T", "notes" -> "N"))

    cat.upsertResource("ds1", CatalogPush.Resource("http://x/a.csv", "a", "CSV"))
    cat.upsertResource("ds1", CatalogPush.Resource("http://x/b.csv", "b", "CSV"))
    // same URL -> update, not duplicate
    cat.upsertResource("ds1", CatalogPush.Resource("http://x/a.csv", "a2", "CSV"))
    val rs = cat.resources("ds1")
    assert(rs.length == 2)
    assert(rs.find(_.url == "http://x/a.csv").get.name == "a2")
  }

  test("file-drop newest selection is max_by availability timestamp") {
    val listing = new FileDrop.DropListing {
      def list(from: Timestamp, to: Timestamp): Seq[FileDrop.Entry] = Seq(
        FileDrop.Entry("p1", "f1", Timestamp.valueOf("2024-01-01 10:00:00")),
        FileDrop.Entry("p2", "f2", Timestamp.valueOf("2024-01-01 12:00:00")),
        FileDrop.Entry("p3", "f3", Timestamp.valueOf("2024-01-01 11:00:00")))
    }
    val n = FileDrop.newest(spark, listing,
      Timestamp.valueOf("2024-01-01 00:00:00"),
      Timestamp.valueOf("2024-01-02 00:00:00"))
    assert(n.map(_.protocol).contains("p2"))

    val empty = new FileDrop.DropListing {
      def list(from: Timestamp, to: Timestamp): Seq[FileDrop.Entry] = Seq.empty
    }
    assert(FileDrop.newest(spark, empty,
      Timestamp.valueOf("2024-01-01 00:00:00"),
      Timestamp.valueOf("2024-01-02 00:00:00")).isEmpty)
  }
}
