package graft

import graft.model.MetadataEntry
import java.sql.Timestamp

/** Deterministic 10-entry corpus mirroring the reference's canonical example
  * data value domains (reference: tools/local_index_setup.py:33-34,93-116 —
  * 8 categories, 3 orgs, CSV format, hdfs targets). Values synthesized, not
  * copied; assertions in the specs are hand-computed over THIS corpus.
  */
object Fixtures {
  private def ts(s: String) = Timestamp.valueOf(s)

  val corpus: Seq[MetadataEntry] = Seq(
    MetadataEntry("0", "health", ts("2015-02-13 10:00:00"), "ID,Heart,Rate", "csv",
      isPublic = true, "org01", 100, 500000, "http://data.example.com/heart",
      "hdfs://nameservice1/org/intel/hdfsbroker/userspace/db0/heart/000000_1", "Heart disease rates"),
    MetadataEntry("1", "finance", ts("2015-03-01 09:30:00"), "ID,Price,Volume", "csv",
      isPublic = false, "org01", 2000, 900000, "http://market.example.com/stocks",
      "hdfs://nameservice1/org/intel/hdfsbroker/userspace/db1/stocks/000000_1", "Stock market prices"),
    MetadataEntry("2", "agriculture", ts("2015-04-20 14:00:00"), "ID,Crop,Yield", "csv",
      isPublic = true, "org02", 340, 120000, "http://farm.example.com/crops",
      "hdfs://nameservice1/org/intel/hdfsbroker/userspace/db2/crops/000000_1", "Crop yields by county"),
    MetadataEntry("3", "science", ts("2015-05-05 08:15:00"), "ID,Star,Magnitude", "json",
      isPublic = false, "org02", 99000, 4000000, "ftp://space.example.org/stars",
      "hdfs://nameservice1/org/intel/hdfsbroker/userspace/db3/stars/000000_1", "Star catalog"),
    MetadataEntry("4", "energy", ts("2015-06-10 11:45:00"), "ID,Plant,Output", "csv",
      isPublic = true, "org03", 55, 80000, "http://power.example.com/plants",
      "hdfs://nameservice1/org/intel/hdfsbroker/userspace/db4/plants/000000_1", "Power plant output"),
    MetadataEntry("5", "business", ts("2015-07-21 16:20:00"), "ID,Company,Revenue", "csv",
      isPublic = false, "org03", 780, 250000, "http://biz.example.com/revenue",
      "hdfs://nameservice1/org/intel/hdfsbroker/userspace/db5/revenue/000000_1", "Company revenues"),
    MetadataEntry("6", "consumer", ts("2015-08-02 10:10:00"), "ID,Product,Rating", "json",
      isPublic = true, "org01", 4300, 620000, "http://shop.example.com/ratings",
      "hdfs://nameservice1/org/intel/hdfsbroker/userspace/db6/ratings/000000_1", "Product ratings"),
    MetadataEntry("7", "education", ts("2015-09-15 13:00:00"), "ID,School,Score", "csv",
      isPublic = false, "org02", 150, 95000, "http://edu.example.com/scores",
      "hdfs://nameservice1/org/intel/hdfsbroker/userspace/db7/scores/000000_1", "School test scores"),
    MetadataEntry("8", "health", ts("2015-10-30 09:00:00"), "ID,Disease,Cases", "csv",
      isPublic = true, "org02", 61, 45000, "http://who.example.org/cases",
      "hdfs://nameservice1/org/intel/hdfsbroker/userspace/db8/cases/000000_1", "Disease case counts"),
    MetadataEntry("9", "finance", ts("2015-11-11 17:30:00"), "ID,Loan,Amount", "csv",
      isPublic = true, "org03", 920, 310000, "http://bank.example.com/loans",
      "hdfs://nameservice1/org/intel/hdfsbroker/userspace/db9/loans/000000_1", "Loan amounts")
  )
}
