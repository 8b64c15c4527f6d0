package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

/** Test fixture: a minimal DSv2 batch source that deliberately does NOT
  * implement SupportsPushDownFilters — the classic custom-source
  * omission PlanLint's `unpushed-filter` rule exists to catch (a
  * convertible predicate is left evaluating above a BatchScan that
  * pushed nothing). Emits 3 fixed (id: long) rows.
  */
class NoPushdownSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    NoPushdownSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new Table with SupportsRead {
      override def name(): String = "no_pushdown_fixture"
      override def schema(): StructType = NoPushdownSource.schema
      override def capabilities(): java.util.Set[TableCapability] =
        Set(TableCapability.BATCH_READ).asJava
      override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
        new ScanBuilder { // no SupportsPushDownFilters — the point
          override def build(): Scan = new Scan {
            override def readSchema(): StructType = NoPushdownSource.schema
            override def toBatch: Batch = new Batch {
              override def planInputPartitions(): Array[InputPartition] =
                Array(new InputPartition {})
              override def createReaderFactory(): PartitionReaderFactory =
                new PartitionReaderFactory {
                  override def createReader(p: InputPartition)
                      : PartitionReader[InternalRow] =
                    new PartitionReader[InternalRow] {
                      private var i = -1
                      override def next(): Boolean = { i += 1; i < 3 }
                      override def get(): InternalRow =
                        InternalRow(Seq(1L, 5L, 9L)(i))
                      override def close(): Unit = ()
                    }
                }
            }
          }
        }
    }
}

object NoPushdownSource {
  val schema: StructType = StructType.fromDDL("id BIGINT")
}
