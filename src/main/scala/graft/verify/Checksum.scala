package graft.verify

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}

/** Table checksum triple, mirroring the reference's verification value
  * (reference `lightning/verification/checksum.go:27-93`): a CRC64
  * combined by XOR plus KV count and byte size. XOR+sum+count are all
  * commutative/associative, so the aggregate is order- and
  * partitioning-independent — it distributes over any shuffle layout,
  * which is exactly why the reference chose it and why it scales to
  * 100 TB without a sort.
  */
case class KvChecksum(checksum: Long, totalKvs: Long, totalBytes: Long) {
  def add(o: KvChecksum): KvChecksum =
    KvChecksum(checksum ^ o.checksum, totalKvs + o.totalKvs, totalBytes + o.totalBytes)
}

/** Aggregator over a canonical per-row byte serialization. */
object ChecksumAgg extends Aggregator[Array[Byte], KvChecksum, KvChecksum] {
  override def zero: KvChecksum = KvChecksum(0L, 0L, 0L)
  override def reduce(b: KvChecksum, a: Array[Byte]): KvChecksum =
    KvChecksum(b.checksum ^ Crc64.checksum(a), b.totalKvs + 1, b.totalBytes + a.length)
  override def merge(b1: KvChecksum, b2: KvChecksum): KvChecksum = b1.add(b2)
  override def finish(r: KvChecksum): KvChecksum = r
  override def bufferEncoder: Encoder[KvChecksum] = Encoders.product[KvChecksum]
  override def outputEncoder: Encoder[KvChecksum] = Encoders.product[KvChecksum]
}

object Checksum {

  /** Canonical row serialization: JSON of the row struct with fields in
    * lexicographic column order. Deterministic for a given session
    * timezone (UTC) and invariant under a parquet write/read round
    * trip, which is what end-to-end verification needs (reference
    * compares local vs remote checksums the same way,
    * `lightning/restore/restore.go:2194-2213`).
    */
  def canonicalBytes(df: DataFrame): Column = {
    val cols = df.columns.sorted.map(c => col(c))
    encode(to_json(struct(cols.toSeq: _*)), "UTF-8")
  }

  /** The checksum triple as a single aggregate Column over `df`'s rows,
    * for `df.observe(...)`: the metric rides the write pass, so ingest
    * computes the pre-write checksum without a second scan (reference
    * computes checksums inside the one encode pass the same way,
    * `lightning/restore/restore.go:2382-2480`).
    *
    * IMPORTANT: the observation must be attached ABOVE any shuffle
    * boundary (e.g. after `repartitionByRange`). A RangePartitioner
    * runs a sampling job that executes the plan *below* the exchange a
    * second time, double-counting any metric observed there (each
    * row's CRC64 XORs twice → checksum cancels to 0). Post-shuffle the
    * plan executes exactly once. See [[graft.sink.SortedParquetSink.writeObserved]].
    */
  def checksumCol(df: DataFrame): Column = {
    val f = udaf(ChecksumAgg)
    f(canonicalBytes(df)).as("kv_checksum")
  }

  /** Extract the [[KvChecksum]] from an observed [[checksumCol]] metric. */
  def fromMetric(m: Any): KvChecksum = {
    val r = m.asInstanceOf[org.apache.spark.sql.Row]
    KvChecksum(r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** One-row DataFrame (checksum, total_kvs, total_bytes) for a table. */
  def tableChecksum(df: DataFrame): DataFrame = {
    val agg = udaf(ChecksumAgg)
    df.select(canonicalBytes(df).as("kv"))
      .agg(agg(col("kv")).as("c"))
      .select(
        col("c.checksum").as("checksum"),
        col("c.totalKvs").as("total_kvs"),
        col("c.totalBytes").as("total_bytes"))
  }

  /** Compare two checksums, reference `compareChecksum` semantics. */
  def matches(a: KvChecksum, b: KvChecksum): Boolean = a == b
}
