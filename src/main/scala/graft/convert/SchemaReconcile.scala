package graft.convert

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** A8: reconcile a source DataFrame onto a destination schema, the image of
  * the reference binding its JsonStreamWriter to the target table's schema
  * with `setIgnoreUnknownFields(true)` (BigqueryStreamWriter.java:192-211):
  *
  *   - source columns absent from the target are silently dropped
  *     (unknown-field tolerance);
  *   - target fields present in the source are cast to the target type;
  *   - a non-nullable target field missing from the source is an error at
  *     plan time (the reference surfaces this per-row as an
  *     AppendSerializtionError; with a declared schema we can fail fast).
  */
object SchemaReconcile {
  def reconcile(df: DataFrame, target: StructType): DataFrame = {
    val source = df.schema.fieldNames.toSet
    val missingRequired = target.fields
      .filter(f => !f.nullable && !source.contains(f.name)).map(_.name)
    require(missingRequired.isEmpty,
      s"non-nullable target fields absent from source: ${missingRequired.mkString(", ")}")
    val cols = target.fields.filter(f => source.contains(f.name))
      .map(f => col(f.name).cast(f.dataType).as(f.name))
    df.select(cols.toIndexedSeq: _*)
  }
}
