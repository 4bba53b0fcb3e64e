package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared numeric-parity helpers: doubles aggregate through
  * DECIMAL(18,2) so parallel summation order cannot change the result,
  * then cast back to DOUBLE for schema parity with the DuckDB oracle.
  * One definition so the convention cannot drift between query files.
  */
private[queries] object QueryUtil {
  def dec(c: Column): Column = c.cast("decimal(18,2)")
  def dsum(c: Column): Column = sum(dec(c)).cast("double")
}
