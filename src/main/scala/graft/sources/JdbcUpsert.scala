package graft.sources

import java.sql.{Connection, DriverManager, PreparedStatement, SQLException, Types}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** S5/S6: the JDBC upsert sink — the reference's store IS Postgres, fed
  * with `INSERT … ON CONFLICT (link) DO NOTHING` (collect/consumer.py:81
  * via sqlalchemy `on_conflict_do_nothing`, collect/consumer2.py:113
  * Flink JDBC DDL). This is the actual JDBC writer behind that
  * semantics; [[graft.news.Lake.upsertByLink]] keeps the same contract
  * on parquet for DB-less deployments.
  *
  * Design for scale: the write is `foreachPartition` — one connection
  * and one prepared statement per partition, rows streamed through
  * `addBatch`/`executeBatch` (no driver-side collect, no per-row
  * round-trips). Conflict-skip is pushed into the database statement
  * itself (the dialect), so at-least-once delivery upstream (Kafka
  * replays, speculative tasks, foreachBatch retries) lands as
  * exactly-once-effect in the table — idempotence lives in the SQL, not
  * in fragile read-before-write checks.
  *
  * Dialects: conflict-skip syntax is engine-specific, so it hangs off a
  * small trait. [[PostgresUpsertDialect]] matches the reference wire-
  * for-wire; [[DerbyUpsertDialect]] (MERGE-based) exists because Derby
  * is the JDBC engine available in-sandbox, which lets the spec prove
  * idempotent replay through a REAL connection rather than a mock.
  */
object JdbcUpsert {

  /** Engine-specific insert-if-absent statement.
    * Returns the SQL plus the column names in bind order (dialects
    * differ: Postgres binds the insert row once; Derby's MERGE binds
    * the key columns in the ON clause first, then the insert row). */
  trait UpsertDialect extends Serializable {
    def insertIgnore(table: String, cols: Seq[String], keys: Seq[String]): (String, Seq[String])
    /** True when the engine is an EMBEDDED store whose DML is not safe
      * under concurrent same-JVM writers, so partition writes must be
      * serialized within the JVM. Found the hard way (r13, 9/50 loop
      * failures): Derby 10.16's MERGE under two concurrent local-mode
      * tasks either corrupts engine state loudly
      * (`BaseContainerHandle.deleteObserver … "this.owner" is null`,
      * surfaced as a BatchUpdateException) or — worse — loses one or
      * both committed-looking transactions SILENTLY; the statement log
      * shows both MERGEs executing and no error. A client-side
      * protocol cannot defend against an engine that mis-commits, so
      * the embedded dialect declares itself serialize-only; a server
      * engine (Postgres) keeps full partition parallelism. */
    def serializeInJvm: Boolean = false
  }

  /** The reference's exact statement shape (collect/consumer.py:81). */
  object PostgresUpsertDialect extends UpsertDialect {
    def insertIgnore(table: String, cols: Seq[String], keys: Seq[String]): (String, Seq[String]) = {
      val sql = s"INSERT INTO $table (${cols.mkString(", ")}) " +
        s"VALUES (${cols.map(_ => "?").mkString(", ")}) " +
        s"ON CONFLICT (${keys.mkString(", ")}) DO NOTHING"
      (sql, cols)
    }
  }

  /** Derby ≥10.11 has MERGE but no ON CONFLICT; WHEN NOT MATCHED
    * expresses the same insert-if-absent. Serialized in-JVM: see
    * [[UpsertDialect.serializeInJvm]] — embedded Derby's MERGE loses
    * transactions under concurrent same-JVM writers. */
  object DerbyUpsertDialect extends UpsertDialect {
    def insertIgnore(table: String, cols: Seq[String], keys: Seq[String]): (String, Seq[String]) = {
      val on = keys.map(k => s"t.$k = ?").mkString(" AND ")
      val sql = s"MERGE INTO $table t USING SYSIBM.SYSDUMMY1 ON ($on) " +
        s"WHEN NOT MATCHED THEN INSERT (${cols.mkString(", ")}) " +
        s"VALUES (${cols.map(_ => "?").mkString(", ")})"
      (sql, keys ++ cols)
    }
    override def serializeInJvm: Boolean = true
  }

  /** JVM-wide write gate for [[UpsertDialect.serializeInJvm]] dialects
    * (embedded engines share one in-process store, so this IS the
    * engine-level arbiter the server engines have built in). */
  private object JvmWriteGate

  private def sqlType(dt: DataType): Int = dt match {
    case StringType => Types.VARCHAR
    case LongType => Types.BIGINT
    case IntegerType => Types.INTEGER
    case ShortType => Types.SMALLINT
    case DoubleType => Types.DOUBLE
    case FloatType => Types.FLOAT
    case BooleanType => Types.BOOLEAN
    case TimestampType => Types.TIMESTAMP
    case DateType => Types.DATE
    case BinaryType => Types.BINARY
    case _: DecimalType => Types.DECIMAL
    case _ => Types.OTHER
  }

  private def bind(ps: PreparedStatement, i: Int, v: Any, dt: DataType): Unit =
    if (v == null) ps.setNull(i, sqlType(dt)) else ps.setObject(i, v)

  /** Upsert one partition's rows through `conn`. Batched statement
    * execution; on a batch-level integrity violation (possible when two
    * concurrent partitions race the same key through a non-atomic
    * dialect like Derby MERGE — Postgres ON CONFLICT can't hit this)
    * the batch is replayed row-by-row with duplicate-key violations
    * swallowed, which is exactly DO NOTHING semantics. Returns rows
    * attempted. */
  private[sources] def writeRows(conn: Connection, rows: Iterator[Row],
      schema: StructType, table: String, keys: Seq[String],
      dialect: UpsertDialect, batchSize: Int): Long = {
    val cols = schema.fieldNames.toSeq
    val (sql, bindCols) = dialect.insertIgnore(table, cols, keys)
    val bindIdx = bindCols.map(c => schema.fieldIndex(c))
    conn.setAutoCommit(false)
    val ps = conn.prepareStatement(sql)
    var n = 0L
    try {
      // Duplicate-key detection by SQLState class 23 (integrity
      // constraint violation): PostgreSQL surfaces unique violations as
      // PSQLException with SQLState 23505, NOT as the
      // SQLIntegrityConstraintViolationException subclass Derby uses.
      def isIntegrityViolation(e: SQLException): Boolean =
        e.isInstanceOf[java.sql.SQLIntegrityConstraintViolationException] ||
          Option(e.getSQLState).exists(_.startsWith("23"))
      var pending = List.empty[Row]
      def flush(): Unit = {
        // Savepoint around the batch: on PostgreSQL a failed statement
        // ABORTS the transaction (every later statement fails with
        // "current transaction is aborted"), so the replay below needs
        // a rollback target that doesn't discard previously flushed
        // batches. Derby tolerates the same protocol.
        val bsp = conn.setSavepoint()
        try { ps.executeBatch(); conn.releaseSavepoint(bsp); () }
        catch { case batchEx: SQLException =>
          ps.clearBatch()
          try {
            conn.rollback(bsp)
            // Replay one row at a time, each under its own savepoint;
            // only integrity violations are swallowed (DO NOTHING
            // semantics) — anything else rethrows the ORIGINAL error.
            pending.reverse.foreach { row =>
              bindIdx.zipWithIndex.foreach { case (ci, bi) =>
                bind(ps, bi + 1, row.get(ci), schema(ci).dataType) }
              val sp = conn.setSavepoint()
              try { ps.executeUpdate(); conn.releaseSavepoint(sp) }
              catch {
                case e: SQLException if isIntegrityViolation(e) =>
                  conn.rollback(sp)
              }
            }
          } catch { case replayEx: SQLException =>
            if (replayEx ne batchEx) batchEx.addSuppressed(replayEx)
            throw batchEx
          }
        }
        pending = Nil
      }
      rows.foreach { row =>
        bindIdx.zipWithIndex.foreach { case (ci, bi) =>
          bind(ps, bi + 1, row.get(ci), schema(ci).dataType) }
        ps.addBatch()
        pending ::= row
        n += 1
        if (n % batchSize == 0) flush()
      }
      flush()
      conn.commit()
      n
    } finally ps.close()
  }

  /** Batch upsert: executor-side connections, one per partition. */
  def upsert(df: DataFrame, url: String, table: String,
      keys: Seq[String] = Seq("link"),
      dialect: UpsertDialect = PostgresUpsertDialect,
      batchSize: Int = 500): Unit = {
    val schema = df.schema
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        def write(): Unit = {
          val conn = DriverManager.getConnection(url)
          try { writeRows(conn, rows, schema, table, keys, dialect, batchSize); () }
          finally conn.close()
        }
        if (dialect.serializeInJvm) JvmWriteGate.synchronized(write())
        else write()
      }
    }
  }

  /** The streaming side (S6): plug into
    * `writeStream.foreachBatch(JdbcUpsert.foreachBatchWriter(...))`.
    * Batch replays after a failed epoch re-run the same INSERT-ignore —
    * idempotent by the same dialect statement. */
  def foreachBatchWriter(url: String, table: String,
      keys: Seq[String] = Seq("link"),
      dialect: UpsertDialect = PostgresUpsertDialect,
      batchSize: Int = 500): (DataFrame, Long) => Unit =
    (batch: DataFrame, _: Long) => upsert(batch, url, table, keys, dialect, batchSize)
}
