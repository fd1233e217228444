package graft.sources

import java.sql.DriverManager

/** S10: database/user bootstrap (reference:
  * create-user-database/create_user_database.py:54-178 — connect as
  * admin, create the app user if missing, grant CREATEDB, create the
  * database if missing, grant privileges).
  *
  * Provisioning is inherently a driver-side admin action against the
  * database's system catalog — one JDBC connection, a handful of DDL
  * statements — so it is deliberately NOT expressed as a Spark job.
  * The engine ships the idempotent check-then-create machinery plus
  * the reference's exact Postgres step list; JdbcRoundTripSpec
  * exercises the machinery against embedded Derby (the dialect is a
  * parameter, the logic is shared).
  */
object Bootstrap {

  /** One idempotent provisioning step: run `createSql` only when
    * `existsSql` returns no row (the reference's user_exists /
    * database_exists guards).
    */
  final case class Step(name: String, existsSql: String, createSql: Seq[String])

  /** The reference's Postgres provisioning plan, verbatim semantics
    * (create_user_database.py:68-178): app user with CREATEDB, then
    * the database owned by it. Identifier interpolation is safe only
    * for validated names — callers must not pass untrusted
    * dbname/username (same caveat as the reference's f-string DDL).
    * The password is a quoted literal and IS escaped.
    */
  def postgresSteps(dbname: String, username: String, password: String): Seq[Step] = {
    val pw = password.replace("'", "''")
    Seq(
    Step(s"user:$username",
      s"SELECT 1 FROM pg_roles WHERE rolname = '$username'",
      Seq(s"CREATE USER $username WITH PASSWORD '$pw'",
        s"ALTER USER $username CREATEDB")),
    Step(s"database:$dbname",
      s"SELECT 1 FROM pg_database WHERE datname = '$dbname'",
      Seq(s"CREATE DATABASE $dbname OWNER $username",
        s"GRANT ALL PRIVILEGES ON DATABASE $dbname TO $username")))
  }

  /** Runs the steps over one admin connection; returns the names of
    * the steps that actually created something (already-provisioned
    * steps are skipped, so reruns are no-ops — the reference logs and
    * skips the same way).
    */
  def provision(url: String, user: String, password: String,
                steps: Seq[Step]): Seq[String] = {
    val conn = DriverManager.getConnection(url, user, password)
    try {
      steps.flatMap { step =>
        val st = conn.createStatement()
        try {
          val exists = { val rs = st.executeQuery(step.existsSql)
            try rs.next() finally rs.close() }
          if (exists) None
          else { step.createSql.foreach(st.executeUpdate); Some(step.name) }
        } finally st.close()
      }
    } finally conn.close()
  }
}
