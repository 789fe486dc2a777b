package graft.queries

import org.apache.spark.sql.functions._

import graft.serve.GovernedView

/** Governed consumption queries — the reference's step-7 payoff
  * (dp_demo.sql:262-279): aggregate over the secure view under a consumer
  * account, seeing only filtered rows and masked columns.
  *
  * Oracle SQL bakes the account as a literal (the conf default
  * ACCT_NYCHA) because DuckDB has no session identity; the library API
  * takes the account as a parameter.
  */
object GovernanceQueries extends QueryPack {

  // 'NYCHA' filter = 'BUIL%', non-publisher ⇒ masked names (see
  // GovernedView.security). Mirrors dp_demo.sql:267-270:
  // `select program_name, acct, count(*) ... group by 1,2 order by 3 desc`.
  val queries: Seq[Q] = Seq(

    Q("g1_secure_view_agg",
      (s, d) => GovernedView.orders(s, d, "ACCT_NYCHA")
        .groupBy(col("segment"), col("acct"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("segment"), col("acct")),
      Some("""SELECT c_mktsegment AS segment, s.account AS acct, count(*) AS n
             FROM orders o
             JOIN customer c ON o.o_custkey = c.c_custkey
             JOIN nation nn ON c.c_nationkey = nn.n_nationkey
             JOIN (VALUES ('Publisher Account','ACCT_PUB','%'),
                          ('NYCHA','ACCT_NYCHA','BUIL%'),
                          ('JCHA','ACCT_JCHA','AUTO%')) AS s(name, account, filter)
               ON c.c_mktsegment LIKE s.filter
             WHERE s.account = 'ACCT_NYCHA'
             GROUP BY 1, 2
             ORDER BY n DESC, segment, acct""")),

    // Q4 masking: detail rows with the REDACTED(md5) mask applied
    // (dp_demo.sql:226-229) — verifies mask expression parity bit-for-bit.
    Q("g2_secure_view_masked_rows",
      (s, d) => GovernedView.orders(s, d, "ACCT_NYCHA")
        .select(col("o_orderkey"), col("customer_name"), col("segment"),
          col("nation"), col("acct"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             'REDACTED (' || md5(c_name) || ')' AS customer_name,
             c_mktsegment AS segment, nn.n_name AS nation,
             s.account AS acct
             FROM orders o
             JOIN customer c ON o.o_custkey = c.c_custkey
             JOIN nation nn ON c.c_nationkey = nn.n_nationkey
             JOIN (VALUES ('Publisher Account','ACCT_PUB','%'),
                          ('NYCHA','ACCT_NYCHA','BUIL%'),
                          ('JCHA','ACCT_JCHA','AUTO%')) AS s(name, account, filter)
               ON c.c_mktsegment LIKE s.filter
             WHERE s.account = 'ACCT_NYCHA'
             ORDER BY o_orderkey"""))
  )
}
