#!/usr/bin/env python3
"""Dev prototype: cost of the wide-vocab BPE unrolled-CTE oracle in
DuckDB at R merge rounds (t39's oracle shape). Usage:
  python3 tools/bpe_oracle_proto.py <sfdir> <rounds>
"""
import sys, time
import duckdb

sf, R = sys.argv[1], int(sys.argv[2])

W = """w AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
    SELECT substring(md5(CAST(o_orderkey AS VARCHAR)), 1,
                     CAST(3 + o_orderkey % 6 AS INTEGER)) AS word
    FROM orders WHERE o_orderkey % 10 < 4)
  GROUP BY word),
  s0 AS MATERIALIZED (
    SELECT word, freq, regexp_replace(word, '(.)', ' \\1 ', 'g') AS state
    FROM w),"""

def step(k):
    return f"""
  p{k} AS MATERIALIZED (
    SELECT lhs, rhs, sum(freq) AS cnt FROM (
      SELECT t.freq, t.syms[ix.i] AS lhs, t.syms[ix.i + 1] AS rhs
      FROM (SELECT freq,
              string_split(substring(state, 2, length(state) - 2), '  ')
                AS syms
            FROM s{k - 1}) t,
           LATERAL (SELECT unnest(generate_series(1, len(t.syms) - 1))
                    AS i) ix)
    GROUP BY lhs, rhs),
  b{k} AS MATERIALIZED (
    SELECT lhs, rhs, cnt FROM p{k} ORDER BY cnt DESC, lhs, rhs LIMIT 1),
  s{k} AS MATERIALIZED (
    SELECT s.word, s.freq,
      replace(s.state, ' ' || b.lhs || '  ' || b.rhs || ' ',
              ' ' || b.lhs || b.rhs || ' ') AS state
    FROM s{k - 1} s CROSS JOIN b{k} b)"""

union = " UNION ALL ".join(
    f"SELECT {k} AS rank, lhs, rhs, cnt FROM b{k}" for k in range(1, R + 1))
sql = ("WITH " + W + ",".join(step(k) for k in range(1, R + 1)) +
       f" SELECT rank, lhs, rhs, lhs || rhs AS merged,"
       f" CAST(cnt AS BIGINT) AS pair_count FROM ({union}) ORDER BY rank")
print(f"sql bytes: {len(sql)}")

con = duckdb.connect()
con.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
t0 = time.time()
rel = con.sql(sql)
cols = rel.columns  # forces bind/plan
t1 = time.time()
rows = rel.fetchall()
t2 = time.time()
print(f"types: {[str(t) for t in rel.types]}")
print(f"plan {t1-t0:.1f}s exec {t2-t1:.1f}s rows {len(rows)}")
print("first", rows[:3])
print("last", rows[-3:])
con2 = duckdb.connect()
con2.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
nt = con2.execute(
    "SELECT count(DISTINCT word), count(*) FROM (SELECT substring(md5(CAST("
    "o_orderkey AS VARCHAR)), 1, CAST(3 + o_orderkey % 6 AS INTEGER)) AS "
    "word FROM orders WHERE o_orderkey % 10 < 4)").fetchall()
print("types/tokens:", nt)
