#!/usr/bin/env python3
"""Dev prototype 2: recursive-CTE BPE training oracle — the whole
word-type table rides as ONE list-valued row per round, so bind depth
is constant regardless of merge count. Usage:
  python3 tools/bpe_oracle_proto2.py <sfdir> <rounds>
"""
import sys, time
import duckdb

sf, R = sys.argv[1], int(sys.argv[2])

sql = f"""
WITH RECURSIVE
  w AS MATERIALIZED (
    SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
      SELECT substring(md5(CAST(o_orderkey AS VARCHAR)), 1,
                       CAST(3 + o_orderkey % 6 AS INTEGER)) AS word
      FROM orders WHERE o_orderkey % 10 < 4)
    GROUP BY word),
  steps AS (
    SELECT 0 AS r,
      (SELECT list(struct_pack(freq := freq,
         state := regexp_replace(word, '(.)', ' \\1 ', 'g'))
         ORDER BY word) FROM w) AS ws,
      CAST(NULL AS VARCHAR) AS lhs, CAST(NULL AS VARCHAR) AS rhs,
      CAST(NULL AS BIGINT) AS cnt
    UNION ALL
    SELECT r + 1,
      list_transform(ws, x -> struct_pack(freq := x.freq,
        state := replace(x.state, ' ' || b.lhs || '  ' || b.rhs || ' ',
                         ' ' || b.lhs || b.rhs || ' '))),
      b.lhs, b.rhs, b.cnt
    FROM steps, LATERAL (
      SELECT p.lhs, p.rhs, CAST(sum(p.freq) AS BIGINT) AS cnt FROM (
        SELECT u.x.freq AS freq, t.syms[ix.i] AS lhs,
               t.syms[ix.i + 1] AS rhs
        FROM (SELECT unnest(ws) AS x) u,
             LATERAL (SELECT string_split(substring(u.x.state, 2,
                        length(u.x.state) - 2), '  ') AS syms) t,
             LATERAL (SELECT unnest(generate_series(1, len(t.syms) - 1))
                      AS i) ix) p
      GROUP BY p.lhs, p.rhs
      ORDER BY cnt DESC, p.lhs, p.rhs LIMIT 1) b
    WHERE r < {R})
SELECT r AS rank, lhs, rhs, lhs || rhs AS merged, cnt AS pair_count
FROM steps WHERE r >= 1 ORDER BY rank
"""
print(f"sql bytes: {len(sql)}")
con = duckdb.connect()
con.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
t0 = time.time()
rel = con.sql(sql)
cols = rel.columns
t1 = time.time()
rows = rel.fetchall()
t2 = time.time()
print(f"types: {[str(t) for t in rel.types]}")
print(f"plan {t1-t0:.1f}s exec {t2-t1:.1f}s rows {len(rows)}")
print("first", rows[:3])
print("last", rows[-3:])
