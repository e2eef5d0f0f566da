#!/usr/bin/env python3
"""Dev prototype 3: recursive-CTE BPE oracle with PURE SCALAR list ops
in the recursive term (no unnest/LATERAL — those went row-by-row).
Usage: python3 tools/bpe_oracle_proto3.py <sfdir> <rounds>
"""
import sys, time
import duckdb

sf, R = sys.argv[1], int(sys.argv[2])

# per-word adjacent pairs as 'lhs rhs' strings, repeated freq times;
# histogram over the flattened corpus = freq-weighted pair counts;
# argmax via struct sort on (-cnt, 'lhs rhs') — ' ' < [a-z0-9] makes the
# combined-string tie order identical to (lhs, rhs) column order.
PAIRS = """flatten(list_transform(ws, x ->
  flatten(list_transform(range(CAST(x.freq AS INTEGER)), f ->
    list_transform(
      generate_series(1,
        len(string_split(substring(x.state, 2, length(x.state) - 2),
            '  ')) - 1),
      i -> string_split(substring(x.state, 2, length(x.state) - 2),
             '  ')[i] || ' ' ||
           string_split(substring(x.state, 2, length(x.state) - 2),
             '  ')[i + 1])))))"""

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
        state := replace(x.state,
          ' ' || split_part(top.pair, ' ', 1) || '  ' ||
                 split_part(top.pair, ' ', 2) || ' ',
          ' ' || split_part(top.pair, ' ', 1) ||
                 split_part(top.pair, ' ', 2) || ' '))),
      split_part(top.pair, ' ', 1),
      split_part(top.pair, ' ', 2),
      -top.negcnt
    FROM (
      SELECT r, ws,
        list_sort(list_transform(map_entries(list_aggregate({PAIRS},
            'histogram')),
          e -> struct_pack(negcnt := -CAST(e.value AS BIGINT),
                           pair := e.key)))[1] AS top
      FROM steps WHERE r < {R}) q
  )
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
