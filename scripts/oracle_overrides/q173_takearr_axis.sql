-- q173_takearr_axis oracle, restated for compute: the declared oracle
-- row_numbers ALL of lineitem over a 5-column total order (60 GB sort
-- spill at 100x) but consumes only rn < 6000 (i: rn < 40; the join
-- probes rn = row*100 + pos <= 59*100 + 99 = 5999).  Selecting the
-- first 6000 rows with ORDER BY ... LIMIT (DuckDB top-N: bounded heap,
-- no spill) and numbering within is bit-identical: (l_orderkey,
-- l_linenumber) is the table's primary key, so the order is total and
-- the first-6000 prefix is unique; every output value is an exact
-- BIGINT cast.
CREATE TEMP TABLE t AS
SELECT CAST(l_quantity AS BIGINT) AS q, CAST(l_partkey AS BIGINT) AS pk,
       row_number() OVER (ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice) - 1 AS rn
FROM (
  SELECT l_quantity, l_partkey, l_orderkey, l_linenumber, l_suppkey, l_extendedprice
  FROM lineitem
  ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice
  LIMIT 6000);
WITH i AS (SELECT rn AS j, pk % 100 AS pos FROM t WHERE rn < 40),
r AS (SELECT range AS row FROM range(60))
SELECT CAST(r.row * 40 + i.j AS BIGINT) AS idx, t2.q AS q
FROM r CROSS JOIN i JOIN t t2 ON t2.rn = r.row * 100 + i.pos
