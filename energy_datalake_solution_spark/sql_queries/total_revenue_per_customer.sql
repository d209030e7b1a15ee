-- SUM GROUP BY + year filter + ORDER BY DESC LIMIT 10 — analog of the
-- reference's richest query (athena_queries/total_cost_per_customer.sql:1-12:
-- total cost per customer for YEAR(...)=2025, top 10).
SELECT c.c_custkey AS customer_id,
       c.c_name AS customer_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS total_revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY c.c_custkey, c.c_name
ORDER BY total_revenue DESC, customer_id
LIMIT 10
