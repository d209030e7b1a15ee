-- COUNT GROUP BY over a dim — analog of the reference's
-- top_proveedores.sql (reference: athena_queries/top_proveedores.sql:1-7:
-- suppliers per country of origin, ordered by count).
SELECT n.n_name AS nation_name,
       count(*) AS n_suppliers
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY n_suppliers DESC, nation_name
