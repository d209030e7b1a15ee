-- Ungrouped COUNT(*) — the driver-table analog of the reference's
-- count_clientes.sql (reference: athena_queries/count_clientes.sql:1).
SELECT count(*) AS n_customers
FROM customer
