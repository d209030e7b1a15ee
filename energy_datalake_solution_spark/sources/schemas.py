"""Schema contracts for the domain tables (the reference's ETL surface).

The reference expresses each table's contract as a select/cast/alias block
(reference: glue_jobs/dynamic-data-processor.py:58-63, 80-86, 110-116).
Here each contract is data: raw->canonical column maps with types, consumed
by transform.py. Audit columns are appended uniformly (reference :66-71).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class ColumnSpec:
    raw: str        # raw CSV header (Spanish, as landed)
    name: str       # canonical column name
    dtype: str      # Spark SQL type string for cast


@dataclass(frozen=True)
class TableContract:
    file_type: str                 # filename prefix before first '_'
    table_name: str                # processed/curated table name
    columns: tuple[ColumnSpec, ...]
    upsert_keys: tuple[str, ...]   # business keys for merge
    required_key: str | None = None  # null-rejection column (P2)


# dim_proveedores (reference: dynamic-data-processor.py:58-72)
PROVEEDORES = TableContract(
    file_type="proveedores",
    table_name="dim_proveedores",
    columns=(
        ColumnSpec("ID_Proveedor", "supplier_id", "string"),
        ColumnSpec("NombreProveedor", "supplier_name", "string"),
        ColumnSpec("TipoEnergia", "energy_type", "string"),
        ColumnSpec("PaisOrigen", "country_of_origin", "string"),
        ColumnSpec("FechaInicioContrato", "contract_start_date", "date"),
    ),
    upsert_keys=("supplier_id",),
    required_key="supplier_id",
)

# dim_clientes (reference: dynamic-data-processor.py:80-101)
CLIENTES = TableContract(
    file_type="clientes",
    table_name="dim_clientes",
    columns=(
        ColumnSpec("ID_Cliente", "customer_id", "string"),
        ColumnSpec("NombreCliente", "customer_name", "string"),
        ColumnSpec("TipoCliente", "customer_type_raw", "string"),
        ColumnSpec("Direccion", "address", "string"),
        ColumnSpec("Ciudad", "city", "string"),
        ColumnSpec("Pais", "country", "string"),
    ),
    upsert_keys=("customer_id",),
)

# fact_transacciones_energia (reference: dynamic-data-processor.py:110-127)
TRANSACCIONES = TableContract(
    file_type="transacciones",
    table_name="fact_transacciones_energia",
    columns=(
        ColumnSpec("ID_Transaccion", "transaction_id", "string"),
        ColumnSpec("ID_Cliente", "customer_id", "string"),
        ColumnSpec("ID_Proveedor", "supplier_id", "string"),
        ColumnSpec("FechaTransaccion", "transaction_timestamp", "timestamp"),
        ColumnSpec("CantidadEnergiaMWh", "energy_quantity_mwh", "double"),
        ColumnSpec("PrecioPorMWh", "price_per_mwh", "double"),
    ),
    upsert_keys=("transaction_id",),
)

CONTRACTS: dict[str, TableContract] = {
    c.file_type: c for c in (PROVEEDORES, CLIENTES, TRANSACCIONES)
}

# Customer-type canonicalization map (reference: dynamic-data-processor.py:88-92)
CUSTOMER_CATEGORY_MAP = {
    "Residencial": "Residential",
    "Comercial": "Commercial",
    "Industrial": "Industrial",
}

AUDIT_COLUMNS = ("load_timestamp_utc", "source_file", "load_date_partition")
PARTITION_COLUMN = "load_date_partition"
