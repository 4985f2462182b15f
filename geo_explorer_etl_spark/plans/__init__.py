"""Query plans: the operator catalog (DuckDB-oracle checked), the
parameterized read-side views (PrimaryQuery/RelatedCharts analogs), and
the ETL pipeline builders."""
