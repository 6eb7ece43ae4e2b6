"""Column-expression helpers (all built-in `pyspark.sql.functions`
compositions — JVM-side, codegen-friendly; no Python UDFs)."""
