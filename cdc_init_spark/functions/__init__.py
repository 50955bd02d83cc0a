"""Column-expression libraries: canonical JSON encoding, vector math,
text heuristics. All built on pyspark.sql.functions — JVM-side."""
