"""Scalar expression layers: casts, string rule chains, security-master
rules. All pure pyspark.sql.functions built-ins (JVM-side, codegen) —
no Python UDFs anywhere in the normalize path."""
