"""Column-function library (all JVM-side built-ins, no Python UDFs)."""
