"""Column-level helper functions (engine-internal, all JVM-side built-ins)."""
