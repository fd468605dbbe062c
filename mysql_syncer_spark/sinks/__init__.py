"""Sinks: JDBC-style mutation batches + the changelog/audit sink."""
