"""Structured Streaming surface (SURVEY.md §2.7 / §7 phase E).

The reference has no streaming operators — its incrementality is
restart-based convergence (README.md:24). This package is the true
streaming extension: CDC upsert merge via foreachBatch reusing the batch
diff kernels, and watermarked windowed aggregation.
"""
