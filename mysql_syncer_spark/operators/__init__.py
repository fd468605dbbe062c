"""Extended operators beyond the reference surface (SURVEY.md §7 phase E):
text analysis, deduplication, similarity search, multimodal plumbing.

The reference (iRAP-software/MySQL-Syncer) has no operators of this kind —
its row-hash model (TableConnection.php:46-51) is the seed: exact dedup is
the row-hash generalized to content identity, fuzzy dedup generalizes the
hash to locality-sensitive families, similarity search generalizes the
anti-join "is this row elsewhere?" question to nearest-neighbor.
"""
