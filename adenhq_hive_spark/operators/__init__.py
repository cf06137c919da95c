"""Custom operators the reference implies but Spark lacks natively,
plus the LLM-data-pipeline tiers (dedup, similarity, text analysis,
multimodal plumbing).

Everything here is built from DataFrame primitives (no RDDs, no
row-at-a-time Python UDFs in hot paths) so Catalyst/AQE keep optimizing
around them, and every algorithm is deterministic (fixed seeds, fixed
tie-breaks) so results are stable across runs and cluster layouts.
"""
