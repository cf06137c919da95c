"""Pure-Python function layer: the safe expression language (edge
predicates) and LLM-output JSON repair — the reference's scalar compute
surface outside SQL (SURVEY §2.2, §2.10)."""
