"""LLM-data-pipeline query set: dedup tiers, similarity search, text
analysis, multimodal plumbing (driver north star; SURVEY §0, §7 step 7).

Populated incrementally; see operators/ for the implementations.
"""

from __future__ import annotations
