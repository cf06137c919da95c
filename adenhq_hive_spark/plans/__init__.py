"""Dataflow plan layer: the reference's graph model (GraphSpec/NodeSpec/
EdgeSpec, core/framework/graph/edge.py:345-461) re-expressed as pipelines
of DataFrame operations (SURVEY §1.1: graph JSON ≈ unresolved logical
plan; §7 step 9)."""
