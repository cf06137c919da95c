"""Tool-parity source/sink layer: the reference's file-surface API
(csv_tool, excel_tool, data_tools) re-expressed over Spark sources
(SURVEY §2.1, §7 step 6).

Contract notes: these tools are the reference's *small-file API edge* —
row-dict envelopes, single-file CSV layout, offset/limit pagination.
Anything analytical immediately crosses into the engine (``*_sql`` →
temp views + gated Spark SQL), which is the distributed path.
"""
