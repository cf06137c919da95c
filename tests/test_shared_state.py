"""Shared-state scope tests: execution→stream→global resolution,
isolation levels, synchronized read-modify-write, and GraphRunner
integration — mirrors the reference's SharedStateManager behaviors
(core/framework/runtime/shared_state.py:49-128, 152-182)."""

from __future__ import annotations

import threading

from adenhq_hive_spark.catalog import register_views
from adenhq_hive_spark.plans.graph import EdgeSpec, GraphRunner, GraphSpec, NodeSpec
from adenhq_hive_spark.plans.shared_state import (
    IsolationLevel,
    SharedStateManager,
    StateScope,
)

from .conftest import SF_SMOKE


def test_resolution_order_execution_stream_global():
    m = SharedStateManager()
    mem = m.create_memory("e1", "s1", IsolationLevel.SHARED)
    mem.write("k", "global-v", scope=StateScope.GLOBAL)
    assert mem.read("k") == "global-v"
    mem.write("k", "stream-v", scope=StateScope.STREAM)
    assert mem.read("k") == "stream-v"          # stream shadows global
    mem.write("k", "exec-v", scope=StateScope.EXECUTION)
    assert mem.read("k") == "exec-v"            # execution shadows stream
    # the wider values are still there underneath
    other = m.create_memory("e2", "s1", IsolationLevel.SHARED)
    assert other.read("k") == "stream-v"
    elsewhere = m.create_memory("e3", "s2", IsolationLevel.SHARED)
    assert elsewhere.read("k") == "global-v"


def test_isolated_sees_and_writes_only_execution_state():
    m = SharedStateManager()
    shared = m.create_memory("e1", "s1", IsolationLevel.SHARED)
    shared.write("ref", 42, scope=StateScope.STREAM)
    shared.write("g", 7, scope=StateScope.GLOBAL)
    iso = m.create_memory("e2", "s1", IsolationLevel.ISOLATED)
    assert iso.read("ref") is None
    assert iso.read("g") is None
    # an ISOLATED write cannot escape, even when it asks for a wider scope
    iso.write("leak", "x", scope=StateScope.GLOBAL)
    assert m.create_memory("e3", "s1", IsolationLevel.SHARED).read("leak") is None
    assert iso.read("leak") == "x"


def test_stream_scope_is_per_stream_global_is_everywhere():
    m = SharedStateManager()
    a = m.create_memory("e1", "webhook", IsolationLevel.SHARED)
    b = m.create_memory("e2", "webhook", IsolationLevel.SHARED)
    c = m.create_memory("e3", "timer", IsolationLevel.SHARED)
    a.write("cursor", 10, scope=StateScope.STREAM)
    a.write("model", "m1", scope=StateScope.GLOBAL)
    assert b.read("cursor") == 10
    assert c.read("cursor") is None
    assert c.read("model") == "m1"


def test_read_all_merge_order_and_mapping_protocol():
    m = SharedStateManager()
    mem = m.create_memory("e1", "s1", IsolationLevel.SHARED)
    mem.write("a", "g", scope=StateScope.GLOBAL)
    mem.write("b", "g", scope=StateScope.GLOBAL)
    mem.write("b", "s", scope=StateScope.STREAM)
    mem.write("c", "e", scope=StateScope.EXECUTION)
    assert mem.read_all() == {"a": "g", "b": "s", "c": "e"}
    # MutableMapping protocol
    assert mem["b"] == "s" and len(mem) == 3 and set(mem) == {"a", "b", "c"}
    mem["d"] = 1                      # plain setitem = execution scope
    assert m.create_memory("e9", "s1", IsolationLevel.SHARED).read("d") is None


def test_cleanup():
    m = SharedStateManager()
    mem = m.create_memory("e1", "s1", IsolationLevel.SHARED)
    mem.write("x", 1)
    mem.write("y", 2, scope=StateScope.STREAM)
    m.cleanup_execution("e1")
    assert m.create_memory("e1", "s1", IsolationLevel.SHARED).read("x") is None
    assert m.create_memory("e1", "s1", IsolationLevel.SHARED).read("y") == 2
    m.cleanup_stream("s1")
    assert m.create_memory("e1", "s1", IsolationLevel.SHARED).read("y") is None


def test_synchronized_update_has_no_lost_writes():
    m = SharedStateManager()
    mem = m.create_memory("e1", "s1", IsolationLevel.SYNCHRONIZED)
    mem.write("n", 0, scope=StateScope.STREAM)

    def bump(n_times: int, exec_id: str):
        local = m.create_memory(exec_id, "s1", IsolationLevel.SYNCHRONIZED)
        for _ in range(n_times):
            local.update("n", lambda v: (v or 0) + 1, scope=StateScope.STREAM)

    threads = [
        threading.Thread(target=bump, args=(200, f"t{i}")) for i in range(8)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert mem.read("n") == 8 * 200


def test_change_history_records_scoped_writes():
    m = SharedStateManager(max_history=3)
    mem = m.create_memory("e1", "s1", IsolationLevel.SHARED)
    for i in range(5):
        mem.write("k", i, scope=StateScope.STREAM)
    hist = m.history
    assert len(hist) == 3                       # trimmed
    assert hist[-1].new_value == 4 and hist[-1].old_value == 3
    assert hist[-1].scope == StateScope.STREAM


def test_graph_runner_over_stream_memory(spark):
    """A StreamMemory IS a graph memory: stream-scope reference data is
    visible to the run's SQL nodes, node outputs stay execution-local,
    and sibling executions on the stream see the reference but not the
    output."""
    register_views(spark, SF_SMOKE)
    m = SharedStateManager()
    seed = m.create_memory("seeder", "ingest", IsolationLevel.SHARED)
    seed.write(
        "status_dim",
        spark.createDataFrame([("O", "open"), ("F", "final")], ["code", "label"]),
        scope=StateScope.STREAM,
    )
    mem = m.create_memory("run1", "ingest", IsolationLevel.SHARED)
    g = GraphSpec(
        nodes={
            "join": NodeSpec(
                "join", "sql",
                {"query": "SELECT d.label, COUNT(*) AS n FROM orders o "
                          "JOIN status_dim d ON o.o_orderstatus = d.code "
                          "GROUP BY d.label"},
                output="by_label",
            ),
            "tally": NodeSpec("tally", "scalar", inputs=["by_label"],
                              output="n_labels"),
        },
        edges=[EdgeSpec("join", "tally")],
        entry="join",
        terminals={"tally"},
    )
    res = GraphRunner(spark).execute(g, memory=mem)
    assert res.completed
    assert res.memory["by_label"].count() == 2
    sibling = m.create_memory("run2", "ingest", IsolationLevel.SHARED)
    assert sibling.read("status_dim") is not None   # shared reference
    assert sibling.read("by_label") is None         # outputs stay local
