"""Three-level shared state for concurrent pipeline executions.

Mirrors the reference's state hierarchy and isolation model
(core/framework/runtime/shared_state.py:49-128 resolution order,
152-182 scoped writes): state lives at GLOBAL, STREAM and EXECUTION
levels; reads resolve execution → stream → global (first hit wins);
writes target an explicit scope. Isolation levels bound visibility:

- ISOLATED:      sees/writes only execution state (scope forced down)
- SHARED:        sees all levels; writes land at the requested scope
- SYNCHRONIZED:  SHARED plus per-(scope, key) write locks, with an
  atomic ``update`` (read-modify-write under the lock)

The reference is asyncio-based; orchestration here is synchronous
driver code (Spark schedules the distributed work), so locks are
``threading.Lock``.  ``StreamMemory`` is a MutableMapping, so it can be
handed to GraphRunner directly as the run's memory: node reads resolve
through the hierarchy and node outputs land execution-local, while
explicitly shared reference values (``write(..., scope=...)``) are
visible to sibling executions on the same stream or globally.
"""

from __future__ import annotations

import threading
import time
from collections.abc import Iterator, MutableMapping
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Callable


class IsolationLevel(str, Enum):
    ISOLATED = "isolated"
    SHARED = "shared"
    SYNCHRONIZED = "synchronized"


class StateScope(str, Enum):
    EXECUTION = "execution"
    STREAM = "stream"
    GLOBAL = "global"


@dataclass
class StateChange:
    key: str
    old_value: Any
    new_value: Any
    scope: StateScope
    execution_id: str
    stream_id: str
    timestamp: float = field(default_factory=time.time)


class SharedStateManager:
    """Holds the three state levels and hands out per-execution views."""

    def __init__(self, max_history: int = 1000):
        self._global: dict[str, Any] = {}
        self._stream: dict[str, dict[str, Any]] = {}
        self._execution: dict[str, dict[str, Any]] = {}
        self._key_locks: dict[str, threading.Lock] = {}
        self._locks_guard = threading.Lock()
        self._history: list[StateChange] = []
        self._max_history = max_history

    def create_memory(
        self,
        execution_id: str,
        stream_id: str,
        isolation: IsolationLevel = IsolationLevel.SHARED,
    ) -> "StreamMemory":
        self._execution.setdefault(execution_id, {})
        self._stream.setdefault(stream_id, {})
        return StreamMemory(self, execution_id, stream_id, isolation)

    def cleanup_execution(self, execution_id: str) -> None:
        self._execution.pop(execution_id, None)

    def cleanup_stream(self, stream_id: str) -> None:
        self._stream.pop(stream_id, None)

    # -- core ops ---------------------------------------------------------

    def read(
        self, key: str, execution_id: str, stream_id: str,
        isolation: IsolationLevel,
    ) -> Any:
        """Resolution order (first hit wins): execution, then — unless
        ISOLATED — stream, then global."""
        exec_state = self._execution.get(execution_id, {})
        if key in exec_state:
            return exec_state[key]
        if isolation != IsolationLevel.ISOLATED:
            stream_state = self._stream.get(stream_id, {})
            if key in stream_state:
                return stream_state[key]
            if key in self._global:
                return self._global[key]
        return None

    def write(
        self, key: str, value: Any, execution_id: str, stream_id: str,
        isolation: IsolationLevel, scope: StateScope = StateScope.EXECUTION,
    ) -> None:
        old = self.read(key, execution_id, stream_id, isolation)
        if isolation == IsolationLevel.ISOLATED:
            scope = StateScope.EXECUTION  # may not escape the execution
        if (isolation == IsolationLevel.SYNCHRONIZED
                and scope != StateScope.EXECUTION):
            with self._lock_for(scope, key, stream_id):
                self._write_direct(key, value, execution_id, stream_id, scope)
        else:
            self._write_direct(key, value, execution_id, stream_id, scope)
        self._record(StateChange(key, old, value, scope, execution_id, stream_id))

    def update(
        self, key: str, fn: Callable[[Any], Any], execution_id: str,
        stream_id: str, isolation: IsolationLevel,
        scope: StateScope = StateScope.EXECUTION,
    ) -> Any:
        """Atomic read-modify-write. Under SYNCHRONIZED the whole cycle
        holds the (scope, key) lock, so concurrent updates never lose
        writes; under SHARED it is plain eventual consistency."""
        if isolation == IsolationLevel.ISOLATED:
            scope = StateScope.EXECUTION
        if (isolation == IsolationLevel.SYNCHRONIZED
                and scope != StateScope.EXECUTION):
            with self._lock_for(scope, key, stream_id):
                old = self.read(key, execution_id, stream_id, isolation)
                new = fn(old)
                self._write_direct(key, new, execution_id, stream_id, scope)
        else:
            old = self.read(key, execution_id, stream_id, isolation)
            new = fn(old)
            self._write_direct(key, new, execution_id, stream_id, scope)
        self._record(StateChange(key, old, new, scope, execution_id, stream_id))
        return new

    def read_all(
        self, execution_id: str, stream_id: str, isolation: IsolationLevel
    ) -> dict[str, Any]:
        """Merged view, narrower scopes overwriting wider ones."""
        out: dict[str, Any] = {}
        if isolation != IsolationLevel.ISOLATED:
            out.update(self._global)
            out.update(self._stream.get(stream_id, {}))
        out.update(self._execution.get(execution_id, {}))
        return out

    @property
    def history(self) -> list[StateChange]:
        return list(self._history)

    # -- internals --------------------------------------------------------

    def _write_direct(
        self, key: str, value: Any, execution_id: str, stream_id: str,
        scope: StateScope,
    ) -> None:
        if scope == StateScope.EXECUTION:
            self._execution.setdefault(execution_id, {})[key] = value
        elif scope == StateScope.STREAM:
            self._stream.setdefault(stream_id, {})[key] = value
        else:
            self._global[key] = value

    def _lock_for(self, scope: StateScope, key: str, stream_id: str) -> threading.Lock:
        if scope == StateScope.GLOBAL:
            lock_key = f"global:{key}"
        else:
            lock_key = f"stream:{stream_id}:{key}"
        with self._locks_guard:
            return self._key_locks.setdefault(lock_key, threading.Lock())

    def _record(self, change: StateChange) -> None:
        self._history.append(change)
        if len(self._history) > self._max_history:
            self._history = self._history[-self._max_history:]


class StreamMemory(MutableMapping):
    """Per-execution view over the manager — usable directly as
    GraphRunner memory (MutableMapping): ``m[k]`` resolves through the
    hierarchy, ``m[k] = v`` writes execution-local; ``write``/``update``
    take an explicit wider scope."""

    def __init__(
        self, manager: SharedStateManager, execution_id: str,
        stream_id: str, isolation: IsolationLevel,
    ):
        self.manager = manager
        self.execution_id = execution_id
        self.stream_id = stream_id
        self.isolation = isolation

    def read(self, key: str) -> Any:
        return self.manager.read(
            key, self.execution_id, self.stream_id, self.isolation
        )

    def write(self, key: str, value: Any,
              scope: StateScope = StateScope.EXECUTION) -> None:
        self.manager.write(
            key, value, self.execution_id, self.stream_id,
            self.isolation, scope,
        )

    def update(self, key: str, fn: Callable[[Any], Any],
               scope: StateScope = StateScope.EXECUTION) -> Any:
        return self.manager.update(
            key, fn, self.execution_id, self.stream_id, self.isolation, scope
        )

    def read_all(self) -> dict[str, Any]:
        return self.manager.read_all(
            self.execution_id, self.stream_id, self.isolation
        )

    # -- MutableMapping ---------------------------------------------------

    def __getitem__(self, key: str) -> Any:
        visible = self.read_all()
        if key not in visible:
            raise KeyError(key)
        return visible[key]

    def __setitem__(self, key: str, value: Any) -> None:
        self.write(key, value, StateScope.EXECUTION)

    def __delitem__(self, key: str) -> None:
        exec_state = self.manager._execution.get(self.execution_id, {})
        if key not in exec_state:
            raise KeyError(key)
        del exec_state[key]

    def __iter__(self) -> Iterator[str]:
        return iter(self.read_all())

    def __len__(self) -> int:
        return len(self.read_all())
